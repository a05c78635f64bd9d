"""Continuously-maintained graph (streaming/ingest.IncrementalMaintainer):
micro-batched pages folded through plans/incremental.merge_batch must end
at exactly the one-shot batch graph, regardless of how the stream chops
the input into triggers."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphiti_spark.plans import incremental
from graphiti_spark.sources.pages import build_pages
from graphiti_spark.streaming.ingest import run_incremental


def test_streamed_merges_equal_batch(spark, sf_dir, tmp_path):
    pages = build_pages(spark, sf_dir).where(F.col("doc_id") < 90).cache()

    # three parquet files -> three micro-batches (maxFilesPerTrigger=1)
    src = tmp_path / "pages_stream"
    for lo, hi in [(0, 30), (30, 60), (60, 90)]:
        (
            pages.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .coalesce(1)
            .write.mode("append")
            .parquet(str(src))
        )

    q, m = run_incremental(spark, str(src), str(tmp_path / "ckpt"))
    q.awaitTermination(600)
    assert m.state is not None

    cols = ["group_id", "subj", "pred", "obj", "fact", "valid_at",
            "invalid_at", "n_episodes"]
    streamed = (
        incremental.incremental_triples(m.state)
        .toPandas()[cols].sort_values(cols[:6]).reset_index(drop=True)
    )
    batch = (
        incremental.incremental_triples(incremental.initial_state(pages))
        .toPandas()[cols].sort_values(cols[:6]).reset_index(drop=True)
    )
    pages.unpersist()
    assert len(streamed) > 0
    assert streamed.equals(batch)
