"""Multimodal image path (REAL PNG decode via functions/png.py) and the
Structured Streaming ingest path."""

from __future__ import annotations

import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphiti_spark.operators.multimodal import (
    decode_image_batch,
    image_features,
    resize_images,
    sample_frames,
    synth_media,
)


def test_decode_rejects_non_png():
    import pandas as pd

    with pytest.raises(ValueError):
        decode_image_batch(pd.Series([b"xx"]))


def test_decode_roundtrips_real_png():
    import pandas as pd

    from graphiti_spark.functions.png import png_encode

    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, size=(5, 7, 3)).astype(np.uint8)
    (got,) = decode_image_batch(pd.Series([png_encode(arr)]))
    assert (got == arr).all()


def test_image_features_deterministic(spark):
    media = synth_media(spark, 30)
    a = image_features(media).toPandas().sort_values("content_id")
    b = image_features(media).toPandas().sort_values("content_id")
    assert a["phash"].tolist() == b["phash"].tolist()
    assert (a["mean_r"] >= 0).all() and (a["mean_r"] <= 255).all()
    n_images = media.where("modality = 'image'").count()
    assert len(a) == n_images


def test_resize_emits_decodable_pngs(spark):
    from graphiti_spark.functions.png import png_decode

    media = synth_media(spark, 12)
    out = resize_images(media, w=4, h=3).toPandas()
    assert (out["width"] == 4).all() and (out["height"] == 3).all()
    for p in out["payload"]:
        assert png_decode(bytes(p)).shape == (3, 4, 3)


def test_frame_sampling_counts(spark):
    media = synth_media(spark, 18)
    frames = sample_frames(media, every_ms=500).toPandas()
    durs = {
        r["content_id"]: r["duration_ms"]
        for r in media.where("modality = 'video'").collect()
    }
    got = frames.groupby("content_id")["frame_idx"].count().to_dict()
    for cid, dur in durs.items():
        assert got[cid] == max(1, dur // 500)


def test_streaming_ingest_roundtrip(spark, sf_dir, tmp_path):
    """File-stream pages -> foreachBatch extraction -> staged tables ->
    compaction produces the same triples as the batch pipeline."""
    from graphiti_spark.plans.pipeline import build_graph
    from graphiti_spark.sources.pages import build_pages
    from graphiti_spark.streaming.ingest import run_ingest, staged_to_graph

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "staged")
    ckpt = str(tmp_path / "ckpt")

    pages = build_pages(spark, sf_dir).where(F.col("doc_id") < 60)
    pages.coalesce(2).write.parquet(pages_dir)

    q = run_ingest(spark, pages_dir, out_dir, ckpt, available_now=True)
    q.awaitTermination(120)

    nodes, edges, mention_edges = staged_to_graph(spark, out_dir)
    batch = build_graph(spark, sf_dir, pages=spark.read.parquet(pages_dir))
    a = edges.select("group_id", "source_node_uuid", "name", "target_node_uuid")
    b = batch.edges.select("group_id", "source_node_uuid", "name", "target_node_uuid")
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0

    # idempotent re-delivery: restart with same checkpoint adds nothing
    q2 = run_ingest(spark, pages_dir, out_dir, ckpt, available_now=True)
    q2.awaitTermination(120)
    _, edges2, _ = staged_to_graph(spark, out_dir)
    assert edges2.count() == edges.count()
