"""Structured Streaming ingest: the incremental counterpart of the batch
pipeline.

The reference is request-driven with a serialized per-group episode queue
(/root/reference/server/graph_service/routers/ingest.py:13-48 AsyncWorker;
mcp_server/graphiti_mcp_server.py:253-285 per-group queues) — its only
ordering guarantee is sequential processing per group_id. The streaming
equivalent: a file/table stream of pages micro-batched through
`foreachBatch`, where each micro-batch runs the same deterministic
extraction DAG and appends to the graph tables. Determinism of uuids
(md5 of natural keys) makes re-delivered pages idempotent, which is what
replaces the reference's queue serialization.

At scale this is `readStream.table('pages')` on an Iceberg source with
`Trigger.AvailableNow` for catch-up runs and watermarked `warc_ts` if
late-arriving crawl segments need bounded state; the per-batch DAG is
stateless (all cross-batch merging happens in the MERGE INTO-style append
+ downstream dedup), so no applyInPandasWithState is required for the
core pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.episodes import build_episodes
from ..operators.extract import attach_labels, extract_all, split_extracted
from ..schemas import PAGES


def stream_pages(spark: SparkSession, pages_dir: str) -> DataFrame:
    """File-source stream over a directory of pages parquet."""
    return (
        spark.readStream.schema(PAGES)
        .option("maxFilesPerTrigger", 1)
        .parquet(pages_dir)
    )


def process_batch(batch_df: DataFrame, out_dir: str) -> None:
    """One micro-batch: pages -> episodes -> combined extraction ->
    append episodes + raw triples + mentions to the staging tables.
    Entity resolution / dedup / invalidation run as the periodic batch
    compaction job over the staged tables (the lambda-style split the
    reference's bulk path also uses, graphiti.py:493-604)."""
    episodes = build_episodes(batch_df)
    extracted = extract_all(episodes)
    episodes.write.mode("append").parquet(f"{out_dir}/episodes")
    extracted.write.mode("append").parquet(f"{out_dir}/extracted")


def run_ingest(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start the ingest stream; with available_now the query drains all
    pending files and stops (the catch-up / test mode)."""
    stream = stream_pages(spark, pages_dir)
    writer = (
        stream.writeStream.foreachBatch(
            lambda df, _epoch: process_batch(df, out_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        if available_now
        else stream.writeStream.foreachBatch(
            lambda df, _epoch: process_batch(df, out_dir)
        ).option("checkpointLocation", checkpoint_dir)
    )
    return writer.start()


def staged_to_graph(spark: SparkSession, out_dir: str):
    """The compaction step: staged episodes/extraction -> resolved graph
    tables (same operators as the batch pipeline)."""
    from ..operators.materialize import (
        build_mention_edges,
        invalidate_edges,
        materialize_edges,
        resolve_edge_pointers,
    )
    from ..operators.resolve import resolve_entities

    extracted = spark.read.parquet(f"{out_dir}/extracted")
    triples_raw, spans = split_extracted(extracted)
    mentions_raw = attach_labels(spans, triples_raw)
    nodes, uuid_map = resolve_entities(mentions_raw)
    edges = invalidate_edges(
        materialize_edges(resolve_edge_pointers(triples_raw, uuid_map))
    )
    mention_edges = build_mention_edges(mentions_raw, uuid_map)
    return nodes, edges, mention_edges


class IncrementalMaintainer:
    """foreachBatch sink that folds every micro-batch of pages into a
    STANDING graph via plans/incremental.merge_batch — continuous KG
    maintenance, the streaming twin of graphiti's add_episode loop.
    Unlike process_batch + staged_to_graph (stage now, compact later),
    the maintained graph is query-ready after every trigger, and each
    trigger does only delta work: contracted-CC entity resolution over
    the batch's new names and touched-pair edge recompaction
    (plans/incremental.py). In-session the state tables are checkpointed
    DataFrames; at scale they are Iceberg tables and the fold's commits
    become MERGE INTO / overwrite-partition commits. Micro-batch ORDER
    does not matter for the final graph — every merge is a fold toward
    the same one-shot batch result (pinned by the equality tests), so
    redelivery and reordering are safe."""

    def __init__(self, lsh_threshold: float = 0.6):
        self.state = None
        self.lsh_threshold = lsh_threshold

    def __call__(self, batch_df: DataFrame, _epoch_id: int) -> None:
        from ..plans import incremental

        if batch_df.isEmpty():
            return
        if self.state is None:
            self.state = incremental.initial_state(
                batch_df, lsh_threshold=self.lsh_threshold
            )
        else:
            self.state = incremental.merge_batch(
                self.state, batch_df, lsh_threshold=self.lsh_threshold
            )


def run_incremental(
    spark: SparkSession, pages_dir: str, checkpoint_dir: str
):
    """Start the continuously-maintained-graph stream (availableNow:
    drain pending files, one merge per file, then stop). Returns
    (query, maintainer) — maintainer.state is the live graph."""
    m = IncrementalMaintainer()
    q = (
        stream_pages(spark, pages_dir)
        .writeStream.foreachBatch(m)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return q, m
