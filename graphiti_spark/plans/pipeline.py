"""End-to-end KG-construction pipeline (the Spark re-expression of
Graphiti.add_episode_bulk, /root/reference/graphiti_core/graphiti.py:493-604
— see SURVEY.md §3.2):

pages -> clean+chunk -> episodes -> {mentions, triples} -> entity
resolution -> pointer resolution -> edge dedup -> temporal invalidation ->
{nodes, edges, mentions} tables.

Unlike the reference's bulk path, invalidation IS performed batch-wide
(graphiti.py:526-528 documents the reference skipping it; its unit tests
require the semantics, so we keep them).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.episodes import build_episodes
from ..operators.extract import (
    attach_labels,
    extract_all,
    extract_mentions,
    extract_triples,
    split_extracted,
)
from ..operators.materialize import (
    build_mention_edges,
    invalidate_edges,
    materialize_edges,
    resolve_edge_pointers,
)
from ..operators.resolve import resolve_entities
from ..sources.pages import build_pages


@dataclass
class GraphTables:
    pages: DataFrame
    episodes: DataFrame
    mentions_raw: DataFrame
    triples_raw: DataFrame
    nodes: DataFrame
    uuid_map: DataFrame
    edges: DataFrame
    mention_edges: DataFrame


def _materialize(df: DataFrame, root: str, name: str) -> DataFrame:
    """Stage commit: write the stage output to parquet and read it back.
    This is the single-job stand-in for the Iceberg stage tables of the
    production design (SURVEY.md §4 checkpoint/lineage): every downstream
    consumer reads the committed table instead of re-running the lineage,
    and a restarted job resumes from the last committed stage."""
    path = f"{root}/{name}"
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def build_graph(
    spark: SparkSession,
    sf_dir: str,
    use_lsh: bool = True,
    pages: DataFrame | None = None,
    replicate: int = 1,
    materialize_dir: str | None = None,
) -> GraphTables:
    pages = (
        pages
        if pages is not None
        else build_pages(
            spark, sf_dir, replicate=replicate, with_html=materialize_dir is None
        )
    )
    # Extraction runs ONCE as a combined pass (triples + mention spans in a
    # single mapInPandas — episode content crosses the Arrow boundary one
    # time). Its skinny output is the fan-out point of the whole DAG: it is
    # persisted in-memory, or committed to parquet when materialize_dir is
    # given (the Iceberg stage-table pattern of the production design —
    # SURVEY.md §4 checkpoint/lineage — which also makes the job resumable
    # from the last committed stage).
    episodes = build_episodes(pages)
    # Extraction runs ONCE (combined triples+spans pass) and its skinny
    # output is the materialized fan-out point of the DAG — committed to
    # parquet with materialize_dir (the Iceberg stage-table pattern,
    # resumable via plans/lineage.py), else persisted in-memory. Without
    # this the multi-consumer lazy DAG re-executes the Python extraction
    # ~3x (measured 33s vs 13s at 2.25M sentences on local[32]).
    extracted = extract_all(episodes)
    if materialize_dir:
        extracted = _materialize(extracted, materialize_dir, "extracted")
    else:
        # DISK_ONLY + spark.local.dir on tmpfs = a shared-memory row store
        # without the columnar-encode CPU of the default MEMORY_AND_DISK
        # cache (measured 14.5s vs 20.8s for the flagship at 2.25M
        # sentences, local[32])
        from pyspark import StorageLevel

        extracted = extracted.persist(StorageLevel.DISK_ONLY)
    triples_raw, spans = split_extracted(extracted)
    mentions_raw = attach_labels(spans, triples_raw)

    nodes, uuid_map = resolve_entities(mentions_raw, use_lsh=use_lsh)

    resolved = resolve_edge_pointers(triples_raw, uuid_map)
    edges = invalidate_edges(materialize_edges(resolved))
    mention_edges = build_mention_edges(mentions_raw, uuid_map)

    # final node table: content-derived summary (X15 — identity sentence +
    # the node's earliest facts, deterministic analogue of the <=500-word
    # LLM summary from episode context, prompts/summarize_nodes.py:48-125)
    # + derived typed attributes (X2/F14, operators/attributes.py)
    from ..operators.attributes import with_attributes
    from ..operators.summaries import with_summaries

    nodes_full = with_attributes(with_summaries(nodes, edges), edges)
    return GraphTables(
        pages=pages,
        episodes=episodes,
        mentions_raw=mentions_raw,
        triples_raw=triples_raw,
        nodes=nodes_full,
        uuid_map=uuid_map,
        edges=edges,
        mention_edges=mention_edges,
    )


def triples_view(tables: GraphTables) -> DataFrame:
    """The scored deliverable: (subj, pred, obj) with temporal validity —
    canonical display names joined back through the nodes table."""
    n = tables.nodes.select(
        F.col("uuid").alias("node_uuid"), F.col("name").alias("node_name")
    )
    e = tables.edges
    return (
        e.join(
            F.broadcast(n).withColumnRenamed("node_uuid", "source_node_uuid")
            .withColumnRenamed("node_name", "subj"),
            "source_node_uuid",
        )
        .join(
            F.broadcast(n).withColumnRenamed("node_uuid", "target_node_uuid")
            .withColumnRenamed("node_name", "obj"),
            "target_node_uuid",
        )
        .select(
            "group_id",
            "subj",
            F.col("name").alias("pred"),
            "obj",
            "fact",
            "valid_at",
            "invalid_at",
            "episodes",
        )
    )
