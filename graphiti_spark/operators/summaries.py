"""Content-derived node summaries (X15).

The reference builds a <=500-word entity summary from the episode
contexts the entity appears in (LLM summarize_context / pairwise
summarize_pair tree-reduction, /root/reference/graphiti_core/prompts/
summarize_nodes.py:48-125; utils/maintenance/node_operations.py:357-376;
community_operations.py:159-199).

Deterministic batch analogue: an identity sentence (canonical name +
labels) followed by the node's K earliest facts — actual sentence content
drawn from the fact edges touching the node, ordered by (valid_at, fact)
for run-independence, capped at SUMMARY_MAX_WORDS. One window over the
skinny canonical edge table; no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SUMMARY_FACTS = 3
SUMMARY_MAX_WORDS = 500


def with_summaries(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Adds a `summary` column to the canonical node table."""
    touching = edges.select(
        F.col("source_node_uuid").alias("uuid"), "fact", "valid_at"
    ).unionByName(
        edges.select(F.col("target_node_uuid").alias("uuid"), "fact", "valid_at")
    )
    w = Window.partitionBy("uuid").orderBy(F.asc("valid_at"), F.asc("fact"))
    facts = (
        touching.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= SUMMARY_FACTS)
        .groupBy("uuid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "fact"))
                    ),
                    lambda s: s["fact"],
                ),
                " ",
            ).alias("fact_summary")
        )
    )
    identity = F.concat_ws(
        " ", F.col("name"), F.lit("is a"), F.array_join("labels", "/")
    )
    full = F.concat_ws(
        ": ", identity, F.col("fact_summary")
    )
    # cap at SUMMARY_MAX_WORDS whitespace tokens (reference contract)
    capped = F.expr(
        f"array_join(slice(split(_summary_full, ' '), 1, {SUMMARY_MAX_WORDS}), ' ')"
    )
    return (
        nodes.join(facts, "uuid", "left")
        .withColumn("_summary_full", F.when(
            F.col("fact_summary").isNotNull(), full
        ).otherwise(identity))
        .withColumn("summary", capped)
        .drop("fact_summary", "_summary_full")
    )
