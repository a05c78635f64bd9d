"""Open-schema entity attributes (X2 typed attributes + F14 merge).

The reference lets users supply `entity_types: dict[str, BaseModel]` and
has the LLM fill typed attributes per node
(/root/reference/graphiti_core/graphiti.py:264,
utils/maintenance/node_operations.py:339-355 builds an ad-hoc pydantic
model; :398-403 merges — existing values fill the new node's nulls).

Batch re-design: attributes are DERIVED deterministically from the
canonical fact edges (the engine's "typed extraction"), carried as
`MAP<STRING,STRING>` per SURVEY §1.3:

  - Person.lead_since    = min year over outgoing LEADS facts
  - Person.last_visited  = max date over outgoing VISITED facts
  - Organization.hq      = lexicographically-min place over BASED_IN facts

The merge helper reproduces node_operations.py:398-403 exactly: the new
map wins per key when non-null, the existing value fills otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def node_attributes(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """(uuid, attributes MAP<STRING,STRING>) for nodes with at least one
    derivable attribute; one groupBy over the skinny canonical edge table
    per attribute family, unioned by key — map-side combine keeps the
    shuffle at O(nodes)."""
    lead = (
        edges.where(F.col("name") == "LEADS")
        .groupBy(F.col("source_node_uuid").alias("uuid"))
        .agg(F.min(F.year("valid_at")).cast("string").alias("v"))
        .withColumn("k", F.lit("lead_since"))
    )
    visited = (
        edges.where(F.col("name") == "VISITED")
        .groupBy(F.col("source_node_uuid").alias("uuid"))
        .agg(F.max(F.date_format("valid_at", "yyyy-MM-dd")).alias("v"))
        .withColumn("k", F.lit("last_visited"))
    )
    place_names = nodes.select(
        F.col("uuid").alias("target_node_uuid"), F.col("name").alias("place")
    )
    hq = (
        edges.where(F.col("name") == "BASED_IN")
        .join(place_names, "target_node_uuid")  # entity-scaled: AQE decides
        .groupBy(F.col("source_node_uuid").alias("uuid"))
        .agg(F.min("place").alias("v"))
        .withColumn("k", F.lit("hq"))
    )
    kv = lead.unionByName(visited).unionByName(hq)
    return kv.groupBy("uuid").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("k", "v")))
        ).alias("attributes")
    )


def with_attributes(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """nodes + attributes column (empty map when none derivable)."""
    attrs = node_attributes(edges, nodes)
    return nodes.join(attrs, "uuid", "left").withColumn(
        "attributes",
        F.coalesce("attributes", F.expr("map()")),
    )


def merge_attributes(new_col: str, existing_col: str) -> F.Column:
    """F14: per-key merge where the new value wins when non-null and the
    existing value fills nulls/missing keys (node_operations.py:398-403).
    Both columns are MAP<STRING,STRING>."""
    return F.expr(
        f"map_filter(map_zip_with({new_col}, {existing_col},"
        " (k, vn, ve) -> coalesce(vn, ve)), (k, v) -> v IS NOT NULL)"
    )
