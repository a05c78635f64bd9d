"""AMIE-style horn-rule mining over the canonical triple graph:
confidence-scored composition rules  p1(x,y) ∧ p2(y,z) ⇒ p3(x,z).

The classic KG-completion analytics pass (Galárraga et al., AMIE, WWW'13)
run by every production KG after construction: which predicate
compositions imply a direct edge, with what support and confidence? The
reference has no batch analytics layer (its graph lives in Neo4j and is
queried per-episode, graphiti_core/graph_queries.py); at crawl scale the
rule table is computed once per build and drives both quality auditing
(low-confidence rules expose extraction noise) and candidate generation
for missing-edge prediction.

    body(p1,p2)        = # distinct (g,x,z) with a 2-hop path x-p1-y-p2-z
    support(p1,p2,p3)  = # of those pairs that ALSO have a direct p3 edge
    conf_u             = support * 1e6 div body      (integer micro-units)

Scale shape (100 TB): the path enumeration is one self-join of the
distinct edge list on the shared middle vertex (group_id, y) — the same
co-partitioned equi-join key both sides shuffle on — followed by two
skinny groupBys on predicate pairs (predicate vocabulary is tiny, so the
rule aggregation is map-side combined down to almost nothing). Hub
middles are the quadratic hazard, exactly like wedge enumeration in
`clustering_coefficients`: middles whose in·out fan-out exceeds
`max_mid_fan` are excluded from path enumeration (the standard AMIE
sampling guard, applied deterministically so the oracle can mirror it).
All arithmetic is integer `div` — bit-identical in DuckDB `//`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MAX_MID_FAN = 10_000  # exclude middles with in_deg * out_deg above this
MIN_SUPPORT = 2


def mine_rules(
    triples: DataFrame,
    min_support: int = MIN_SUPPORT,
    max_mid_fan: int = MAX_MID_FAN,
) -> DataFrame:
    """Returns (p1, p2, p3, body, support, conf_u), one row per rule with
    support >= min_support, over the distinct (group_id, subj, pred, obj)
    edges of the canonical triples."""
    e = (
        triples.select("group_id", "subj", "pred", "obj")
        .distinct()
        .localCheckpoint(eager=True)
    )
    ind = e.groupBy("group_id", F.col("obj").alias("mid")).agg(
        F.count(F.lit(1)).alias("in_d")
    )
    outd = e.groupBy("group_id", F.col("subj").alias("mid")).agg(
        F.count(F.lit(1)).alias("out_d")
    )
    ok_mid = (
        ind.join(outd, ["group_id", "mid"])
        .where(F.col("in_d") * F.col("out_d") <= max_mid_fan)
        .select("group_id", "mid")
    )
    a = e.select(
        "group_id",
        F.col("subj").alias("x"),
        F.col("pred").alias("p1"),
        F.col("obj").alias("mid"),
    )
    b = e.select(
        "group_id",
        F.col("subj").alias("mid"),
        F.col("pred").alias("p2"),
        F.col("obj").alias("z"),
    )
    paths = (
        a.join(ok_mid, ["group_id", "mid"])
        .join(b, ["group_id", "mid"])
        .where(F.col("x") != F.col("z"))
        .select("group_id", "x", "p1", "p2", "z")
        .distinct()
    )
    heads = e.select(
        "group_id",
        F.col("subj").alias("x"),
        F.col("pred").alias("p3"),
        F.col("obj").alias("z"),
    )
    support = (
        paths.join(heads, ["group_id", "x", "z"])
        .groupBy("p1", "p2", "p3")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    body = paths.groupBy("p1", "p2").agg(F.count(F.lit(1)).alias("body"))
    return (
        support.where(F.col("support") >= min_support)
        .join(body, ["p1", "p2"])
        .select(
            "p1",
            "p2",
            "p3",
            F.col("body").cast("long").alias("body"),
            F.col("support").cast("long").alias("support"),
            F.expr("support * 1000000L div body").alias("conf_u"),
        )
    )


def metapath_counts(triples: DataFrame) -> DataFrame:
    """Two-hop metapath composition statistics: for every ordered
    predicate pair (p1, p2), the EXACT number of a -p1-> b -p2-> c paths
    and of distinct middle vertices b — the schema-level composition
    profile ontology induction reads next to mine_rules' same-pair Horn
    rules (a high (WORKS_AT, BASED_IN) count is what suggests the
    LIVES_NEAR shortcut relation in HIN/metapath2vec-style modeling).

    THE SCALE TRICK: paths are never enumerated. n_paths(p1, p2) =
    sum_b indeg_p1(b) * outdeg_p2(b), so the plan is two vocab-bounded
    per-vertex degree aggregations joined on the middle vertex — the
    join fan-out per vertex is |preds_in(b)| x |preds_out(b)| (predicate
    vocab squared at worst), NOT degree squared; a hub with a million
    in/out edges contributes one multiplication per predicate pair. The
    naive edge-edge self-join that rule miners cap by fan is exact here
    at any skew."""
    e = triples.select("group_id", "subj", "pred", "obj").distinct()
    ind = e.groupBy(
        "group_id", F.col("obj").alias("mid"), F.col("pred").alias("p1")
    ).agg(F.count(F.lit(1)).alias("n_in"))
    outd = e.groupBy(
        "group_id", F.col("subj").alias("mid"), F.col("pred").alias("p2")
    ).agg(F.count(F.lit(1)).alias("n_out"))
    return (
        ind.join(outd, ["group_id", "mid"])
        .groupBy("group_id", "p1", "p2")
        .agg(
            F.sum(F.expr("n_in * n_out")).cast("long").alias("n_paths"),
            F.countDistinct("mid").cast("long").alias("n_middles"),
        )
    )
