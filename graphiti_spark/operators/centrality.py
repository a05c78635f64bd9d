"""Graph centrality over the materialized KG: per-group degree counts and
a fixed-iteration PageRank in exact integer arithmetic.

The reference ranks retrieval candidates by graph structure (node-distance
rerank, search/search_utils.py:, mention counts); a batch centrality table
is the natural scale form of that signal — computed once per build, joined
at read time — and the classic entity-importance feature of a KG built from
web text. Fixed iteration count + integer micro-unit ranks keep the result
bit-reproducible (and DuckDB-oracle checkable): every step is `div` on
longs, no float accumulation order to drift.

Scale notes (100 TB / billions of nodes): each iteration is one join of the
rank table onto the edge list plus one groupBy — both shuffle on the SAME
key (group_id, name), so with the rank table and edge list co-partitioned
(bucketed in production) the per-iteration cost is a single co-located
shuffle of skinny (group, name, long) rows. Degree skew (hub entities)
is bounded by the same AQE skew-join handling the rest of the pipeline
uses; the iteration count is fixed (default 3), not run-to-convergence,
exactly like production feature pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DAMP_PCT = 85  # damping 0.85 in integer percent
R0_U = 1_000_000  # rank unit: micro-units summing (pre-damping) to ~1e6/group


def pagerank(
    triples: DataFrame, iters: int = 3, damp_pct: int = DAMP_PCT
) -> DataFrame:
    """Per-group integer PageRank over the distinct directed (subj, obj)
    name pairs of the canonical triples, plus in/out degree.

    rank0(v)   = 1e6 div n_g
    rank_i+1(v) = (1e6 - damp*1e4) div n_g
                  + damp * sum_{u->v} (rank_i(u) div outdeg(u)) div 100

    Dangling mass is dropped (the common non-normalized variant) — the
    recurrence stays a pure integer function of the graph, identical in
    Spark `div` and DuckDB `//`.
    """
    # the skinny edge list is read 2 + iters times (verts, degrees, every
    # iteration's contribution join): commit it once so each iteration
    # reads materialized rows instead of re-running the triple lineage —
    # the same lineage-truncation discipline as connected_components
    e = (
        triples.select(
            "group_id", F.col("subj").alias("src"), F.col("obj").alias("dst")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    verts = (
        e.select("group_id", F.col("src").alias("name"))
        .unionByName(e.select("group_id", F.col("dst").alias("name")))
        .distinct()
    )
    ng = verts.groupBy("group_id").agg(F.count(F.lit(1)).alias("n_g"))
    outdeg = e.groupBy("group_id", "src").agg(F.count(F.lit(1)).alias("outdeg"))
    indeg = e.groupBy("group_id", "dst").agg(F.count(F.lit(1)).alias("indeg"))

    base_u = (R0_U * (100 - damp_pct)) // 100  # e.g. 150000
    vn = verts.join(ng, "group_id")
    r = vn.select(
        "group_id", "name", F.expr(f"{R0_U}L div n_g").alias("rank_u")
    )
    for _ in range(iters):
        contrib = (
            e.join(outdeg, ["group_id", "src"])
            .join(
                r.select(
                    "group_id", F.col("name").alias("src"), "rank_u"
                ),
                ["group_id", "src"],
            )
            .groupBy("group_id", F.col("dst").alias("name"))
            .agg(F.sum(F.expr("rank_u div outdeg")).alias("s"))
        )
        # per-iteration checkpoint: rank_i's plan would otherwise nest
        # rank_{i-1}'s whole subtree (exponential plan growth is the
        # classic iterative-DataFrame failure mode at scale)
        r = (
            vn.join(contrib, ["group_id", "name"], "left")
            .select(
                "group_id",
                "name",
                F.expr(
                    f"({base_u}L div n_g)"
                    f" + ({damp_pct}L * coalesce(s, 0L)) div 100"
                ).alias("rank_u"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        r.join(
            outdeg.select("group_id", F.col("src").alias("name"), "outdeg"),
            ["group_id", "name"],
            "left",
        )
        .join(
            indeg.select("group_id", F.col("dst").alias("name"), "indeg"),
            ["group_id", "name"],
            "left",
        )
        .select(
            "group_id",
            "name",
            F.coalesce("outdeg", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("indeg", F.lit(0)).cast("long").alias("in_deg"),
            F.col("rank_u").cast("long").alias("rank_u"),
        )
    )
