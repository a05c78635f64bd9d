"""Integer PageRank semantics on hand-built graphs (the oracle gate pins
it corpus-wide; this pins the recurrence on crafted topologies)."""

from __future__ import annotations

from graphiti_spark.operators.centrality import pagerank


def _triples(spark, rows):
    return spark.createDataFrame(
        [("g", s, "REL", o) for s, o in rows],
        "group_id string, subj string, pred string, obj string",
    )


def test_pagerank_cycle_is_fixpoint(spark):
    # 3-cycle: uniform rank is the exact fixpoint of the integer recurrence
    # r = 150000/3 + 85*(1000000/3 div 1) div 100 = 50000 + 283333 = 333333
    out = pagerank(_triples(spark, [("a", "b"), ("b", "c"), ("c", "a")]))
    rows = {r["name"]: r.asDict() for r in out.collect()}
    assert set(rows) == {"a", "b", "c"}
    for r in rows.values():
        assert r["rank_u"] == 333333
        assert r["out_deg"] == 1 and r["in_deg"] == 1


def test_pagerank_star_ranks_hub_highest(spark):
    # spokes -> hub: the hub accumulates all contributions, spokes only
    # the base mass; degrees are exact
    out = pagerank(
        _triples(spark, [("s1", "hub"), ("s2", "hub"), ("s3", "hub")])
    )
    rows = {r["name"]: r.asDict() for r in out.collect()}
    hub, spoke = rows["hub"], rows["s1"]
    assert hub["rank_u"] > spoke["rank_u"]
    assert hub["in_deg"] == 3 and hub["out_deg"] == 0
    assert spoke["out_deg"] == 1 and spoke["in_deg"] == 0
    # dangling hub contributes nothing back: spokes hold exactly the base
    assert spoke["rank_u"] == 150000 // 4


def test_pagerank_groups_are_independent(spark):
    df = spark.createDataFrame(
        [("g1", "a", "REL", "b"), ("g2", "a", "REL", "b"),
         ("g2", "b", "REL", "a")],
        "group_id string, subj string, pred string, obj string",
    )
    rows = {(r["group_id"], r["name"]): r["rank_u"]
            for r in pagerank(df).collect()}
    # same node names, different topology per group -> different ranks
    assert rows[("g1", "a")] != rows[("g2", "a")]
    assert rows[("g2", "a")] == rows[("g2", "b")]  # symmetric 2-cycle
