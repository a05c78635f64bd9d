"""Sorted-neighborhood ER blocking (resolve.sorted_neighborhood_pairs):
the driver gates the full fixture via the `kg_sorted_neighborhood`
oracle; these pin the window semantics on hand data."""

from __future__ import annotations

from graphiti_spark.operators.resolve import sorted_neighborhood_pairs


def _nodes(spark, names, group="g"):
    return spark.createDataFrame(
        [(group, n) for n in names], "group_id string, name string"
    )


def test_truncation_twin_caught(spark):
    n = _nodes(spark, ["Alice Johnson", "Alice Johnso", "Bob", "Zed"])
    out = sorted_neighborhood_pairs(n, window=3, max_lev=2).collect()
    assert [(r["name_a"], r["name_b"], r["lev"]) for r in out] == [
        ("Alice Johnso", "Alice Johnson", 1)
    ]


def test_window_bounds_comparisons(spark):
    """window=2 compares only rank-adjacent names: sort order is
    aa ab ac ad, so (aa,ac) etc. are out of reach even at lev 1."""
    n = _nodes(spark, ["aa", "ac", "ad", "ab"])
    out = sorted_neighborhood_pairs(n, window=2, max_lev=2).collect()
    got = {(r["name_a"], r["name_b"]) for r in out}
    # window=2: only adjacent ranks compared
    assert got == {("aa", "ab"), ("ab", "ac"), ("ac", "ad")}


def test_groups_isolated(spark):
    a = _nodes(spark, ["same", "samee"], group="g1")
    b = _nodes(spark, ["same", "samee"], group="g2")
    out = sorted_neighborhood_pairs(a.unionByName(b), window=3).collect()
    assert sorted((r["group_id"], r["name_a"], r["name_b"]) for r in out) == [
        ("g1", "same", "samee"),
        ("g2", "same", "samee"),
    ]
