"""Triadic closure (centrality.triadic_closure): the driver gates the
KG-level result via the `kg_triadic_closure` oracle; these pin the
semantics on hand graphs — closing-edge choice, first-contact pair
dating, timestamp ties, and undated-edge exclusion."""

from __future__ import annotations

from datetime import datetime

from graphiti_spark.operators.centrality import triadic_closure


def _triples(spark, rows, group="g"):
    return spark.createDataFrame(
        [(group, s, o, t) for s, o, t in rows],
        "group_id string, subj string, obj string, valid_at timestamp",
    )


def _d(day, hour=0):
    return datetime(2024, 1, day, hour)


def test_closing_edge_is_latest(spark):
    """Triangle a-b (d1), a-c (d2), b-c (d3): bc closed it on d3."""
    out = triadic_closure(
        _triples(spark, [("a", "b", _d(1)), ("a", "c", _d(2)), ("b", "c", _d(3))])
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["a"], r["b"], r["c"]) == ("a", "b", "c")
    assert (r["closed_u"], r["closed_v"]) == ("b", "c")
    assert r["closed_at"] == _d(3)


def test_pair_dating_is_first_contact(spark):
    """Two dated facts between a and b (d5 then d1, either direction):
    the pair dates to d1, so ac (d3) closes the triangle instead."""
    out = triadic_closure(
        _triples(
            spark,
            [
                ("a", "b", _d(5)),
                ("b", "a", _d(1)),
                ("a", "c", _d(3)),
                ("b", "c", _d(2)),
            ],
        )
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["closed_u"], r["closed_v"]) == ("a", "c")
    assert r["closed_at"] == _d(3)


def test_tie_breaks_lexicographically(spark):
    """All three edges share one timestamp: the lexicographically
    greatest (lo, hi) pair — bc — wins deterministically."""
    out = triadic_closure(
        _triples(spark, [("a", "b", _d(1)), ("a", "c", _d(1)), ("b", "c", _d(1))])
    ).collect()
    assert len(out) == 1
    assert (out[0]["closed_u"], out[0]["closed_v"]) == ("b", "c")


def test_undated_edge_excluded(spark):
    """A NULL-dated edge cannot form a dated triangle."""
    df = spark.createDataFrame(
        [
            ("g", "a", "b", _d(1)),
            ("g", "a", "c", _d(2)),
            ("g", "b", "c", None),
        ],
        "group_id string, subj string, obj string, valid_at timestamp",
    )
    assert triadic_closure(df).count() == 0


def test_each_triangle_once(spark):
    """K4 with distinct dates: exactly C(4,3)=4 triangles, each emitted
    once in a<b<c orientation."""
    rows = [
        ("a", "b", _d(1)), ("a", "c", _d(2)), ("a", "d", _d(3)),
        ("b", "c", _d(4)), ("b", "d", _d(5)), ("c", "d", _d(6)),
    ]
    out = triadic_closure(_triples(spark, rows)).collect()
    tris = {(r["a"], r["b"], r["c"]) for r in out}
    assert tris == {
        ("a", "b", "c"), ("a", "b", "d"), ("a", "c", "d"), ("b", "c", "d"),
    }
    assert len(out) == 4
