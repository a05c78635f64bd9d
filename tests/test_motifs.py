"""Motif-pattern compiler semantics (the oracle gate pins the corpus
triangle; this pins parsing, join planning, wildcards, and the
distinct-vars rule on crafted graphs)."""

from __future__ import annotations

import pytest

from graphiti_spark.operators.motifs import match_motif, parse_motif


def _triples(spark, rows):
    return spark.createDataFrame(
        [("g", s, p, o) for s, p, o in rows],
        "group_id string, subj string, pred string, obj string",
    )


def test_motif_triangle_match_and_distinct_vars(spark):
    t = _triples(
        spark,
        [
            ("ann", "WORKS_AT", "acme"),
            ("bob", "WORKS_AT", "acme"),
            ("ann", "LIKES", "bob"),
            ("cid", "WORKS_AT", "zorg"),  # no colleague
            ("ann", "LIKES", "cid"),      # likes a non-colleague
        ],
    )
    out = match_motif(
        t, "(a)-[WORKS_AT]->(o); (b)-[WORKS_AT]->(o); (a)-[LIKES]->(b)"
    ).collect()
    assert [(r["a"], r["b"], r["o"]) for r in out] == [("ann", "bob", "acme")]


def test_motif_wildcard_predicate_binds_column(spark):
    t = _triples(spark, [("x", "LIKES", "y"), ("x", "DISLIKES", "y")])
    out = match_motif(t, "(x)-[*]->(y)").collect()
    assert sorted(r["p0"] for r in out) == ["DISLIKES", "LIKES"]


def test_motif_two_hop_chain(spark):
    t = _triples(
        spark, [("a", "KNOWS", "b"), ("b", "KNOWS", "c"), ("c", "KNOWS", "a")]
    )
    out = match_motif(t, "(x)-[KNOWS]->(y); (y)-[KNOWS]->(z)").collect()
    assert len(out) == 3  # every rotation of the 3-cycle
    assert all(r["x"] != r["z"] for r in out)


def test_motif_rejects_disconnected_and_bad_syntax(spark):
    t = _triples(spark, [("a", "R", "b")])
    with pytest.raises(ValueError, match="disconnected"):
        match_motif(t, "(a)-[R]->(b); (c)-[R]->(d)")
    with pytest.raises(ValueError, match="bad motif term"):
        parse_motif("(a)-R->(b)")


def test_motif_self_match_suppressed_unless_allowed(spark):
    t = _triples(spark, [("a", "LIKES", "b"), ("b", "LIKES", "a")])
    strict = match_motif(t, "(x)-[LIKES]->(y); (y)-[LIKES]->(x)").collect()
    assert len(strict) == 2  # (a,b) and (b,a) — distinct vars hold
    loose = match_motif(
        _triples(spark, [("a", "LIKES", "a")]),
        "(x)-[LIKES]->(y)",
        distinct_vars=False,
    ).collect()
    assert len(loose) == 1  # self-loop admitted only when asked
