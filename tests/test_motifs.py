"""Motif-pattern compiler semantics (the oracle gate pins the corpus
triangle; this pins parsing, join planning, wildcards, and the
distinct-vars rule on crafted graphs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


def test_motif_rejects_self_referential_term_and_reserved_vars(spark):
    # (a)-[R]->(a) would alias subj and obj to the same column name —
    # duplicate columns, ambiguous joins downstream — so it is rejected
    with pytest.raises(ValueError, match="self-referential"):
        parse_motif("(a)-[R]->(a)")
    # node vars colliding with generated p<i>/t<i> output columns
    with pytest.raises(ValueError, match="collides"):
        parse_motif("(p0)-[R]->(b)")
    with pytest.raises(ValueError, match="collides"):
        parse_motif("(a)-[*]->(t1)")
    # non-reserved lookalikes still fine: p, t, p_0, px1
    assert parse_motif("(p)-[R]->(t); (t)-[R]->(px1)")


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


def test_motif_negation_absence_of_edge(spark):
    # colleagues (shared employer) who do NOT like each other
    t = _triples(
        spark,
        [
            ("ann", "WORKS_AT", "acme"),
            ("bob", "WORKS_AT", "acme"),
            ("eve", "WORKS_AT", "acme"),
            ("ann", "LIKES", "bob"),
        ],
    )
    out = match_motif(
        t, "(a)-[WORKS_AT]->(o); (b)-[WORKS_AT]->(o); !(a)-[LIKES]->(b)"
    ).collect()
    pairs = {(r["a"], r["b"]) for r in out}
    assert ("ann", "bob") not in pairs  # the liking pair is excluded
    assert ("bob", "ann") in pairs  # likes is directed; reverse absent
    assert ("ann", "eve") in pairs and ("eve", "ann") in pairs


def test_motif_negation_wildcard_means_no_arc_at_all(spark):
    t = _triples(
        spark,
        [("a", "KNOWS", "b"), ("b", "KNOWS", "c"), ("a", "DISLIKES", "c"),
         ("x", "KNOWS", "y"), ("y", "KNOWS", "z")],
    )
    out = match_motif(
        t, "(p)-[KNOWS]->(q); (q)-[KNOWS]->(r); !(p)-[*]->(r)"
    ).collect()
    assert [(r["p"], r["r"]) for r in out] == [("x", "z")]


def test_motif_negation_requires_bound_vars_and_a_positive_term(spark):
    t = _triples(spark, [("a", "R", "b")])
    with pytest.raises(ValueError, match="unbound"):
        match_motif(t, "(a)-[R]->(b); !(a)-[R]->(zzz)")
    with pytest.raises(ValueError, match="positive"):
        match_motif(t, "!(a)-[R]->(b)")


def test_stationary_absorbing_chain(spark):
    from graphiti_spark.operators.events import stationary_distribution

    # a -> b -> b ... : b absorbs all mass; integer recurrence keeps b
    # at ~1e6 and a at 0 after round 1 (a has no incoming steps)
    rows = [
        (1, "2024-01-01 00:00:00", 1, "a"),
        (2, "2024-01-01 00:01:00", 1, "b"),
        (3, "2024-01-01 00:02:00", 1, "b"),
        (4, "2024-01-01 00:03:00", 1, "b"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["state"]: r["pi_u"] for r in stationary_distribution(ev).collect()}
    assert out["a"] == 0
    assert out["b"] == 1_000_000  # 500000 (from a) + 500000 (self-loop)


def test_stationary_two_state_flip_flop(spark):
    from graphiti_spark.operators.events import stationary_distribution

    # a <-> b alternating: uniform is the exact fixpoint
    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", 1, "ab"[i % 2]) for i in range(6)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["state"]: r["pi_u"] for r in stationary_distribution(ev).collect()}
    assert out["a"] == out["b"] == 500_000


def test_motif_time_ordered_respects_validity_order(spark):
    rows = [
        ("g", "a", "LIKES", "b", "2024-01-05 00:00:00"),
        ("g", "b", "LIKES", "c", "2024-01-06 00:00:00"),  # after a->b: admissible
        ("g", "b", "LIKES", "d", "2024-01-01 00:00:00"),  # before a->b: excluded
        ("g", "b", "LIKES", "e", None),  # null validity: cannot witness
    ]
    t = spark.createDataFrame(
        rows, "group_id string, subj string, pred string, obj string, valid_at string"
    ).withColumn("valid_at", F.to_timestamp("valid_at"))
    out = match_motif(
        t, "(x)-[LIKES]->(y); (y)-[LIKES]->(z)", time_ordered=True
    ).collect()
    assert [(r["x"], r["y"], r["z"]) for r in out] == [("a", "b", "c")]
    assert out[0]["t0"] < out[0]["t1"]
    # without time ordering the reversed chain matches too (nulls allowed)
    loose = match_motif(t, "(x)-[LIKES]->(y); (y)-[LIKES]->(z)").collect()
    assert len(loose) == 3
