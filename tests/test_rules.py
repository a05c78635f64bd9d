"""Horn-rule mining semantics on hand-built graphs (the oracle gate pins
it corpus-wide; this pins support/confidence counting, the min-support
filter, and the hub-middle fan cap on crafted topologies)."""

from __future__ import annotations

from graphiti_spark.operators.rules import mine_rules


def _triples(spark, rows):
    return spark.createDataFrame(
        [("g", s, p, o) for s, p, o in rows],
        "group_id string, subj string, pred string, obj string",
    )


def test_rule_confidence_counts(spark):
    # three P-Q paths, two closed by a direct R edge -> conf 2/3
    rows = [
        ("a1", "P", "b1"), ("b1", "Q", "c1"), ("a1", "R", "c1"),
        ("a2", "P", "b2"), ("b2", "Q", "c2"), ("a2", "R", "c2"),
        ("a3", "P", "b3"), ("b3", "Q", "c3"),  # open path
    ]
    out = {
        (r["p1"], r["p2"], r["p3"]): r.asDict()
        for r in mine_rules(_triples(spark, rows), min_support=2).collect()
    }
    assert set(out) == {("P", "Q", "R")}
    r = out[("P", "Q", "R")]
    assert (r["body"], r["support"]) == (3, 2)
    assert r["conf_u"] == (2 * 1_000_000) // 3


def test_rule_min_support_filters(spark):
    rows = [("a", "P", "b"), ("b", "Q", "c"), ("a", "R", "c")]
    assert mine_rules(_triples(spark, rows), min_support=2).count() == 0
    assert mine_rules(_triples(spark, rows), min_support=1).count() == 1


def test_rule_mid_fan_cap_excludes_hubs(spark):
    # hub mid 'h': in_d=1, out_d=2 -> fan 2; chain mid 'm': fan 1.
    rows = [
        ("a", "P", "h"), ("h", "Q", "c1"), ("h", "Q", "c2"),
        ("x", "P", "m"), ("m", "Q", "y"), ("x", "R", "y"),
    ]
    t = _triples(spark, rows)
    # cap 1: only the chain through 'm' is enumerated
    out = mine_rules(t, min_support=1, max_mid_fan=1).collect()
    assert len(out) == 1 and out[0]["body"] == 1 and out[0]["p3"] == "R"
    # default cap: hub paths count into the body, diluting confidence
    out2 = {
        (r["p1"], r["p2"], r["p3"]): r.asDict()
        for r in mine_rules(t, min_support=1).collect()
    }
    assert out2[("P", "Q", "R")]["body"] == 3


def test_metapath_degree_product_identity(spark):
    from graphiti_spark.operators.rules import metapath_counts

    # b is the hub middle: 2 in-edges via P, 3 out-edges via Q
    # -> n_paths(P,Q) = 2*3 = 6 without enumerating the 6 paths
    t = spark.createDataFrame(
        [("g", s, "P", "b") for s in ("a1", "a2")]
        + [("g", "b", "Q", d) for d in ("c1", "c2", "c3")]
        + [("g", "b", "R", "c1")],
        "group_id string, subj string, pred string, obj string",
    )
    rows = {(r["p1"], r["p2"]): r.asDict() for r in metapath_counts(t).collect()}
    assert rows[("P", "Q")]["n_paths"] == 6
    assert rows[("P", "Q")]["n_middles"] == 1
    assert rows[("P", "R")]["n_paths"] == 2
    # no composition lands on a1/a2/c* as middles
    assert set(rows) == {("P", "Q"), ("P", "R")}


def test_metapath_duplicate_edges_collapse(spark):
    from graphiti_spark.operators.rules import metapath_counts

    t = spark.createDataFrame(
        [("g", "a", "P", "b"), ("g", "a", "P", "b"), ("g", "b", "Q", "c")],
        "group_id string, subj string, pred string, obj string",
    )
    rows = {(r["p1"], r["p2"]): r["n_paths"] for r in metapath_counts(t).collect()}
    assert rows == {("P", "Q"): 1}
