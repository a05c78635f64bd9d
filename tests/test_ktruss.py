"""k-truss peel (centrality.ktruss): the driver gates the KG-level
result via the `kg_ktruss` oracle; these pin the peel semantics on
hand graphs — pendant removal, support counting, and the cascade
where peeling one edge lowers another's support."""

from __future__ import annotations

from graphiti_spark.operators.centrality import ktruss


def _triples(spark, pairs, group="g"):
    return spark.createDataFrame(
        [(group, a, b) for a, b in pairs],
        "group_id string, subj string, obj string",
    )


def _run(spark, pairs, k):
    out = ktruss(_triples(spark, pairs), k=k).collect()
    return {(r["src"], r["dst"]): r["support"] for r in out}


def test_two_triangles_and_pendant(spark):
    """K3 {a,b,c} + K3 {c,d,e} + pendant e-f: 3-truss keeps both
    triangles (each edge support 1), drops the pendant."""
    pairs = [("a", "b"), ("b", "c"), ("a", "c"),
             ("c", "d"), ("d", "e"), ("c", "e"), ("e", "f")]
    got = _run(spark, pairs, k=3)
    assert got == {
        ("a", "b"): 1, ("b", "c"): 1, ("a", "c"): 1,
        ("c", "d"): 1, ("d", "e"): 1, ("c", "e"): 1,
    }


def test_k4_survives_4truss_k3_dies(spark):
    """k=4 (support >= 2): K4 edges each sit in 2 triangles and
    survive; a disjoint K3 (support 1) peels entirely."""
    k4 = [("p", "q"), ("p", "r"), ("p", "s"),
          ("q", "r"), ("q", "s"), ("r", "s")]
    k3 = [("x", "y"), ("y", "z"), ("x", "z")]
    got = _run(spark, k4 + k3, k=4)
    assert set(got) == {("p", "q"), ("p", "r"), ("p", "s"),
                        ("q", "r"), ("q", "s"), ("r", "s")}
    assert all(s == 2 for s in got.values())


def test_peel_cascade(spark):
    """K4 {a,b,c,d} + triangle a-b-e: at k=4, edges ae/be (support 1)
    peel first; ab then LOSES the abe triangle but keeps support 2
    from the K4 and survives — support is measured on the final
    subgraph, not the input."""
    pairs = [("a", "b"), ("a", "c"), ("a", "d"),
             ("b", "c"), ("b", "d"), ("c", "d"),
             ("a", "e"), ("b", "e")]
    got = _run(spark, pairs, k=4)
    assert set(got) == {("a", "b"), ("a", "c"), ("a", "d"),
                        ("b", "c"), ("b", "d"), ("c", "d")}
    assert got[("a", "b")] == 2
