"""Graph shape telemetry (centrality.graph_shape_stats): driver-gated
via `kg_graph_shape`; these pin the integer semantics by hand —
reciprocity counting, assortativity moment sums, multi-predicate arc
dedup."""

from __future__ import annotations

from graphiti_spark.operators.centrality import graph_shape_stats


def _triples(spark, pairs, group="g"):
    return spark.createDataFrame(
        [(group, a, b) for a, b in pairs],
        "group_id string, subj string, obj string",
    )


def test_reciprocity_counts_both_directions(spark):
    """a<->b plus a->c: n_arcs=3, n_mutual=2 (both arcs of the pair)."""
    r = graph_shape_stats(
        _triples(spark, [("a", "b"), ("b", "a"), ("a", "c")])
    ).collect()[0]
    assert (r["n_nodes"], r["n_arcs"], r["n_mutual"]) == (3, 3, 2)
    assert r["n_edges"] == 2  # undirected: {a,b}, {a,c}


def test_no_mutual_is_zero(spark):
    r = graph_shape_stats(_triples(spark, [("a", "b"), ("b", "c")])).collect()[0]
    assert r["n_mutual"] == 0


def test_moment_sums_by_hand(spark):
    """Path a-b-c (degrees a=1, b=2, c=1); edges (a,b): x=1,y=2 and
    (b,c): x=2,y=1 -> sums: x=3, y=3, xy=4, x2=5, y2=5."""
    r = graph_shape_stats(_triples(spark, [("a", "b"), ("b", "c")])).collect()[0]
    assert (r["sum_x"], r["sum_y"], r["sum_xy"]) == (3, 3, 4)
    assert (r["sum_x2"], r["sum_y2"]) == (5, 5)


def test_parallel_predicates_dedup(spark):
    """Two facts a->b (different predicates upstream) are ONE arc."""
    r = graph_shape_stats(_triples(spark, [("a", "b"), ("a", "b")])).collect()[0]
    assert (r["n_arcs"], r["n_edges"]) == (1, 1)
