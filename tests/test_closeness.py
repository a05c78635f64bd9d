"""landmark_closeness: the driver gates the full estimator via the
`kg_closeness` oracle; these pin the semantics on hand graphs — exact
values when every node is a landmark, and the unreachable-node
contract (absent, not zero)."""

from __future__ import annotations

from graphiti_spark.operators.centrality import landmark_closeness


def _edges(spark, pairs):
    return spark.createDataFrame(
        pairs, "source_node_uuid string, target_node_uuid string"
    )


def _nodes(spark, names):
    return spark.createDataFrame([(n,) for n in names], "uuid string")


def test_path_graph_exact(spark):
    """Path a-b-c-d, all nodes landmarks, depth 3 covers everything:
    closeness_q(a) = 3e6 div (1+2+3) = 500000; b = 3e6 div 4 = 750000."""
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    n = _nodes(spark, ["a", "b", "c", "d"])
    got = {
        r["node_key"]: (
            r["n_reached"], r["sum_depth"], r["closeness_q"], r["harmonic_q"]
        )
        for r in landmark_closeness(e, n, n_landmarks=4, max_depth=3).collect()
    }
    # harmonic(a) = 1e6/1 + 1e6/2 + 1e6 div 3 = 1833333
    assert got == {
        "a": (3, 6, 500000, 1833333),
        "b": (3, 4, 750000, 2500000),
        "c": (3, 4, 750000, 2500000),
        "d": (3, 6, 500000, 1833333),
    }


def test_disconnected_component_absent(spark):
    """Landmarks all land in one component (md5-min of a..c vs the
    isolated pair x-y): nodes no landmark reaches don't appear."""
    e = _edges(spark, [("a", "b"), ("b", "c"), ("x", "y")])
    n = _nodes(spark, ["a", "b", "c", "x", "y"])
    out = landmark_closeness(e, n, n_landmarks=2, max_depth=3).collect()
    keys = {r["node_key"] for r in out}
    # whichever component holds the 2 smallest-md5 landmarks, scores
    # exist only for nodes some landmark reached (depth > 0)
    assert keys
    for r in out:
        assert r["n_reached"] >= 1 and r["sum_depth"] >= r["n_reached"]
        assert r["closeness_q"] == (r["n_reached"] * 1_000_000) // r["sum_depth"]
