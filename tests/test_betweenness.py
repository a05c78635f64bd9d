"""landmark_betweenness: the driver gates the estimator via the
`kg_betweenness` oracle; these pin Brandes semantics on hand graphs
where the dependency accumulation is computable by eye."""

from __future__ import annotations

import pytest

from graphiti_spark.operators.centrality import landmark_betweenness


def _g(spark, pairs, names):
    e = spark.createDataFrame(
        pairs, "source_node_uuid string, target_node_uuid string"
    )
    n = spark.createDataFrame([(x,) for x in names], "uuid string")
    return e, n


def test_path_graph(spark):
    """Path a-b-c-d, all nodes landmarks: delta(b) = 2e6 from a (covers
    c and d), 1e6 from each of c and d -> 4e6 over 3 origins; symmetric
    for c; endpoints are never interior and don't appear. 4e6 = the
    ordered-pair count 4 = 2x the unordered betweenness of 2."""
    e, n = _g(spark, [("a", "b"), ("b", "c"), ("c", "d")], "abcd")
    got = {
        r["node_key"]: (r["n_origins"], r["betweenness_q"])
        for r in landmark_betweenness(e, n, n_landmarks=4, max_depth=3).collect()
    }
    assert got == {"b": (3, 4_000_000), "c": (3, 4_000_000)}


def test_star_graph(spark):
    """Star: every leaf-origin BFS makes the hub the sole interior node
    (delta = #other leaves); the hub-origin pass contributes nothing."""
    e, n = _g(
        spark, [("hub", "l1"), ("hub", "l2"), ("hub", "l3")],
        ["hub", "l1", "l2", "l3"],
    )
    got = {
        r["node_key"]: (r["n_origins"], r["betweenness_q"])
        for r in landmark_betweenness(e, n, n_landmarks=4, max_depth=3).collect()
    }
    assert got == {"hub": (3, 6_000_000)}


def test_split_paths_quantized(spark):
    """Diamond a-(b|c)-d: two shortest a->d paths, sigma(d)=2; each of
    b, c carries half the dependency: delta = 1*(1e6+0) div 2 = 500000
    from origin a and symmetrically from d, plus 1e6 from the opposite
    mid-node's... mid-nodes are NOT on b<->c shortest paths (direct
    2-hop via a or d ties, sigma splits again) — from origin b: paths
    to c go b-a-c and b-d-c, so a and d each carry 500000."""
    e, n = _g(
        spark, [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")], "abcd"
    )
    got = {
        r["node_key"]: (r["n_origins"], r["betweenness_q"])
        for r in landmark_betweenness(e, n, n_landmarks=4, max_depth=3).collect()
    }
    # a: 500000 (from b) + 500000 (from c); symmetric everywhere
    assert got == {
        "a": (2, 1_000_000),
        "b": (2, 1_000_000),
        "c": (2, 1_000_000),
        "d": (2, 1_000_000),
    }


def test_max_depth_guard(spark):
    e, n = _g(spark, [("a", "b")], "ab")
    with pytest.raises(ValueError):
        landmark_betweenness(e, n, max_depth=1)
