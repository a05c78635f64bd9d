"""HITS, weighted Bellman-Ford SSSP, and resource-allocation link
prediction on hand-built graphs (the oracle gate pins them corpus-wide;
this pins the exact integer semantics on crafted topologies)."""

from __future__ import annotations

import hashlib

from graphiti_spark.operators.centrality import (
    hits,
    ra_link_prediction,
    weighted_sssp,
)


def _triples(spark, rows, group="g"):
    full = [r if len(r) == 3 else (r[0], "REL", r[1]) for r in rows]
    return spark.createDataFrame(
        [(group, s, p, o) for s, p, o in full],
        "group_id string, subj string, pred string, obj string",
    )


def _w(s: str, p: str, o: str, n: int = 9) -> int:
    return int(hashlib.md5(f"{s}|{p}|{o}".encode()).hexdigest()[:8], 16) % n + 1


def test_hits_bipartite_star(spark):
    # h1,h2,h3 -> {x, y}: x/y are the pure authorities, h* the pure hubs;
    # max-normalization makes the fixpoint exactly 1e6 / 0 in two rounds
    out = hits(
        _triples(
            spark,
            [(h, t) for h in ("h1", "h2", "h3") for t in ("x", "y")],
        )
    )
    rows = {r["name"]: r.asDict() for r in out.collect()}
    assert set(rows) == {"h1", "h2", "h3", "x", "y"}
    for t in ("x", "y"):
        assert rows[t]["auth_u"] == 1_000_000 and rows[t]["hub_u"] == 0
    for h in ("h1", "h2", "h3"):
        assert rows[h]["auth_u"] == 0 and rows[h]["hub_u"] == 1_000_000


def test_hits_chain(spark):
    # a -> b -> c: b and c receive (authorities), a and b point (hubs)
    out = hits(_triples(spark, [("a", "b"), ("b", "c")]))
    rows = {r["name"]: r.asDict() for r in out.collect()}
    assert rows["a"]["auth_u"] == 0 and rows["a"]["hub_u"] == 1_000_000
    assert rows["b"]["auth_u"] == 1_000_000 and rows["b"]["hub_u"] == 1_000_000
    assert rows["c"]["auth_u"] == 1_000_000 and rows["c"]["hub_u"] == 0


def test_hits_groups_isolated(spark):
    both = _triples(spark, [("a", "b")]).unionByName(
        _triples(spark, [("a", "b"), ("c", "b")], group="g2")
    )
    rows = {
        (r["group_id"], r["name"]): r.asDict() for r in hits(both).collect()
    }
    # g's b sees one hub, g2's b sees two — normalization is per-group
    assert rows[("g", "b")]["auth_u"] == 1_000_000
    assert rows[("g2", "b")]["auth_u"] == 1_000_000
    assert rows[("g2", "a")]["hub_u"] == 1_000_000


def test_wsp_chain_accumulates_md5_weights(spark):
    # every vertex is a source (n_sources covers all); distances along the
    # chain are exact sums of the md5-derived edge weights
    t = _triples(spark, [("a", "P", "b"), ("b", "Q", "c"), ("c", "R", "d")])
    out = weighted_sssp(t, n_sources=10, rounds=4)
    d = {(r["origin"], r["name"]): r["dist_w"] for r in out.collect()}
    w1, w2, w3 = _w("a", "P", "b"), _w("b", "Q", "c"), _w("c", "R", "d")
    assert d[("a", "b")] == w1
    assert d[("a", "c")] == w1 + w2
    assert d[("a", "d")] == w1 + w2 + w3
    assert d[("b", "d")] == w2 + w3
    assert ("b", "a") not in d  # directed: no backwards distance


def test_wsp_parallel_predicates_take_min(spark):
    t = _triples(spark, [("a", "P", "b"), ("a", "Q", "b")])
    out = weighted_sssp(t, n_sources=4, rounds=1)
    d = {(r["origin"], r["name"]): r["dist_w"] for r in out.collect()}
    assert d[("a", "b")] == min(_w("a", "P", "b"), _w("a", "Q", "b"))


def test_wsp_rounds_bound_horizon(spark):
    t = _triples(spark, [("a", "P", "b"), ("b", "P", "c")])
    out = weighted_sssp(t, n_sources=4, rounds=1)
    d = {(r["origin"], r["name"]): r["dist_w"] for r in out.collect()}
    assert ("a", "b") in d and ("a", "c") not in d  # 2 hops > 1 round


def test_ra_path_and_two_witnesses(spark):
    # a-z-b: one common neighbor of degree 2 -> ra = 500000;
    # adding a-z2-b doubles the witness count -> ra = 1000000
    out = ra_link_prediction(_triples(spark, [("a", "z"), ("z", "b")]))
    rows = {(r["name_a"], r["name_b"]): r.asDict() for r in out.collect()}
    assert rows[("a", "b")]["common"] == 1
    assert rows[("a", "b")]["ra_u"] == 500_000
    out2 = ra_link_prediction(
        _triples(spark, [("a", "z"), ("z", "b"), ("a", "z2"), ("z2", "b")])
    )
    rows2 = {(r["name_a"], r["name_b"]): r.asDict() for r in out2.collect()}
    assert rows2[("a", "b")]["common"] == 2
    assert rows2[("a", "b")]["ra_u"] == 1_000_000


def test_ra_hub_penalty_and_adjacency_excluded(spark):
    # star through a degree-3 hub: each pair scores 1e6 div 3 = 333333;
    # K3 has no candidates (every pair already adjacent)
    star = ra_link_prediction(
        _triples(spark, [("z", "a"), ("z", "b"), ("z", "c")])
    )
    rows = {(r["name_a"], r["name_b"]): r["ra_u"] for r in star.collect()}
    assert rows == {("a", "b"): 333_333, ("a", "c"): 333_333, ("b", "c"): 333_333}
    k3 = ra_link_prediction(
        _triples(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    )
    assert k3.count() == 0
