"""Semantics pins for the round-4 second wave: Katz centrality,
Weisfeiler-Lehman refinement, community supergraph, hyperplane-LSH
(SimHash) embedding pairs. The oracle gate pins these corpus-wide at
sf0.01; here the recurrences are verified on crafted inputs."""

from __future__ import annotations

import pyspark.sql.functions as F

from graphiti_spark.operators.ann import simhash_pairs
from graphiti_spark.operators.centrality import katz_centrality, wl_refine


def _triples(spark, rows):
    return spark.createDataFrame(
        [("g", s, p, o) for s, p, o in rows],
        "group_id string, subj string, pred string, obj string",
    )


# --- Katz ------------------------------------------------------------------


def test_katz_chain_hand_computed(spark):
    # a -> b -> c, beta = 1/8, scale 1e6, 3 iterations:
    # x1: a=1e6, b=1e6+125000, c=1e6+125000
    # x2: a=1e6, b=1e6+125000, c=1e6+(1125000//8)=1e6+140625
    # x3: same as x2 for b; c=1e6+140625 (b unchanged from x2)
    out = katz_centrality(
        _triples(spark, [("a", "R", "b"), ("b", "R", "c")])
    )
    rows = {r["name"]: r.asDict() for r in out.collect()}
    assert rows["a"]["katz_u"] == 1_000_000 and rows["a"]["in_deg"] == 0
    assert rows["b"]["katz_u"] == 1_125_000 and rows["b"]["in_deg"] == 1
    assert rows["c"]["katz_u"] == 1_140_625 and rows["c"]["in_deg"] == 1


def test_katz_hub_passes_full_weight(spark):
    # hub -> s1, hub -> s2: both spokes get the full attenuated hub
    # weight (no out-degree split — the PageRank contrast)
    out = katz_centrality(
        _triples(spark, [("hub", "R", "s1"), ("hub", "R", "s2")])
    )
    rows = {r["name"]: r.asDict() for r in out.collect()}
    assert rows["s1"]["katz_u"] == rows["s2"]["katz_u"] == 1_125_000


# --- Weisfeiler-Lehman -----------------------------------------------------


def test_wl_separates_roles_and_respects_symmetry(spark):
    # path a -> b -> c: endpoints a and c differ (arc direction is
    # tagged), the middle differs from both; a second isomorphic path
    # d -> e -> f lands in identical classes position-by-position
    out = wl_refine(
        _triples(
            spark,
            [("a", "R", "b"), ("b", "R", "c"), ("d", "R", "e"), ("e", "R", "f")],
        )
    )
    rows = {r["name"]: r.asDict() for r in out.collect()}
    assert rows["a"]["wl2"] == rows["d"]["wl2"]
    assert rows["b"]["wl2"] == rows["e"]["wl2"]
    assert rows["c"]["wl2"] == rows["f"]["wl2"]
    assert len({rows[n]["wl2"] for n in "abc"}) == 3
    assert rows["a"]["n_class"] == 2  # {a, d}


def test_wl_round1_blind_round2_sees(spark):
    # star center x(<-3 spokes) vs center y(<-2 spokes): round 1 already
    # separates the centers (different multiset sizes); spokes of both
    # stars share wl1 (one outgoing R to a constant-label nbr) but
    # round 2 separates them via their center's refined label
    out = wl_refine(
        _triples(
            spark,
            [("p1", "R", "x"), ("p2", "R", "x"), ("p3", "R", "x"),
             ("q1", "R", "y"), ("q2", "R", "y")],
        )
    )
    rows = {r["name"]: r.asDict() for r in out.collect()}
    assert rows["x"]["wl1"] != rows["y"]["wl1"]
    assert rows["p1"]["wl1"] == rows["q1"]["wl1"]
    assert rows["p1"]["wl2"] != rows["q1"]["wl2"]
    assert rows["p1"]["wl2"] == rows["p2"]["wl2"] == rows["p3"]["wl2"]


# --- community supergraph --------------------------------------------------


def test_supergraph_contracts_two_cliques_with_bridge(spark):
    from graphiti_spark.operators.communities import community_supergraph

    def uid(n):
        return f"u_{n}"

    tri1 = [("a", "b"), ("b", "c"), ("c", "a")]
    tri2 = [("x", "y"), ("y", "z"), ("z", "x")]
    bridge = [("a", "x")]
    names = sorted({n for p in tri1 + tri2 + bridge for n in p})
    nodes = spark.createDataFrame(
        [(uid(n), n, "g") for n in names], "uuid string, name string, group_id string"
    )
    edges = spark.createDataFrame(
        [
            (f"e{i}", "REL", "g", uid(s), uid(o), "f")
            for i, (s, o) in enumerate(tri1 + tri2 + bridge)
        ],
        "uuid string, name string, group_id string, source_node_uuid string,"
        " target_node_uuid string, fact string",
    )
    out = community_supergraph(nodes, edges).collect()
    comms = {r["comm_src"] for r in out} | {r["comm_dst"] for r in out}
    assert len(comms) == 2
    diag = [r for r in out if r["comm_src"] == r["comm_dst"]]
    offd = [r for r in out if r["comm_src"] != r["comm_dst"]]
    assert sorted(r["n_edges"] for r in diag) == [3, 3]
    assert len(offd) == 1 and offd[0]["n_edges"] == 1
    assert offd[0]["n_pairs"] == 1 and offd[0]["n_preds"] == 1


# --- SimHash hyperplane LSH ------------------------------------------------


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_simhash_finds_planted_near_dup_not_far_pair(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(64).astype("float32")
    base /= np.linalg.norm(base)
    near = base.copy()
    near[0] += 0.01  # tiny perturbation: cosine ~ 1
    far = rng.randn(64).astype("float32")
    far /= np.linalg.norm(far)
    out = simhash_pairs(
        _emb_df(
            spark,
            [(1, base.tolist()), (2, near.tolist()), (3, far.tolist())],
        )
    ).collect()
    pairs = {(r["id_a"], r["id_b"]): r for r in out}
    assert (1, 2) in pairs
    assert pairs[(1, 2)]["hamming"] <= 2
    assert pairs[(1, 2)]["cos2s_u"] > 990_000  # cos^2 > 0.99
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_bucket_cap_bounds_degenerate_cell(spark):
    import numpy as np

    # 30 copies of one vector: with max_bucket=10 every band bucket
    # overflows the cap, so NO pairs may survive — the quadratic guard
    v = np.ones(64, dtype="float32")
    df = _emb_df(spark, [(i, (v * (1 + i * 1e-6)).tolist()) for i in range(30)])
    out = simhash_pairs(df, max_bucket=10).collect()
    assert out == []
    # with the cap lifted the same input yields all 435 pairs
    out2 = simhash_pairs(df, max_bucket=1000).collect()
    assert len(out2) == 30 * 29 // 2
    assert all(r["cos2s_u"] == 1_000_000 for r in out2)


def test_simhash_zero_norm_vectors_never_pair(spark):
    import numpy as np

    # components < 0.01 quantize to 0 -> n2 = 0 and an all-ones
    # signature; two such vectors band-collide at hamming 0 and the
    # cosine verify would divide by zero (NULL in Spark, an error in
    # DuckDB). The guard drops them; real vectors are unaffected.
    tiny_a = (np.ones(64, dtype="float32") * 0.001).tolist()
    tiny_b = (np.ones(64, dtype="float32") * 0.002).tolist()
    real = np.random.RandomState(3).randn(64).astype("float32")
    real /= np.linalg.norm(real)
    out = simhash_pairs(
        _emb_df(spark, [(1, tiny_a), (2, tiny_b), (3, real.tolist()),
                        (4, (real * 1.001).tolist())])
    ).collect()
    ids = {(r["id_a"], r["id_b"]) for r in out}
    assert (1, 2) not in ids
    assert all(1 not in p and 2 not in p for p in ids)
    assert (3, 4) in ids
    assert all(r["cos2s_u"] is not None for r in out)
