"""node2vec second-order walks (centrality.node2vec_walks): the driver
gates the corpus via the `kg_node2vec` oracle; these pin the bias
semantics — weight classes, the hash roulette, and chain forcing."""

from __future__ import annotations

import hashlib

from graphiti_spark.operators.centrality import node2vec_walks

W_RET, W_ADJ, W_OUT = 25, 100, 200


def _triples(spark, pairs, group="g"):
    return spark.createDataFrame(
        [(group, a, b) for a, b in pairs],
        "group_id string, subj string, obj string",
    )


def _walks(spark, pairs, length=3):
    out = node2vec_walks(
        _triples(spark, pairs), length=length,
        w_ret=W_RET, w_adj=W_ADJ, w_out=W_OUT,
    ).collect()
    bywalk = {}
    for r in out:
        bywalk.setdefault(r["start"], {})[r["step"]] = r["node"]
    return bywalk


def _h(start, step):
    return int(hashlib.md5(f"n2v:{start}:{step}".encode()).hexdigest()[:8], 16)


def test_forced_chain(spark):
    got = _walks(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert [got["a"][s] for s in range(4)] == ["a", "b", "c", "d"]


def test_second_order_roulette(spark):
    """From prev=a at node b, neighbors sort (c, d, ret_a):
    c is adjacent to a (w=100), d is not (w=200), returning to a
    w=25. The step-2 pick must equal the Python roulette over the
    cumulative intervals in neighbor order."""
    pairs = [("a", "b"), ("b", "c"), ("b", "d"), ("b", "a"), ("a", "c")]
    got = _walks(spark, pairs, length=2)
    # walk from a: step1 from a (prev None): neighbors of a sorted =
    # [b, c], uniform weights 100 each, r = H(a,1) % 200
    r1 = _h("a", 1) % 200
    step1 = "b" if r1 < 100 else "c"
    assert got["a"][1] == step1
    if step1 == "b":
        # neighbors of b sorted: a (return, 25), c (adj to a, 100),
        # d (out, 200); cumulative [25, 125, 325]
        r2 = _h("a", 2) % 325
        want = "a" if r2 < 25 else ("c" if r2 < 125 else "d")
        assert got["a"][2] == want


def test_walk_steps_follow_edges(spark):
    pairs = [("a", "b"), ("b", "c"), ("b", "a"), ("c", "a"), ("a", "c")]
    adj = {}
    for s, d in pairs:
        adj.setdefault(s, set()).add(d)
    got = _walks(spark, pairs, length=3)
    for start, steps in got.items():
        for s in range(1, 4):
            if s in steps:
                assert steps[s] in adj[steps[s - 1]], (start, s, steps)
