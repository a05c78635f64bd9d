"""Entity resolution (X5/X7): alias merging via normalized-name blocking,
MinHash-LSH fuzzy blocking, and connected-components canonicalization.
Reference decision structure: graphiti_core/utils/maintenance/
node_operations.py:298-412, bulk_utils.py:243-327."""

from __future__ import annotations

import pandas as pd

from graphiti_spark.operators.resolve import (
    char_shingles,
    connected_components,
    jaccard,
    match_edges_lsh,
    minhash_signature,
    resolve_entities,
)


def test_alias_groups_merge(graph):
    """'Acme Corp' and 'Acme Corp Inc' resolve to one canonical node with
    the shortest display name."""
    nodes = graph.nodes.toPandas()
    um = graph.uuid_map.toPandas()
    merged = um[um["uuid"] != um["canon_uuid"]]
    assert len(merged) > 0, "corpus must contain alias variants"
    # canonical display name is the shortest alias
    by_canon = um.merge(
        nodes[["uuid", "name"]].rename(columns={"uuid": "canon_uuid", "name": "canon_name"}),
        on="canon_uuid",
    )
    for _, grp in by_canon.groupby("canon_uuid"):
        shortest = sorted(grp["name"], key=lambda n: (len(n), n))[0]
        assert grp["canon_name"].iloc[0] == shortest


def test_no_cross_group_merge(graph):
    """group_id is a hard partition (nodes.py:81): canonical nodes never
    span group_ids."""
    um = graph.uuid_map.toPandas()
    assert (um.groupby("canon_uuid")["group_id"].nunique() == 1).all()


def test_minhash_properties():
    a = minhash_signature("acme corp")
    b = minhash_signature("acme corp")
    assert (a == b).all(), "deterministic"
    sim = minhash_signature("acme corporation")
    frac = (a == sim).mean()
    dif = minhash_signature("zephyr logistics")
    assert frac > (a == dif).mean()


def test_jaccard_shingles():
    assert jaccard("acme corp", "acme corp") == 1.0
    assert jaccard("acme corp", "zzz") < 0.1
    assert "^ac" in char_shingles("acme")


def test_lsh_equals_exact_on_corpus(spark, graph):
    """On this corpus all true aliases share a normalized name, so the LSH
    path must produce the same canonicalization as exact blocking."""
    nodes_lsh, um_lsh = resolve_entities(graph.mentions_raw, use_lsh=True)
    um_exact = graph.uuid_map.toPandas()
    lsh = um_lsh.toPandas()
    a = um_exact.set_index("uuid")["canon_uuid"]
    b = lsh.set_index("uuid")["canon_uuid"]
    assert a.sort_index().equals(b.sort_index())


def test_connected_components_chain(spark):
    """CC must close transitive chains a-b, b-c -> one component."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], ["src", "dst"]
    )
    verts = spark.createDataFrame([(v,) for v in "abcxyz"], ["id"])
    comp = {
        r["id"]: r["component"]
        for r in connected_components(edges, verts).collect()
    }
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["x"] == comp["y"] == "x"
    assert comp["z"] == "z"


def test_lsh_finds_typo_variants(spark):
    """Fuzzy blocking catches near-identical names exact blocking misses."""
    rows = [
        ("e1", "g", "Alice Johnson", "alice johnson", "Person"),
        ("e1", "g", "Alice Johnsonn", "alice johnsonn", "Person"),
        ("e1", "g", "Bob Hartley", "bob hartley", "Person"),
    ]
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    mentions = spark.createDataFrame(
        [(a, b, c, d, e, ts) for a, b, c, d, e in rows],
        "episode_uuid string, group_id string, name string, norm_name string,"
        " label string, valid_at timestamp",
    )
    nodes, um = resolve_entities(mentions, use_lsh=True, lsh_threshold=0.7)
    m = um.toPandas().set_index("name")["canon_uuid"]
    assert m["Alice Johnson"] == m["Alice Johnsonn"]
    assert m["Bob Hartley"] != m["Alice Johnson"]
    got = nodes.toPandas()
    assert len(got) == 2
    assert "Alice Johnson" in set(got["name"])
