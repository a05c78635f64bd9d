"""Label-propagation communities (X16/X17) — Spark LPA must reproduce the
reference algorithm's clusters (community_operations.py:83-127: plurality
by edge count, ties to larger community, new = max(candidate, current),
sync rounds to fixpoint)."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from graphiti_spark.operators.communities import (
    build_communities,
    determine_entity_community,
    label_propagation,
    neighbor_projection,
)


def reference_lpa(projection: dict[str, list[tuple[str, int]]]) -> list[set[str]]:
    """In-process port of the reference loop semantics (same enumeration
    order as the Spark impl: sorted uuids)."""
    community_map = {u: i for i, u in enumerate(sorted(projection.keys()))}
    while True:
        no_change = True
        new_map = {}
        for uuid, neighbors in projection.items():
            curr = community_map[uuid]
            cand_w: dict[int, int] = defaultdict(int)
            for nbr, cnt in neighbors:
                cand_w[community_map[nbr]] += cnt
            lst = sorted(((c, comm) for comm, c in cand_w.items()), reverse=True)
            candidate = lst[0][1] if lst else -1
            new = max(candidate, curr)
            new_map[uuid] = new
            if new != curr:
                no_change = False
        if no_change:
            break
        community_map = new_map
    clusters = defaultdict(set)
    for u, c in community_map.items():
        clusters[c].add(u)
    return list(clusters.values())


EDGES = [
    # triangle 1
    ("a", "b"), ("b", "c"), ("c", "a"),
    # triangle 2
    ("x", "y"), ("y", "z"), ("z", "x"),
    # weak bridge
    ("c", "x"),
    # isolated pair
    ("p", "q"),
]
NODES = sorted({u for e in EDGES for u in e})


def _spark_frames(spark):
    nodes = spark.createDataFrame([("g", n) for n in NODES], ["group_id", "uuid"])
    edges = spark.createDataFrame(
        [("g", s, d) for s, d in EDGES],
        ["group_id", "source_node_uuid", "target_node_uuid"],
    )
    return nodes, edges


def _clusters_from_labels(pdf) -> set[frozenset]:
    out = defaultdict(set)
    for r in pdf.itertuples(index=False):
        out[(r.group_id, r.community)].add(r.uuid)
    return {frozenset(v) for v in out.values()}


def test_lpa_matches_reference_port(spark):
    nodes, edges = _spark_frames(spark)
    got = label_propagation(nodes, edges).toPandas()

    proj: dict[str, list[tuple[str, int]]] = {n: [] for n in NODES}
    for s, d in EDGES:
        proj[s].append((d, 1))
        proj[d].append((s, 1))
    want = {frozenset(c) for c in reference_lpa(proj)}
    assert _clusters_from_labels(got) == want


def test_lpa_deterministic(spark):
    nodes, edges = _spark_frames(spark)
    a = label_propagation(nodes, edges).toPandas().sort_values("uuid")
    b = label_propagation(nodes, edges).toPandas().sort_values("uuid")
    assert a["community"].tolist() == b["community"].tolist()


def test_lpa_no_cross_group_leak(spark):
    nodes = spark.createDataFrame(
        [("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "b")],
        ["group_id", "uuid"],
    )
    edges = spark.createDataFrame(
        [("g1", "a", "b")], ["group_id", "source_node_uuid", "target_node_uuid"]
    )
    got = label_propagation(nodes, edges).toPandas()
    g2 = got[got["group_id"] == "g2"]
    assert g2.set_index("uuid")["community"]["a"] != g2.set_index("uuid")["community"]["b"]


def test_build_communities_tables(spark):
    nodes, edges = _spark_frames(spark)
    named = nodes.withColumn("name", F.upper("uuid"))
    comms, members = build_communities(named, edges)
    c = comms.toPandas()
    m = members.toPandas()
    assert c["n_members"].sum() == len(NODES)
    assert m["entity_uuid"].nunique() == len(NODES)
    # deterministic uuids
    c2 = build_communities(named, edges)[0].toPandas()
    assert sorted(c["uuid"]) == sorted(c2["uuid"])


def test_determine_entity_community(spark):
    nodes, edges = _spark_frames(spark)
    labels = label_propagation(nodes, edges)
    got = determine_entity_community("p", labels, edges).toPandas()
    # p's only neighbor is q -> p joins q's community
    q_comm = labels.where(F.col("uuid") == "q").collect()[0]["community"]
    assert got["community"].iloc[0] == q_comm


def test_modularity_two_triangles(spark):
    """Two disjoint triangles: LPA finds the two cliques; Q = 1/2 exactly
    (per community: 4*m*e_c - d_c^2 = 4*6*3 - 36 = 36; num 72 / den 144)."""
    from graphiti_spark.operators.communities import modularity

    names = ["a1", "a2", "a3", "b1", "b2", "b3"]
    nodes = spark.createDataFrame(
        [("g", n) for n in names], ["group_id", "uuid"]
    )
    tri = [("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
           ("b1", "b2"), ("b2", "b3"), ("b3", "b1")]
    edges = spark.createDataFrame(
        [("g", s, d) for s, d in tri],
        ["group_id", "source_node_uuid", "target_node_uuid"],
    )
    (row,) = modularity(nodes, edges).collect()
    assert row["n_communities"] == 2
    assert row["m_edges"] == 6
    assert row["modularity_num"] * 2 == row["modularity_den"]  # Q = 1/2
