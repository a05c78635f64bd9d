"""GraphitiSpark facade — the reference Graphiti surface
(graphiti.py:91-787) driven end-to-end on the synthetic corpus."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from graphiti_spark.api import (
    COMBINED_HYBRID_SEARCH_RRF,
    EDGE_HYBRID_SEARCH_MMR,
    EDGE_HYBRID_SEARCH_RRF,
    NODE_HYBRID_SEARCH_EPISODE_MENTIONS,
    NODE_HYBRID_SEARCH_RRF,
    GraphitiSpark,
)


@pytest.fixture(scope="module")
def g(spark, sf_dir):
    api = GraphitiSpark(spark)
    api.build(sf_dir)
    return api


def test_triples_and_episodes(g):
    assert g.triples().count() > 0
    eps = g.retrieve_episodes(datetime.datetime(2024, 1, 2), last_n=3)
    assert eps.groupBy("group_id").count().agg(F.max("count")).collect()[0][0] <= 3


def test_edge_search_rrf(g):
    out = g.search(["alice johnson works"], EDGE_HYBRID_SEARCH_RRF).toPandas()
    assert 0 < len(out) <= EDGE_HYBRID_SEARCH_RRF.limit
    facts = g.tables.edges.where(
        F.col("uuid").isin(out["uuid"].tolist())
    ).select("fact").toPandas()["fact"]
    assert any("works" in f.lower() for f in facts)


def test_node_search_and_rerankers(g):
    rrf = g.search(["acme corp"], NODE_HYBRID_SEARCH_RRF).toPandas()
    assert len(rrf) > 0
    mm = g.search(["acme corp"], EDGE_HYBRID_SEARCH_MMR).toPandas()
    assert len(mm) > 0
    em = g.search(["acme corp"], NODE_HYBRID_SEARCH_EPISODE_MENTIONS).toPandas()
    assert "n_mentions" in em.columns


def test_combined_scope(g):
    out = g.search(["paris"], COMBINED_HYBRID_SEARCH_RRF).toPandas()
    assert len(out) > 0


def test_nodes_and_edges_by_episode(g, spark):
    ep = g.tables.mention_edges.limit(1).collect()[0]["episode_uuid"]
    nodes, edges = g.nodes_and_edges_by_episode([ep])
    assert nodes.count() > 0
    assert edges.where(F.array_contains("episodes", ep)).count() == edges.count()


def test_add_triplet_roundtrip(spark, sf_dir):
    api = GraphitiSpark(spark)
    api.build(sf_dir)
    before = api.tables.edges.count()
    api.add_triplet(
        "src0", "Zed Qux", "FOUNDED", "Nova Labs", "Zed Qux founded Nova Labs.",
        datetime.datetime(2024, 3, 1), "ep-manual",
    )
    assert api.tables.edges.count() == before + 1
    assert api.tables.nodes.where(F.col("name") == "Zed Qux").count() == 1


def test_remove_episodes(spark, sf_dir):
    api = GraphitiSpark(spark)
    api.build(sf_dir)
    ep = api.tables.mention_edges.limit(1).collect()[0]["episode_uuid"]
    edges_with_other = api.tables.edges.where(
        F.array_contains("episodes", ep) & (F.size("episodes") > 1)
    ).count()
    only_this = api.tables.edges.where(
        F.array_contains("episodes", ep) & (F.size("episodes") == 1)
    ).count()
    api.remove_episodes([ep])
    assert api.tables.episodes.where(F.col("uuid") == ep).count() == 0
    assert api.tables.mention_edges.where(F.col("episode_uuid") == ep).count() == 0
    # edges with other provenance survive; orphaned ones are gone
    assert api.tables.edges.where(F.array_contains("episodes", ep)).count() == 0
    assert (
        api.tables.edges.where(F.size("episodes") > 0).count()
        == api.tables.edges.count()
    )
