"""Batch search operators (SURVEY.md §2.9) — semantics pinned against
in-process numpy/pandas oracles. Reference behaviors:
search_utils.py:146-197 (fulltext), 200-274 (similarity), 277-329 (BFS),
744-755 (RRF), 758-795 (node distance), 798-822 (mentions reranker),
825-838 (MMR); search/search.py:61-358 (hybrid orchestration)."""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from graphiti_spark.functions.embed import EMBEDDING_DIM, embed_texts, with_embedding
from graphiti_spark.operators import search


# --- embedder (U1/U2) -------------------------------------------------------

def test_embedder_deterministic_and_normalized():
    a = embed_texts(["Alice Johnson", "Alice Johnson", ""])
    assert a.shape == (3, EMBEDDING_DIM)
    assert np.allclose(a[0], a[1])
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-5)


def test_embedder_similarity_ordering():
    v = embed_texts(["alice johnson", "alice johnsonn", "zephyr logistics"])
    near = float(v[0] @ v[1])
    far = float(v[0] @ v[2])
    assert near > 0.8 > far


def test_with_embedding_column(spark):
    df = spark.createDataFrame([("a", "Alice"), ("b", "Bob")], ["id", "name"])
    out = with_embedding(df, "name", "emb").toPandas()
    assert all(len(e) == EMBEDDING_DIM for e in out["emb"])
    golden = embed_texts(["Alice"])[0]
    got = np.array(out.set_index("id").loc["a", "emb"], dtype=np.float32)
    assert np.allclose(got, golden, atol=1e-6)


# --- cosine similarity search ----------------------------------------------

def _emb_frames(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    c = emb.where(F.col("vec_id") >= 4).select(
        F.col("vec_id").cast("string").alias("uuid"), F.col("embedding").alias("vec")
    )
    return q, c


def test_bm25_saturation_ordering(spark):
    """BM25's k1 tf-saturation + b length normalization is
    ORDER-CHANGING vs raw tf*idf (the scoring family Lucene applies to
    the reference's fulltext queries, search_utils.py:146-197): a short
    doc with ONE query-term occurrence outranks a long doc with THREE,
    because the long doc pays the length penalty and the repeated term
    saturates. Raw tf*idf would rank the long doc first — this pins the
    saturated form, not just 'some score'."""
    long_doc = "cat cat cat " + " ".join(f"w{i}" for i in range(50))
    corpus = spark.createDataFrame(
        [(1, long_doc), (2, "cat dog")], ["doc_id", "body"]
    )
    qs = search.make_queries_df(spark, ["cat"])
    out = search.bm25_topk(corpus, qs, "doc_id", "body", k=2).toPandas()
    ranked = out.sort_values("rank")["doc_id"].tolist()
    assert ranked == [2, 1]  # raw tf*idf would give [1, 2]
    # saturation bound: tf->inf gains approach (k1+1)/1x, so the tf=3
    # score is strictly less than 3x the tf=1 score would be at equal dl
    s = {r["doc_id"]: r["score_u"] for _, r in out.iterrows()}
    assert s[1] < 3 * s[2]


def test_cosine_topk_matches_numpy(spark, sf_dir):
    q, c = _emb_frames(spark, sf_dir)
    got = search.cosine_topk(c, q, "uuid", "vec", k=5, min_score=-1.0).toPandas()

    qp, cp = q.toPandas(), c.toPandas()
    qm = np.stack(qp["qvec"]); qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    cm = np.stack(cp["vec"]).astype(np.float64)
    cm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
    scores = cm @ qm.T
    for j, qid in enumerate(qp["query_id"]):
        order = sorted(
            range(len(cp)), key=lambda i: (-scores[i, j], cp["uuid"].iloc[i])
        )[:5]
        want = [cp["uuid"].iloc[i] for i in order]
        g = got[got["query_id"] == qid].sort_values("rank")["uuid"].tolist()
        assert g == want


def test_cosine_min_score_filter(spark, sf_dir):
    q, c = _emb_frames(spark, sf_dir)
    got = search.cosine_topk(c, q, "uuid", "vec", k=100, min_score=0.2).toPandas()
    assert (got["score"] >= 0.2).all()


# --- BFS / rerankers --------------------------------------------------------

@pytest.fixture(scope="module")
def toy_edges(spark):
    # a-b-c-d chain, e isolated-ish (e-f)
    rows = [("a", "b"), ("b", "c"), ("c", "d"), ("e", "f")]
    return spark.createDataFrame(rows, ["source_node_uuid", "target_node_uuid"])


def test_bfs_depths(spark, toy_edges):
    origins = spark.createDataFrame([("a", "a")], ["origin_uuid", "uuid"])
    out = {
        r["uuid"]: r["depth"]
        for r in search.bfs_nodes(toy_edges, origins, max_depth=3).collect()
    }
    assert out == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_bfs_min_depth_on_cycles(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["source_node_uuid", "target_node_uuid"]
    )
    origins = spark.createDataFrame([("a", "a")], ["origin_uuid", "uuid"])
    out = {
        r["uuid"]: r["depth"]
        for r in search.bfs_nodes(edges, origins, max_depth=3).collect()
    }
    assert out == {"a": 0, "b": 1, "c": 1}


def test_node_distance_rerank(spark, toy_edges):
    results = spark.createDataFrame([("d",), ("b",), ("e",)], ["uuid"])
    got = [
        r["uuid"]
        for r in search.node_distance_rerank(results, toy_edges, "a").collect()
    ]
    assert got == ["b", "d", "e"]  # depth 1, 3, unreachable


def test_episode_mentions_rerank(spark):
    mentions = spark.createDataFrame(
        [("e1", "x"), ("e2", "x"), ("e3", "y")], ["episode_uuid", "entity_uuid"]
    )
    results = spark.createDataFrame([("x",), ("y",), ("z",)], ["uuid"])
    got = search.episode_mentions_rerank(results, mentions).toPandas()
    assert got["uuid"].tolist() == ["x", "y", "z"]
    assert got["n_mentions"].tolist() == [2, 1, 0]


def test_rrf_fusion(spark):
    l1 = spark.createDataFrame(
        [(0, 1, "a"), (0, 2, "b")], ["query_id", "rank", "doc"]
    )
    l2 = spark.createDataFrame(
        [(0, 1, "b"), (0, 2, "c")], ["query_id", "rank", "doc"]
    )
    got = search.rrf([l1, l2], "doc").toPandas().sort_values("rank")
    # reference scoring 1/(k + i) with 0-based i, k=1:
    # b: 1/2 + 1/1 > a: 1/1 > c: 1/2
    assert got["doc"].tolist() == ["b", "a", "c"]
    assert got["rrf_u"].tolist() == [1500000, 1000000, 500000]


def test_mmr_prefers_diversity(spark):
    # two near-identical highly-relevant vectors + one distinct: MMR must
    # interleave the distinct one at rank 2
    import numpy as np

    qv = [1.0, 0.0, 0.0]
    rows = [
        (0, "dup1", [0.99, 0.1, 0.0], qv),
        (0, "dup2", [0.99, 0.11, 0.0], qv),
        (0, "other", [0.6, 0.0, 0.8], qv),
    ]
    cands = spark.createDataFrame(
        rows, "query_id long, uuid string, vec array<double>, qvec array<double>"
    )
    got = (
        search.mmr_rerank(cands, "uuid", "vec", "qvec", k=3)
        .toPandas()
        .sort_values("rank")["uuid"]
        .tolist()
    )
    assert got[0] == "dup1"
    assert got[1] == "other"


# --- orchestration / episodes / filters ------------------------------------

def test_hybrid_search_limit_and_union(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    qs = search.make_queries_df(spark, ["fast table scan"])
    emb = with_embedding(docs, "text", "vec")
    qv = embed_texts(["fast table scan"])
    qvec = spark.createDataFrame(
        [(0, [float(x) for x in qv[0]])], "query_id long, qvec array<float>"
    )
    got = search.hybrid_search(
        emb, qs, qvec, "doc_id", "text", "vec", limit=5
    ).toPandas()
    assert len(got) == 5
    assert got["rank"].tolist() != []


def test_make_queries_drops_overlong(spark):
    long_q = " ".join(["word"] * 40)
    out = search.make_queries_df(spark, ["ok", long_q]).toPandas()
    assert out["query"].tolist() == ["ok"]


def test_retrieve_episodes_last_n(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (f"u{i}", "g", t0 + datetime.timedelta(hours=i)) for i in range(6)
    ] + [("v0", "h", t0)]
    eps = spark.createDataFrame(rows, "uuid string, group_id string, valid_at timestamp")
    got = search.retrieve_episodes(
        eps, t0 + datetime.timedelta(hours=4), last_n=3
    ).toPandas()
    g = got[got["group_id"] == "g"]["uuid"].tolist()
    assert g == ["u2", "u3", "u4"]  # last 3 before ref, chronological
    assert got[got["group_id"] == "h"]["uuid"].tolist() == ["v0"]


def test_edge_date_filter_dnf(spark):
    t = datetime.datetime
    rows = [
        ("e1", t(2024, 1, 1), None),
        ("e2", t(2024, 2, 1), t(2024, 3, 1)),
        ("e3", t(2024, 5, 1), t(2024, 6, 1)),
    ]
    edges = spark.createDataFrame(
        rows, "uuid string, valid_at timestamp, invalid_at timestamp"
    )
    got = search.edge_date_filter(
        edges,
        [
            [("valid_at", "<", t(2024, 1, 15)), ("invalid_at", "is_null", None)],
            [("invalid_at", ">=", t(2024, 6, 1))],
        ],
    ).toPandas()
    assert sorted(got["uuid"]) == ["e1", "e3"]


def test_cross_encoder_client_surface():
    """DeterministicCrossEncoder.rank matches the reference client
    contract: [(passage, score)] sorted desc, query-relevant first."""
    from graphiti_spark.operators.cross_encoder import DeterministicCrossEncoder

    ce = DeterministicCrossEncoder()
    out = ce.rank(
        "alice works acme",
        ["alice johnson works at acme corp", "the weather in oslo", "acme corp"],
    )
    assert [p for p, _ in out][0] == "alice johnson works at acme corp"
    scores = [s for _, s in out]
    assert scores == sorted(scores, reverse=True)
    assert ce.rank("q", []) == []


def test_bfs_edges_collects_path_edges(spark):
    """bfs_edges returns exactly the edges with an endpoint within
    max_depth-1 of the origin (the reference's relationships-on-paths
    semantics)."""
    edges = spark.createDataFrame(
        [("a", "b", "R1"), ("b", "c", "R2"), ("c", "d", "R3"), ("x", "y", "R4")],
        ["source_node_uuid", "target_node_uuid", "name"],
    )
    origins = spark.createDataFrame([("a", "a")], ["origin_uuid", "uuid"])
    got = search.bfs_edges(edges, origins, max_depth=2).toPandas()
    names = set(got["name"])
    # depth 2 from a: nodes within distance 1 = {a, b}; edges touching
    # them = R1 (a-b) and R2 (b-c); R3/R4 unreachable within 2 hops
    assert names == {"R1", "R2"}
