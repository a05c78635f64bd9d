"""Pseudo-relevance-feedback semantics: expansion terms recall documents
that share feedback vocabulary but none of the original query terms."""

from __future__ import annotations

from graphiti_spark.operators.search import bm25_prf_topk, bm25_topk, make_queries_df


def _corpus(spark):
    rows = [
        # feedback docs: "espresso" co-occurs with "portafilter" (twice
        # each, so feedback tf beats the singleton-idf noise terms)
        (1, "espresso machine portafilter steam portafilter"),
        (2, "espresso grind portafilter basket portafilter"),
        # target doc: portafilter only — invisible to the raw query
        (3, "cleaning a portafilter after each shot"),
        # noise
        (4, "bicycle chain lubrication guide"),
        (5, "garden soil ph testing"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prf_expansion_recalls_vocabulary_mismatch_doc(spark):
    docs = _corpus(spark)
    qs = make_queries_df(spark, ["espresso"])
    base = {r["doc_id"] for r in bm25_topk(docs, qs, "doc_id", "text", k=10).collect()}
    prf = {
        r["doc_id"]
        for r in bm25_prf_topk(
            docs, qs, "doc_id", "text", fb_k=2, n_exp=1, k=10
        ).collect()
    }
    assert 3 not in base  # raw BM25 cannot see doc 3
    assert 3 in prf  # "portafilter" expansion recalls it
    assert 4 not in prf and 5 not in prf


def test_prf_keeps_original_ranking_signal(spark):
    # original-term docs still rank above expansion-only docs (they match
    # strictly more terms of the expanded query)
    docs = _corpus(spark)
    qs = make_queries_df(spark, ["espresso"])
    out = bm25_prf_topk(docs, qs, "doc_id", "text", fb_k=2, n_exp=1, k=10).collect()
    ranks = {r["doc_id"]: r["rank"] for r in out}
    assert ranks[1] < ranks[3] and ranks[2] < ranks[3]
