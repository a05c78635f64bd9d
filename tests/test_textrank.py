"""TextRank semantics on crafted documents (the oracle gate pins it
corpus-wide; this pins centrality ordering and the dangling rule)."""

from __future__ import annotations

from graphiti_spark.operators.docs import textrank_sentences


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_textrank_central_sentence_wins(spark):
    # sentence 1 shares tokens with BOTH 0 and 2; 0 and 2 share nothing
    # with each other -> 1 is the hub and must rank first
    text = "alpha beta gamma. beta gamma delta epsilon. delta epsilon zeta."
    out = textrank_sentences(_docs(spark, [(1, text)]), top_k=3).collect()
    ranks = {r["rank"]: r["sent_idx"] for r in out}
    assert ranks[1] == 1
    scores = {r["sent_idx"]: r["score_u"] for r in out}
    assert scores[1] > scores[0] and scores[1] > scores[2]


def test_textrank_isolated_sentences_keep_base_mass(spark):
    # no shared tokens anywhere: every sentence keeps exactly the base
    # (1e6*(100-85))//100 = 150000; ties break by sentence index
    out = textrank_sentences(
        _docs(spark, [(1, "aaa bbb. ccc ddd. eee fff.")]), top_k=3
    ).collect()
    assert all(r["score_u"] == 150_000 for r in out)
    assert [r["sent_idx"] for r in sorted(out, key=lambda r: r["rank"])] == [0, 1, 2]


def test_textrank_is_per_document(spark):
    # shared vocabulary across documents must NOT create cross-doc edges
    out = textrank_sentences(
        _docs(spark, [(1, "xx yy. xx zz."), (2, "xx yy. qq rr.")]), top_k=2
    ).collect()
    s1 = {r["sent_idx"]: r["score_u"] for r in out if r["doc_id"] == 1}
    s2 = {r["sent_idx"]: r["score_u"] for r in out if r["doc_id"] == 2}
    assert s1[0] > 150_000 and s1[1] > 150_000  # doc 1 sentences connect via xx
    assert s2[0] == 150_000 and s2[1] == 150_000  # doc 2's don't share tokens
