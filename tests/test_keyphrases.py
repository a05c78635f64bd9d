"""RAKE keyphrase semantics on crafted text (the oracle gate pins it
corpus-wide; this pins phrase segmentation and the degree/frequency
scoring on known inputs)."""

from __future__ import annotations

from graphiti_spark.operators.docs import rake_keyphrases


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_rake_multiword_phrase_outscores_singletons(spark):
    # candidate runs: "deep learning beats" / "deep learning wins" (the
    # stopword "the" and the sentence punctuation bound the others).
    # deg(deep) = deg(learning) = 6 over freq 2 -> 3e6 each;
    # deg(beats) = 3 over freq 1 -> 3e6; phrase score = 9e6.
    # Singletons "optimizer"/"again" score deg/freq = 1 -> 1e6.
    out = rake_keyphrases(
        _docs(
            spark,
            [(1, "Deep learning beats the optimizer. Deep learning wins, again.")],
        ),
        top_k=10,
    ).collect()
    by_phrase = {r["phrase"]: r for r in out}
    assert by_phrase["deep learning beats"]["score_u"] == 9_000_000
    assert by_phrase["deep learning beats"]["rank"] == 1
    assert by_phrase["optimizer"]["score_u"] == 1_000_000
    assert by_phrase["again"]["score_u"] == 1_000_000


def test_rake_stopwords_and_punct_bound_phrases(spark):
    # stopword "the" and the comma both terminate candidate runs
    out = rake_keyphrases(
        _docs(spark, [(1, "red panda in the tall grass, red panda sleeps")])
    ).collect()
    phrases = {r["phrase"] for r in out}
    assert "red panda" in phrases
    assert all("the" not in p.split() for p in phrases)
    assert not any("grass red" in p for p in phrases)  # comma split held


def test_rake_is_document_local(spark):
    # identical text in two docs yields identical per-doc phrases/scores
    out = rake_keyphrases(
        _docs(
            spark,
            [(1, "solar panel efficiency gains"), (2, "solar panel efficiency gains")],
        )
    ).collect()
    d1 = sorted((r["rank"], r["phrase"], r["score_u"]) for r in out if r["doc_id"] == 1)
    d2 = sorted((r["rank"], r["phrase"], r["score_u"]) for r in out if r["doc_id"] == 2)
    assert d1 == d2 and len(d1) >= 1


def test_containment_catches_embedded_quote(spark):
    from graphiti_spark.operators.docs import containment_pairs

    quote = "the quick brown fox jumps over the lazy dog tonight"
    long_doc = (
        "unrelated opening paragraph discussing markets and weather. "
        + quote
        + " closing analysis section mentions other topics entirely here "
        + "with several additional sentences padding the document length "
        + "so the jaccard similarity stays low while containment is total"
    )
    docs = spark.createDataFrame(
        [(1, quote), (2, long_doc), (3, "completely different content about trains")],
        "doc_id long, text string",
    )
    out = containment_pairs(docs, max_df_frac=1.0).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in out}
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    assert r["containment_u"] == 1_000_000  # quote fully contained
    assert r["contained"] == 1  # the smaller doc is the contained side
    assert (1, 3) not in pairs
