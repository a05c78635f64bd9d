"""Registrable-domain extraction + per-domain curation rollup semantics
on crafted urls (the oracle gate pins it corpus-wide)."""

from __future__ import annotations

from graphiti_spark.operators.urls import domain_stats

GOOD = " ".join(["the cat and dog is near to a house of stone"] * 6)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string, url string"
    )


def test_registrable_domain_rules(spark):
    out = domain_stats(
        _docs(
            spark,
            [
                (1, "en", GOOD, "https://www.site-a.co.uk/p/1"),
                (2, "en", "tiny page", "https://news.site-a.co.uk:8080/x?y=1"),
                (3, "de", "andere seite", "http://user:pw@cdn.site-b.com/z"),
                (4, "en", "plain host", "https://localhost/x"),
            ],
        )
    )
    rows = {r["domain"]: r.asDict() for r in out.collect()}
    # co.uk is a second-level suffix: registrable keeps three labels;
    # port and userinfo are stripped before label splitting
    assert rows["site-a.co.uk"]["n_docs"] == 2
    assert rows["site-b.com"]["n_docs"] == 1
    assert rows["localhost"]["n_docs"] == 1  # single-label host passthrough


def test_cross_domain_dup_counts_both_sides(spark):
    out = domain_stats(
        _docs(
            spark,
            [
                (1, "en", "same content here", "https://orig.example.com/a"),
                (2, "en", "Same   CONTENT here", "https://mirror.example.net/a"),
                (3, "en", "unique content", "https://orig.example.com/b"),
            ],
        )
    )
    rows = {r["domain"]: r.asDict() for r in out.collect()}
    # fingerprint normalizes case+whitespace, so 1 and 2 are exact dups;
    # the mirror AND the original both count as dup pages
    assert rows["example.com"]["n_dup_docs"] == 1
    assert rows["example.net"]["n_dup_docs"] == 1
    assert rows["example.com"]["n_docs"] == 2


def test_tokens_langs_and_gopher_keep(spark):
    out = domain_stats(
        _docs(
            spark,
            [
                (1, "en", GOOD, "https://a.example.com/1"),
                (2, "de", "zwei worte", "https://b.example.com/2"),
            ],
        )
    )
    rows = {r["domain"]: r.asDict() for r in out.collect()}
    assert rows["example.com"]["n_langs"] == 2
    assert rows["example.com"]["n_tokens"] == 66 + 2
    # GOOD passes every Gopher rule; the two-word page fails word-count
    assert rows["example.com"]["n_gopher_keep"] == 1
