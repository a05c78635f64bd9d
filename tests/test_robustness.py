"""Pipeline robustness on pathological pages: empty text, unicode soup,
no extractable sentences, huge repeated content — the build must not
crash, and each page degrades to the right degree (episodes always,
triples only where patterns match)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from graphiti_spark.plans.pipeline import build_graph, triples_view

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string,"
    " group_id string, doc_id long"
)


def _pages(spark, rows):
    return spark.createDataFrame(
        [
            (u, dt.datetime(2024, 1, 1, i), None, t, "en", "g", i)
            for i, (u, t) in enumerate(rows)
        ],
        PAGES_SCHEMA,
    )


def test_pathological_pages_do_not_crash(spark):
    huge = ("Alice Johnson works at Initech. " * 2000).strip()
    rows = [
        ("https://x/empty", ""),
        ("https://x/ws", "   \n\n  \t \n\n "),
        ("https://x/unicode", "héllo wörld ​ 你好世界 🎉🎉 ﻿ mixed"),
        ("https://x/nosentence", "no capitalized entities here at all"),
        ("https://x/huge", huge),
        ("https://x/good", "Title\n\nBob Stone works at Acme."),
    ]
    t = build_graph(spark, sf_dir="unused", pages=_pages(spark, rows))
    eps = t.episodes
    # every non-empty page yields at least one episode; empty pages none
    per_url = {
        r["url"]: r["n"]
        for r in eps.groupBy("url").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_url.get("https://x/empty", 0) == 0
    assert per_url["https://x/good"] >= 1
    assert per_url["https://x/huge"] >= 1
    tv = triples_view(t).collect()
    facts = {(r["subj"], r["pred"], r["obj"]) for r in tv}
    assert ("Bob Stone", "WORKS_AT", "Acme") in facts
    assert ("Alice Johnson", "WORKS_AT", "Initech") in facts
    # the huge page's 2000 repeats collapse to ONE canonical edge
    alice = [r for r in tv if r["subj"] == "Alice Johnson"]
    assert len(alice) == 1
    # unicode / no-sentence pages produce no spurious triples
    subjects = {r["subj"] for r in tv}
    assert subjects == {"Bob Stone", "Alice Johnson"}
