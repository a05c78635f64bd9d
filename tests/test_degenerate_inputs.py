"""Degenerate-input robustness: the construction DAG and the facade must
handle empty corpora, entity-free pages, unicode, and mutations on an
empty graph without crashing — the edge cases a crawl-scale ingest hits
daily (empty partitions, boilerplate-only pages)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from graphiti_spark.plans.pipeline import build_graph, triples_view


def _pages(spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, url string, warc_ts timestamp, text string,"
        " lang string, group_id string"
    )
    return df.withColumn("html", F.lit(None).cast("binary"))


T0 = dt.datetime(2024, 1, 1)


def test_empty_corpus_yields_empty_tables(spark):
    t = build_graph(spark, sf_dir="", pages=_pages(spark, []))
    assert t.episodes.count() == 0
    assert t.nodes.count() == 0
    assert t.edges.count() == 0
    assert triples_view(t).count() == 0


def test_entity_free_page_yields_episode_only(spark):
    t = build_graph(
        spark, sf_dir="",
        pages=_pages(spark, [(0, "https://x/0", T0,
                              "nothing interesting here. ", "en", "g1")]),
    )
    assert t.episodes.count() == 1
    assert t.nodes.count() == 0
    assert t.edges.count() == 0


def test_single_relation_page_full_chain(spark):
    t = build_graph(
        spark, sf_dir="",
        pages=_pages(spark, [(0, "https://x/0", T0,
                              "Alice Johnson works at Acme Corp. ",
                              "en", "g1")]),
    )
    got = triples_view(t).collect()
    assert len(got) == 1
    assert (got[0]["subj"], got[0]["pred"], got[0]["obj"]) == (
        "Alice Johnson", "WORKS_AT", "Acme Corp"
    )


def test_searches_and_mutations_on_empty_graph(spark):
    from graphiti_spark.api import (
        EDGE_HYBRID_SEARCH_RRF,
        NODE_HYBRID_SEARCH_MMR,
        GraphitiSpark,
        SearchConfig,
    )

    g = GraphitiSpark(spark)
    g.build(sf_dir="", pages=_pages(spark, []))
    for cfg in (
        EDGE_HYBRID_SEARCH_RRF,
        NODE_HYBRID_SEARCH_MMR,
        SearchConfig("edges", "cross_encoder"),
        SearchConfig("edges", "cross_encoder_learned"),
    ):
        assert g.search(["anything"], cfg).count() == 0
    # removing a nonexistent episode is a no-op; add_triplet bootstraps
    # nodes+edge on the empty graph
    g.remove_episodes(["nonexistent"])
    g.add_triplet("g1", "A B", "LIKES", "C D", "A B likes C D.", T0, "0" * 32)
    assert g.tables.edges.count() == 1
    assert g.tables.nodes.count() == 2
