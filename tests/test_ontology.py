"""Ontology extension point (reference `entity_types` /`edge_types`,
graphiti.py:264; node classification node_operations.py:339-355; edge
duplicate judgment edge_operations.py:151-192): a custom Ontology changes
entity labels, predicate synonym classes (edge dedup) and contradiction
classes with no code edits — the deterministic analogue of handing the
reference custom pydantic entity types and edge maps.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphiti_spark.ontology import DEFAULT, Ontology
from graphiti_spark.plans.pipeline import build_graph


def _pages(spark, rows):
    return spark.createDataFrame(
        [
            (
                f"https://src0.example.com/doc/{i}",
                None,
                None,
                text,
                "en",
                "src0",
                i,
            )
            for i, text in enumerate(rows)
        ],
        "url string, warc_ts timestamp, html binary, text string,"
        " lang string, group_id string, doc_id long",
    ).withColumn(
        # staggered per doc: the earliest observation (doc 0, WORKS_AT)
        # must deterministically donate the merged edge's predicate
        "warc_ts",
        F.expr("timestampadd(MINUTE, cast(doc_id as int),"
               " timestamp'2024-06-01 00:00:00')"),
    )


TEXTS = [
    "title zero\n\nnoise\n\nAlice Johnson works at Acme Corp.",
    "title one\n\nnoise\n\nAlice Johnson is employed at Acme Corp.",
    "title two\n\nnoise\n\nBob Hartley likes Carol Danvers.",
]


def test_default_ontology_merges_paraphrase_predicates(spark):
    t = build_graph(spark, sf_dir="", pages=_pages(spark, TEXTS))
    eds = t.edges.select("name").toPandas()["name"].tolist()
    # EMPLOYED_AT collapses into the WORKS_AT synonym class: one edge for
    # the pair, named by the earliest observation
    assert eds.count("WORKS_AT") == 1
    assert "EMPLOYED_AT" not in eds


def test_custom_ontology_changes_labels_and_dedup(spark):
    custom = Ontology(
        pred_roles={
            **DEFAULT.pred_roles,
            # relabel: employers become 'Company', employees 'Agent'
            "WORKS_AT": ("Agent", "Company"),
            "EMPLOYED_AT": ("Agent", "Company"),
            "LIKES": ("Agent", "Agent"),
        },
        synonyms={},  # no paraphrase classes: EMPLOYED_AT keeps its own edge
    )
    t = build_graph(spark, sf_dir="", pages=_pages(spark, TEXTS), ontology=custom)
    eds = t.edges.select("name").toPandas()["name"].tolist()
    assert sorted(e for e in eds if e.endswith("_AT")) == [
        "EMPLOYED_AT",
        "WORKS_AT",
    ]
    labs = {
        r["name"]: r["labels"]
        for r in t.nodes.select("name", "labels").collect()
    }
    assert "Agent" in labs["Alice Johnson"]
    assert "Company" in labs["Acme Corp"]


def test_ontology_synonym_class_sql_identity():
    assert Ontology(synonyms={}).synonym_class_sql("pred") == "pred"
    sql = DEFAULT.synonym_class_sql("pred")
    assert "EMPLOYED_AT" in sql and "WORKS_AT" in sql
