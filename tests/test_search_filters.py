"""SearchFilters threaded through GraphitiSpark.search (reference
search_filters.py:41-171 via search/search.py:68,91,103): node labels
(P1), edge relation types, and CNF/DNF temporal clauses all prune the
persisted embedding corpus before scoring.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from graphiti_spark.api import (
    EDGE_HYBRID_SEARCH_RRF,
    NODE_HYBRID_SEARCH_RRF,
    GraphitiSpark,
    SearchFilters,
)


@pytest.fixture(scope="module")
def g(spark, sf_dir):
    api = GraphitiSpark(spark)
    api.build(sf_dir)
    return api


def _node_labels(g, uuids):
    rows = g.tables.nodes.where(F.col("uuid").isin(uuids)).select(
        "uuid", "labels"
    ).collect()
    return {r["uuid"]: list(r["labels"]) for r in rows}


def test_node_label_filter_restricts_scope(g):
    base = g.search(["acme corp"], NODE_HYBRID_SEARCH_RRF).toPandas()
    filt = g.search(
        ["acme corp"],
        NODE_HYBRID_SEARCH_RRF,
        filters=SearchFilters(node_labels=["Person"]),
    ).toPandas()
    # unfiltered search for an org name surfaces the Organization node;
    # the Person-filtered search must not
    base_labels = _node_labels(g, base["uuid"].tolist())
    filt_labels = _node_labels(g, filt["uuid"].tolist())
    assert any("Organization" in ls for ls in base_labels.values())
    assert all("Person" in ls for ls in filt_labels.values())


def test_edge_type_filter(g):
    filt = g.search(
        ["alice johnson works"],
        EDGE_HYBRID_SEARCH_RRF,
        filters=SearchFilters(edge_types=["LIKES"]),
    ).toPandas()
    names = (
        g.tables.edges.where(F.col("uuid").isin(filt["uuid"].tolist()))
        .select("name").toPandas()["name"].tolist()
    )
    assert names and set(names) == {"LIKES"}


def test_edge_date_filter_cnf(g):
    cut = datetime.datetime(2024, 1, 3)
    filt = g.search(
        ["alice johnson works"],
        EDGE_HYBRID_SEARCH_RRF,
        filters=SearchFilters(valid_at=[[(">=", cut)]]),
    ).toPandas()
    assert len(filt) > 0
    vals = (
        g.tables.edges.where(F.col("uuid").isin(filt["uuid"].tolist()))
        .select("valid_at").toPandas()["valid_at"]
    )
    assert (vals >= cut).all()


def test_is_null_clause(g):
    filt = g.search(
        ["alice johnson works"],
        EDGE_HYBRID_SEARCH_RRF,
        filters=SearchFilters(invalid_at=[[("is_null", None)]]),
    ).toPandas()
    assert len(filt) > 0
    inv = (
        g.tables.edges.where(F.col("uuid").isin(filt["uuid"].tolist()))
        .select("invalid_at").toPandas()["invalid_at"]
    )
    assert inv.isna().all()


def test_filters_compose_with_no_matches(g):
    # conjunction that nothing satisfies: valid before 1990
    out = g.search(
        ["alice johnson works"],
        EDGE_HYBRID_SEARCH_RRF,
        filters=SearchFilters(
            valid_at=[[("<", datetime.datetime(1990, 1, 1))]]
        ),
    )
    assert out.count() == 0
