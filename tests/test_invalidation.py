"""Temporal edge invalidation (X10-X12) — the three behavioral contracts
from the reference's tests (tests/utils/maintenance/
test_edge_operations.py:95-237 and
test_temporal_operations_int.py:97-331), ported as table-level checks:

1. non-contradicting edges are untouched;
2. a later opposite-polarity fact on the same pair sets the earlier
   edge's invalid_at to the later fact's valid_at and stamps expired_at;
3. facts in different contradiction classes (or different pairs) never
   invalidate each other ("changed position" invalidates nothing).
"""

from __future__ import annotations

import datetime

import pandas as pd
import pytest

from graphiti_spark.operators.materialize import JOB_TS, invalidate_edges

T0 = datetime.datetime(2024, 1, 1)
T1 = datetime.datetime(2024, 2, 1)
T2 = datetime.datetime(2024, 3, 1)

COLS = (
    "uuid string, group_id string, source_node_uuid string,"
    " target_node_uuid string, name string, fact string,"
    " episodes array<string>, valid_at timestamp, invalid_at timestamp,"
    " created_at timestamp"
)


def _edges(spark, rows):
    return spark.createDataFrame(
        [
            (u, "g", s, d, p, f"{s} {p} {d}", ["ep"], v, None, T0)
            for (u, s, p, d, v) in rows
        ],
        COLS,
    )


def _out(df) -> pd.DataFrame:
    return df.toPandas().set_index("uuid")


def test_no_contradiction_no_change(spark):
    rows = [
        ("e1", "alice", "WORKS_AT", "acme", T0),
        ("e2", "alice", "KNOWS", "bob", T1),
        ("e3", "alice", "LIKES", "bob", T1),
    ]
    out = _out(invalidate_edges(_edges(spark, rows)))
    assert out["invalid_at"].isna().all()
    assert out["expired_at"].isna().all()


def test_later_negation_invalidates_earlier(spark):
    rows = [
        ("e1", "bob", "WORKS_AT", "xyz", T0),
        ("e2", "bob", "NO_LONGER_WORKS_AT", "xyz", T1),
    ]
    out = _out(invalidate_edges(_edges(spark, rows)))
    assert out.loc["e1", "invalid_at"] == T1
    assert out.loc["e1", "expired_at"] == JOB_TS
    # the invalidator itself has no later contradiction
    assert pd.isna(out.loc["e2", "invalid_at"])


def test_dislikes_invalidates_likes_but_not_knows(spark):
    rows = [
        ("e1", "alice", "LIKES", "bob", T0),
        ("e2", "alice", "DISLIKES", "bob", T1),
        ("e3", "alice", "KNOWS", "bob", T0),
    ]
    out = _out(invalidate_edges(_edges(spark, rows)))
    assert out.loc["e1", "invalid_at"] == T1
    assert pd.isna(out.loc["e3", "invalid_at"])


def test_different_pair_never_invalidates(spark):
    rows = [
        ("e1", "bob", "WORKS_AT", "xyz", T0),
        ("e2", "bob", "NO_LONGER_WORKS_AT", "abc", T1),  # different org
        ("e3", "carol", "NO_LONGER_WORKS_AT", "xyz", T1),  # different person
    ]
    out = _out(invalidate_edges(_edges(spark, rows)))
    assert out["invalid_at"].isna().all()


def test_earliest_later_contradiction_wins(spark):
    """With two later negations, invalid_at is the earliest one
    (edge_operations.py:287-300 scans candidates valid_at-ascending)."""
    rows = [
        ("e1", "bob", "WORKS_AT", "xyz", T0),
        ("e2", "bob", "NO_LONGER_WORKS_AT", "xyz", T2),
        ("e3", "bob", "NO_LONGER_WORKS_AT", "xyz", T1),
    ]
    out = _out(invalidate_edges(_edges(spark, rows)))
    assert out.loc["e1", "invalid_at"] == T1


def test_symmetric_reacquisition(spark):
    """A later positive fact re-invalidates the earlier negation
    (polarity symmetric: re-hire closes the 'no longer works at' fact)."""
    rows = [
        ("e1", "bob", "NO_LONGER_WORKS_AT", "xyz", T0),
        ("e2", "bob", "WORKS_AT", "xyz", T1),
    ]
    out = _out(invalidate_edges(_edges(spark, rows)))
    assert out.loc["e1", "invalid_at"] == T1
    assert pd.isna(out.loc["e2", "invalid_at"])


def test_preexisting_invalid_at_kept(spark):
    """An edge whose invalid_at is already set keeps it (coalesce
    semantics, reference updates only unset fields)."""
    spark_rows = [("e1", "bob", "WORKS_AT", "xyz", T0),
                  ("e2", "bob", "NO_LONGER_WORKS_AT", "xyz", T2)]
    df = _edges(spark, spark_rows)
    import pyspark.sql.functions as F

    df = df.withColumn(
        "invalid_at",
        F.when(F.col("uuid") == "e1", F.lit(T1)).otherwise(F.col("invalid_at")),
    )
    out = _out(invalidate_edges(df))
    assert out.loc["e1", "invalid_at"] == T1  # not overwritten by T2
