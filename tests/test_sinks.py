"""Bucketed sink: identically-bucketed tables join with NO exchange —
the co-located-join layout the 100 TB read side depends on."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphiti_spark.sinks import write_bucketed


def _no_broadcast(spark):
    """Force the sort-merge path: at 100 TB neither side broadcasts, and
    the whole point of bucketing is the exchange-free SMJ."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            yield
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    return ctx()


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    left = spark.range(0, 1000).selectExpr(
        "cast(id as string) AS uuid", "id * 2 AS payload"
    )
    right = spark.range(0, 1000).selectExpr(
        "cast(id as string) AS uuid", "id * 3 AS other"
    )
    write_bucketed(left, "t_left_b", ["uuid"], n_buckets=8)
    write_bucketed(right, "t_right_b", ["uuid"], n_buckets=8)
    with _no_broadcast(spark):
        j = spark.table("t_left_b").join(spark.table("t_right_b"), "uuid")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert j.count() == 1000
        # contrast: the same join over plain parquet DOES shuffle
        left.write.mode("overwrite").parquet(f"{tmp_path}/plain_left")
        right.write.mode("overwrite").parquet(f"{tmp_path}/plain_right")
        jp = spark.read.parquet(f"{tmp_path}/plain_left").join(
            spark.read.parquet(f"{tmp_path}/plain_right"), "uuid"
        )
        assert "Exchange" in jp._jdf.queryExecution().executedPlan().toString()


def test_write_graph_bucketed_roundtrip(spark):
    from graphiti_spark.plans.pipeline import build_graph
    from graphiti_spark.sinks import write_graph_bucketed

    t = build_graph(spark, "/root/testdata/sf0.001")
    names = write_graph_bucketed(t, prefix="kg_t", n_buckets=4)
    assert spark.table(names["nodes"]).count() == t.nodes.count()
    # edges joined to bucketed nodes on the bucketed key: no exchange on
    # the nodes side (edge side is bucketed by source_node_uuid too)
    e = spark.table(names["edges"])
    n = spark.table(names["nodes"]).selectExpr("uuid AS source_node_uuid", "name")
    with _no_broadcast(spark):
        plan = (
            e.join(n, "source_node_uuid")
            ._jdf.queryExecution().executedPlan().toString()
        )
        # both sides read bucketed tables on the same key/bucket count
        assert "Exchange" not in plan, plan
