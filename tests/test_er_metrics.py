"""Pairwise ER metrics on crafted clusterings (the oracle gate asserts
the engine's corpus-wide resolution is pairwise-PERFECT; this pins the
metric arithmetic where it is not)."""

from __future__ import annotations

from graphiti_spark.operators.resolve import er_pair_metrics


def _truth(spark, rows):
    return spark.createDataFrame(
        [("g", n, b) for n, b in rows], "group_id string, name string, base string"
    )


def _engine(spark, rows):
    return spark.createDataFrame(
        [("g", n, c) for n, c in rows],
        "group_id string, name string, cluster string",
    )


def test_perfect_clustering(spark):
    rows = [("Ann", "A"), ("Annn", "A"), ("Bob", "B")]
    out = er_pair_metrics(
        _truth(spark, rows), _engine(spark, [(n, b) for n, b in rows])
    ).collect()[0]
    assert out["tp"] == 1 and out["fp"] == 0 and out["fn"] == 0
    assert out["precision_u"] == out["recall_u"] == out["f1_u"] == 1_000_000


def test_over_merge_hits_precision(spark):
    truth = [("Ann", "A"), ("Annn", "A"), ("Bob", "B")]
    engine = [("Ann", "c1"), ("Annn", "c1"), ("Bob", "c1")]  # all merged
    out = er_pair_metrics(
        _truth(spark, truth), _engine(spark, engine)
    ).collect()[0]
    # engine pairs: 3; truth pairs: 1 -> tp=1 fp=2 fn=0
    assert (out["tp"], out["fp"], out["fn"]) == (1, 2, 0)
    assert out["precision_u"] == 333_333
    assert out["recall_u"] == 1_000_000
    assert out["f1_u"] == 500_000  # 2*1e6 div 4


def test_under_merge_hits_recall(spark):
    truth = [("Ann", "A"), ("Annn", "A"), ("An", "A")]
    engine = [("Ann", "c1"), ("Annn", "c1"), ("An", "c2")]  # one split off
    out = er_pair_metrics(
        _truth(spark, truth), _engine(spark, engine)
    ).collect()[0]
    # truth pairs: 3; engine pairs: 1 -> tp=1 fn=2
    assert (out["tp"], out["fp"], out["fn"]) == (1, 0, 2)
    assert out["precision_u"] == 1_000_000
    assert out["recall_u"] == 333_333
    assert out["f1_u"] == 500_000


def test_groups_roll_up_independently(spark):
    truth = _truth(spark, [("Ann", "A"), ("Annn", "A")]).unionByName(
        spark.createDataFrame(
            [("h", "X", "x"), ("h", "Y", "x")],
            "group_id string, name string, base string",
        )
    )
    engine = _engine(spark, [("Ann", "c1"), ("Annn", "c1")]).unionByName(
        spark.createDataFrame(
            [("h", "X", "k1"), ("h", "Y", "k2")],
            "group_id string, name string, cluster string",
        )
    )
    rows = {r["group_id"]: r.asDict() for r in er_pair_metrics(truth, engine).collect()}
    assert rows["g"]["f1_u"] == 1_000_000
    assert rows["h"]["recall_u"] == 0 and rows["h"]["n_truth_pairs"] == 1
