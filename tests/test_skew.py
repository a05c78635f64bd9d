"""Skew-handling utilities: salted joins/aggregations must be
row-identical to their plain counterparts, and the entity-LSH bucket cap
must drop only pathological buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphiti_spark.functions.skew import salted_join, salted_top1_by


def _skewed(spark):
    # one hot key (90% of rows) + a long tail, with a payload column
    rows = [(("hot" if i % 10 else f"k{i}"), i, f"p{i}") for i in range(1000)]
    return spark.createDataFrame(rows, "k string, v long, payload string")


def test_salted_join_matches_plain_inner(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", 1), ("k10", 2), ("k20", 3), ("missing", 4)], "k string, tag long"
    )
    plain = big.join(small, ["k"]).orderBy("v").collect()
    salted = salted_join(big, small, ["k"], n_salt=8).orderBy("v").collect()
    assert salted == plain
    assert len(plain) == 900 + 2  # hot rows + k10 + k20


def test_salted_join_matches_plain_left(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([("hot", 1)], "k string, tag long")
    plain = big.join(small, ["k"], "left").orderBy("v").collect()
    salted = salted_join(big, small, ["k"], n_salt=4, how="left").orderBy(
        "v"
    ).collect()
    assert salted == plain


def test_salted_top1_matches_window_min(spark):
    df = _skewed(spark)
    got = {
        r["k"]: (r["v"], r["payload"])
        for r in salted_top1_by(df, ["k"], "v", ["payload"], n_salt=8).collect()
    }
    want = {
        r["k"]: (r["v"], r["payload"])
        for r in df.groupBy("k")
        .agg(F.min_by(F.struct("v", "payload"), "v").alias("b"))
        .select("k", "b.*")
        .collect()
    }
    assert got == want
    assert got["hot"] == (1, "p1")  # smallest hot-key v (i % 10 != 0 rows)


def test_lsh_bucket_cap_drops_pathological_bucket(spark):
    """A template family of near-identical names (one hot LSH bucket) is
    dropped by the cap; a genuine small alias cluster still matches."""
    from graphiti_spark.operators.resolve import match_edges_lsh

    # 60 rows with the SAME norm name = one hot bucket in every band
    # (the exact-name case is exact-blocking's job anyway — resolve runs
    # match_edges_exact on it — so LSH dropping it loses nothing)
    rows = [
        ("g", "template page", "template page", "Place", f"u{i:05d}")
        for i in range(60)
    ] + [
        ("g", "alice johnson", "alice johnson", "Person", "ua"),
        ("g", "alice johnsonn", "alice johnsonn", "Person", "ub"),
    ]
    ents = spark.createDataFrame(
        rows, "group_id string, name string, norm_name string, label string, uuid string"
    )
    capped = match_edges_lsh(ents, threshold=0.6, max_bucket=10)
    pairs = {(r["src"], r["dst"]) for r in capped.collect()}
    assert ("ua", "ub") in pairs or ("ub", "ua") in pairs
    # every template pair is gone (their buckets exceed the cap)
    assert all(not (a.startswith("u0") and b.startswith("u0")) for a, b in pairs)
    # uncapped, the hot bucket floods the candidate set quadratically
    flood = match_edges_lsh(ents, threshold=0.6, max_bucket=100_000)
    assert flood.count() == capped.count() + 60 * 59 // 2
