"""Prefix-filtering set-similarity join (dedup.prefix_filter_pairs):
the driver gates cross-engine equality via the `doc_prefix_join`
oracle; this pins the algorithm's defining property — EXACTNESS: the
candidate pruning (prefix + length filters) loses no pair, so the
output equals the brute-force all-pairs Jaccard join. MinHash-LSH is
probabilistic recall; prefix filtering is guaranteed recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphiti_spark.operators.dedup import prefix_filter_pairs


def _brute(spark, docs, tau_num, tau_den):
    dt = docs.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("tok"),
    ).distinct()
    sz = dt.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = dt.select(F.col("doc_id").alias("doc_a"), "tok")
    b = dt.select(F.col("doc_id").alias("doc_b"), "tok")
    inter = (
        a.join(b, "tok")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter_sz"))
    )
    out = (
        inter.join(sz.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a")), "doc_a")
        .join(sz.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b")), "doc_b")
        .withColumn("jaccard_u", F.expr("(1000000 * inter_sz) div (sz_a + sz_b - inter_sz)"))
        .where(F.col("jaccard_u") >= 1_000_000 * tau_num // tau_den)
    )
    return {
        (r["doc_a"], r["doc_b"]): (r["inter_sz"], r["jaccard_u"])
        for r in out.collect()
    }


def test_exactness_vs_brute_force(spark, sf_dir):
    from graphiti_spark.operators import docs as docs_mod

    docs = docs_mod.read_documents(spark, sf_dir).select("doc_id", "text")
    got = {
        (r["doc_a"], r["doc_b"]): (r["inter_sz"], r["jaccard_u"])
        for r in prefix_filter_pairs(docs, tau_num=4, tau_den=5).collect()
    }
    want = _brute(spark, docs, 4, 5)
    assert got == want and len(want) > 0


def test_prefix_prunes_disjoint_rare_tokens(spark):
    """Two docs sharing only their most frequent token are not even
    candidates (the shared token is outside both prefixes), yet a true
    near-dup pair passes."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta common"),
            (2, "epsilon zeta eta theta common"),
            (3, "alpha beta gamma delta common extra"),
        ],
        "doc_id long, text string",
    )
    got = {(r["doc_a"], r["doc_b"]) for r in
           prefix_filter_pairs(docs, tau_num=4, tau_den=5).collect()}
    assert got == {(1, 3)}  # jaccard(1,3) = 5/6 = 0.833; (1,2) = 1/9
