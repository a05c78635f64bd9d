"""Cluster topic labeling (docs.cluster_topics): the driver gates the
corpus-level result via the `doc_cluster_topics` oracle; these pin the
keyness semantics on a hand corpus — over-representation wins over raw
frequency, shared terms score zero, tie-break on the term string."""

from __future__ import annotations

from graphiti_spark.operators.docs import cluster_topics


def _setup(spark):
    docs = spark.createDataFrame(
        [
            (0, "apple apple common", "en", "s", 18),
            (1, "apple banana common", "en", "s", 19),
            (2, "kernel kernel common", "en", "s", 20),
            (3, "kernel gpu common", "en", "s", 18),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    asg = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "vec_id long, cell_id long"
    )
    return docs, asg


def test_distinctive_terms_beat_shared(spark):
    """'common' appears everywhere (lift 0); cluster 0 is fruit,
    cluster 1 is compute — each cluster's rank-1 term is its own
    3-occurrence word."""
    docs, asg = _setup(spark)
    out = cluster_topics(docs, asg, k=2).collect()
    top = {(r["cell_id"], r["rank"]): r["term"] for r in out}
    assert top[(0, 1)] == "apple"
    assert top[(1, 1)] == "kernel"
    by_term = {(r["cell_id"], r["term"]): r["lift_u"] for r in out}
    assert ("common" not in [t for (c, t) in by_term if c == 0]) or (
        by_term[(0, "common")] == 0
    )


def test_lift_is_cross_product_exact(spark):
    """lift_u = tf_c * T_total - tf_all * T_c, checked by hand: corpus
    has 12 tokens, each cluster 6; 'apple' tf_c=3, tf_all=3 ->
    3*12 - 3*6 = 18."""
    docs, asg = _setup(spark)
    out = {
        (r["cell_id"], r["term"]): r["lift_u"]
        for r in cluster_topics(docs, asg, k=6).collect()
    }
    assert out[(0, "apple")] == 3 * 12 - 3 * 6
    assert out[(0, "common")] == 2 * 12 - 4 * 6
    assert out[(1, "gpu")] == 1 * 12 - 1 * 6


def test_tie_breaks_on_term(spark):
    """banana and the zero-lift terms order deterministically by
    (lift desc, term asc)."""
    docs, asg = _setup(spark)
    out = [
        r["term"]
        for r in cluster_topics(docs, asg, k=6)
        .where("cell_id = 0")
        .orderBy("rank")
        .collect()
    ]
    assert out[0] == "apple"
    assert out == sorted(out[:1]) + out[1:]  # rank-1 fixed, rest stable
