"""HyperLogLog sketch (operators/sketches.py): the driver gates
cross-engine bit-parity via the `doc_hll_distinct` oracle; these pin
the two properties SQL equality can't — MERGEABILITY (registers of a
union == fold of the halves' registers, the property that lets
per-partition/per-day sketches roll up) and the ~1.04/sqrt(m) error
bound vs exact distincts."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphiti_spark.operators import docs as docs_mod, sketches


def _toks(spark, sf_dir):
    d = docs_mod.read_documents(spark, sf_dir)
    return d.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{docs_mod.WORD}', 0)")
        ).alias("tok"),
    )


def test_hll_merge_equals_whole(spark, sf_dir):
    toks = _toks(spark, sf_dir)
    whole = sketches.hll_estimate(sketches.hll_registers(toks))
    lo = sketches.hll_registers(toks.where("doc_id % 2 = 0"))
    hi = sketches.hll_registers(toks.where("doc_id % 2 = 1"))
    merged = sketches.hll_estimate(lo.unionByName(hi))
    w = {r["g"]: (r["zeros"], r["hll_q"]) for r in whole.collect()}
    m = {r["g"]: (r["zeros"], r["hll_q"]) for r in merged.collect()}
    assert w == m


def test_hll_error_within_bound(spark, sf_dir):
    out = sketches.hll_distinct(_toks(spark, sf_dir)).collect()
    assert len(out) > 0
    for r in out:
        err = abs(r["hll_q"] - r["exact_distinct"]) / r["exact_distinct"]
        # 1.04/sqrt(256) = 6.5% std error; 3 sigma ~= 20%
        assert err <= 0.20, (r["source"], r["hll_q"], r["exact_distinct"])


def test_hll_rho_range(spark):
    """Registers from a known item: rho in [1, RHO_MAX], bucket in
    [0, 256)."""
    items = spark.createDataFrame(
        [("g", f"t{i}") for i in range(500)], "source string, tok string"
    )
    regs = sketches.hll_registers(items).collect()
    assert all(0 <= r["bucket"] < sketches.HLL_M for r in regs)
    assert all(1 <= r["M"] <= sketches.RHO_MAX for r in regs)


def test_cms_overcount_and_merge(spark, sf_dir):
    """CMS invariants: estimate >= exact for EVERY queried key
    (collisions only inflate), and counters are sum-mergeable —
    summing the halves' counter tables equals the whole stream's."""
    from pyspark.sql import functions as F

    toks = _toks(spark, sf_dir).select("doc_id", "tok")
    counters = sketches.cms_counters(toks)
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact"))
    est = sketches.cms_estimate(counters, exact.select("tok"))
    joined = exact.join(est, "tok").collect()
    assert len(joined) > 0
    assert all(r["cms_est"] >= r["exact"] for r in joined)

    lo = sketches.cms_counters(toks.where("doc_id % 2 = 0"))
    hi = sketches.cms_counters(toks.where("doc_id % 2 = 1"))
    merged = (
        lo.unionByName(hi).groupBy("r", "pos").agg(F.sum("c").alias("c"))
    )
    w = {(r["r"], r["pos"]): r["c"] for r in counters.collect()}
    m = {(r["r"], r["pos"]): r["c"] for r in merged.collect()}
    assert w == m
