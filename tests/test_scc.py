"""Strongly-connected components (centrality.scc): the driver gates the
KG-level result via the `kg_scc` oracle (recursive-CTE transitive
closure); these pin the algorithm's semantics on hand graphs — trim
peeling, pivot extraction, the counterexample where (min-ancestor,
min-descendant) pair equality would mislabel, and multi-round peeling
of SCC chains."""

from __future__ import annotations

from graphiti_spark.operators.centrality import scc


def _triples(spark, pairs, group="g"):
    return spark.createDataFrame(
        [(group, a, b) for a, b in pairs],
        "group_id string, subj string, obj string",
    )


def _run(spark, pairs, **kw):
    out = scc(_triples(spark, pairs), **kw).collect()
    return (
        {r["name"]: r["scc_id"] for r in out},
        {r["name"]: r["scc_size"] for r in out},
    )


def test_cycle_with_tail(spark):
    """3-cycle a->b->c->a plus tail c->d->e: one SCC {a,b,c} with id a,
    d and e trim away as singletons."""
    ids, sizes = _run(
        spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
    )
    assert ids == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "e"}
    assert sizes == {"a": 3, "b": 3, "c": 3, "d": 1, "e": 1}


def test_dag_is_all_singletons(spark):
    """Pure DAG (diamond): every node is its own SCC."""
    ids, sizes = _run(spark, [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")])
    assert ids == {n: n for n in "abcd"}
    assert all(s == 1 for s in sizes.values())


def test_anc_desc_pair_counterexample(spark):
    """The graph where naive (min-ancestor, min-descendant) pair
    equality fails: a->u, a->v, u->d, v->d gives u and v the identical
    pair (a, d), but they are NOT mutually reachable. The coloring
    algorithm must keep them as singletons."""
    ids, _ = _run(spark, [("a", "u"), ("a", "v"), ("u", "d"), ("v", "d")])
    assert ids == {"a": "a", "u": "u", "v": "v", "d": "d"}


def test_two_sccs_in_chain(spark):
    """Cycle {a,b} -> cycle {c,d}: two SCCs, both extractable (the
    first round's coloring paints c,d with a's color, so {c,d} waits
    for round 2 — exercises the outer peel loop)."""
    ids, sizes = _run(
        spark, [("a", "b"), ("b", "a"), ("b", "c"), ("c", "d"), ("d", "c")]
    )
    assert ids == {"a": "a", "b": "a", "c": "c", "d": "c"}
    assert sizes == {"a": 2, "b": 2, "c": 2, "d": 2}


def test_groups_isolated(spark):
    """The same names in two groups resolve independently."""
    df = _triples(spark, [("a", "b"), ("b", "a")], group="g1").unionAll(
        _triples(spark, [("a", "b")], group="g2")
    )
    out = scc(df).collect()
    got = {(r["group_id"], r["name"]): (r["scc_id"], r["scc_size"]) for r in out}
    assert got == {
        ("g1", "a"): ("a", 2),
        ("g1", "b"): ("a", 2),
        ("g2", "a"): ("a", 1),
        ("g2", "b"): ("b", 1),
    }


def test_self_loop_ignored(spark):
    """Self-loops don't create 2-cycles; a->a plus a->b is two
    singletons."""
    ids, _ = _run(spark, [("a", "a"), ("a", "b")])
    assert ids == {"a": "a", "b": "b"}


def test_oracle_parity_at_test_scale(spark, sf_dir):
    """Full gate parity at sf0.001: Spark scc vs the DuckDB
    recursive-CTE transitive-closure oracle, bit-exact."""
    import duckdb
    import __spark_entry__ as entry
    from tools.check_correctness import duck_con, normalize

    q = entry.queries()["kg_scc"]
    sql = entry.oracle_sql()["kg_scc"]
    spark_df = q(spark, sf_dir).toPandas()
    con = duck_con(sf_dir)
    oracle_df = con.execute(sql).df()
    a, b = normalize(spark_df), normalize(oracle_df)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b) and len(a) > 0
    assert a.equals(b)
