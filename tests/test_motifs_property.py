"""Property-based check of the motif compiler: on random small graphs
and patterns, match_motif must agree exactly with a brute-force Python
enumerator implementing the declared semantics (conjunction over terms,
wildcard binding, negation as absence, pairwise-distinct vars)."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings, strategies as st

from graphiti_spark.operators.motifs import match_motif, parse_motif

NODES = ["n1", "n2", "n3", "n4"]
PREDS = ["P", "Q"]


def brute_force(edges, pattern):
    """All embeddings as frozensets of (colname, value) items."""
    terms = parse_motif(pattern)
    pos = [i for i, t in enumerate(terms) if not t[0]]
    neg = [i for i, t in enumerate(terms) if t[0]]
    eset = set(edges)
    vars_ = sorted({v for i in pos for v in (terms[i][1], terms[i][3])})
    out = []
    for binding in itertools.product(NODES, repeat=len(vars_)):
        env = dict(zip(vars_, binding))
        if len(set(binding)) != len(binding):
            continue  # distinct_vars
        row = dict(env)
        ok = True
        # positive terms: for wildcard preds every consistent predicate
        # choice is a separate embedding
        choices = []
        for i in pos:
            _, sv, p, dv = terms[i]
            if p == "*":
                opts = [q for q in PREDS if (env[sv], q, env[dv]) in eset]
                if not opts:
                    ok = False
                    break
                choices.append((i, opts))
            elif (env[sv], p, env[dv]) not in eset:
                ok = False
                break
        if not ok:
            continue
        for i in neg:
            _, sv, p, dv = terms[i]
            if p == "*":
                if any((env[sv], q, env[dv]) in eset for q in PREDS):
                    ok = False
                    break
            elif (env[sv], p, env[dv]) in eset:
                ok = False
                break
        if not ok:
            continue
        if choices:
            for combo in itertools.product(*[opts for _, opts in choices]):
                r = dict(row)
                for (i, _), q in zip(choices, combo):
                    r[f"p{i}"] = q
                out.append(frozenset(r.items()))
        else:
            out.append(frozenset(row.items()))
    return sorted(out, key=sorted)


PATTERNS = [
    "(a)-[P]->(b)",
    "(a)-[*]->(b)",
    "(a)-[P]->(b); (b)-[Q]->(c)",
    "(a)-[P]->(b); (b)-[*]->(c)",
    "(a)-[P]->(b); (c)-[P]->(b)",
    "(a)-[P]->(b); (b)-[P]->(a)",
    "(a)-[P]->(b); (b)-[Q]->(c); !(a)-[Q]->(c)",
    "(a)-[P]->(b); !(b)-[*]->(a)",
]

edge_st = st.lists(
    st.tuples(
        st.sampled_from(NODES), st.sampled_from(PREDS), st.sampled_from(NODES)
    ),
    min_size=0,
    max_size=10,
    unique=True,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_st, pattern=st.sampled_from(PATTERNS))
def test_motif_matches_brute_force(spark, edges, pattern):
    df = spark.createDataFrame(
        [("g", s, p, o) for s, p, o in edges] or [("g", "zz", "P", "zz")],
        "group_id string, subj string, pred string, obj string",
    )
    if not edges:
        df = df.where("subj <> subj")  # empty frame with the right schema
    got = sorted(
        (frozenset((k, v) for k, v in r.asDict().items() if k != "group_id")
         for r in match_motif(df, pattern).collect()),
        key=sorted,
    )
    assert got == brute_force(edges, pattern)
