"""Motif (basic-graph-pattern) matching over the canonical triples —
the GraphFrames `find()` surface re-expressed as pure DataFrame joins.

graphiti answers structural questions through per-call Cypher patterns
(/root/reference/graphiti_core/graph_queries.py and the MATCH clauses in
search/search_utils.py); the batch engine's equivalent is a conjunctive
pattern compiled to equi-joins on the triples view. A pattern is a
semicolon-separated list of edge terms

    (a)-[WORKS_AT]->(o); (b)-[WORKS_AT]->(o); (a)-[LIKES]->(b)

where node variables bind across terms and the predicate is either a
literal name or `*` (any predicate; bound to an output column `p<i>`).
The compiler joins terms in a greedy connected order (every step shares
at least one bound variable with the terms already joined, so NO
cartesian product can appear in the plan — a disconnected pattern is
rejected), always equi-joining on (group_id, shared vars).

Scale notes: each step is one hash/sort-merge equi-join keyed by
(group_id, join vars) over the skinny (subj, pred, obj) projection —
the same plan family as the hand-written kg_shared_employer motif; hub
skew on a shared variable is the standard AQE skew-join case. Pattern
size is user-bounded (len(terms) joins), never data-dependent.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

_TERM_RE = re.compile(
    r"^\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*-\s*\[\s*([A-Za-z0-9_*]+)\s*\]\s*->"
    r"\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)$"
)


def parse_motif(pattern: str) -> list[tuple[str, str, str]]:
    """-> [(src_var, pred_or_star, dst_var)]; raises ValueError on syntax."""
    terms = []
    for raw in pattern.split(";"):
        raw = raw.strip()
        if not raw:
            continue
        m = _TERM_RE.match(raw)
        if not m:
            raise ValueError(f"bad motif term: {raw!r}")
        terms.append((m.group(1), m.group(2), m.group(3)))
    if not terms:
        raise ValueError("empty motif pattern")
    return terms


def _join_order(terms: list[tuple[str, str, str]]) -> list[int]:
    """Greedy connected ordering (first term first); ValueError if the
    pattern is disconnected (which would force a cartesian join)."""
    remaining = set(range(1, len(terms)))
    order = [0]
    bound = {terms[0][0], terms[0][2]}
    while remaining:
        nxt = next(
            (i for i in sorted(remaining)
             if terms[i][0] in bound or terms[i][2] in bound),
            None,
        )
        if nxt is None:
            raise ValueError(
                "disconnected motif pattern (would require a cartesian join): "
                f"{terms}"
            )
        order.append(nxt)
        bound |= {terms[nxt][0], terms[nxt][2]}
        remaining.remove(nxt)
    return order


def match_motif(
    triples: DataFrame, pattern: str, distinct_vars: bool = True
) -> DataFrame:
    """Match a conjunctive edge pattern against the (group_id, subj,
    pred, obj) triples. Returns one row per embedding: group_id, one
    column per node variable, and p<i> columns for `*` predicates.
    distinct_vars=True additionally requires all node variables to bind
    pairwise-distinct entities (standard motif semantics; prevents the
    degenerate self-matches)."""
    terms = parse_motif(pattern)
    base = triples.select("group_id", "subj", "pred", "obj").distinct()

    def term_df(i: int) -> DataFrame:
        sv, p, dv = terms[i]
        t = base
        cols = [
            F.col("group_id"),
            F.col("subj").alias(sv),
            F.col("obj").alias(dv),
        ]
        if p == "*":
            cols.append(F.col("pred").alias(f"p{i}"))
        else:
            t = t.where(F.col("pred") == p)
        return t.select(*cols)

    order = _join_order(terms)
    out = term_df(order[0])
    for i in order[1:]:
        nxt = term_df(i)
        shared = ["group_id"] + [
            c for c in nxt.columns if c != "group_id" and c in out.columns
        ]
        out = out.join(nxt, shared)
    if distinct_vars:
        vars_ = sorted({v for t in terms for v in (t[0], t[2])})
        for i in range(len(vars_)):
            for j in range(i + 1, len(vars_)):
                out = out.where(F.col(vars_[i]) != F.col(vars_[j]))
    return out
