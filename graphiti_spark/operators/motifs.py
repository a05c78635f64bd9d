"""Motif (basic-graph-pattern) matching over the canonical triples —
the GraphFrames `find()` surface re-expressed as pure DataFrame joins.

graphiti answers structural questions through per-call Cypher patterns
(/root/reference/graphiti_core/graph_queries.py and the MATCH clauses in
search/search_utils.py); the batch engine's equivalent is a conjunctive
pattern compiled to equi-joins on the triples view. A pattern is a
semicolon-separated list of edge terms

    (a)-[WORKS_AT]->(o); (b)-[WORKS_AT]->(o); !(a)-[LIKES]->(b)

where node variables bind across terms, the predicate is either a
literal name or `*` (any predicate; bound to an output column `p<i>`
on positive terms), and a `!` prefix negates the term (the embedding
must have NO such arc — Cypher's WHERE NOT EXISTS, compiled to a
left-anti join). The compiler joins positive terms in a greedy
connected order (every step shares at least one bound variable with
the terms already joined, so NO cartesian product can appear in the
plan — a disconnected pattern is rejected), always equi-joining on
(group_id, shared vars); negative terms apply afterwards and may only
mention variables the positive terms bound.

Scale notes: each step is one hash/sort-merge equi-join (or anti-join)
keyed by (group_id, join vars) over the skinny (subj, pred, obj)
projection — the same plan family as the hand-written
kg_shared_employer motif; hub skew on a shared variable is the
standard AQE skew-join case. Pattern size is user-bounded
(len(terms) joins), never data-dependent.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

_TERM_RE = re.compile(
    r"^(!?)\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*-\s*\[\s*([A-Za-z0-9_*]+)\s*\]\s*->"
    r"\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)$"
)
_RESERVED_VAR_RE = re.compile(r"^[pt]\d+$")


def parse_motif(pattern: str) -> list[tuple[bool, str, str, str]]:
    """-> [(negated, src_var, pred_or_star, dst_var)]; raises ValueError
    on syntax errors or an all-negative pattern."""
    terms = []
    for raw in pattern.split(";"):
        raw = raw.strip()
        if not raw:
            continue
        m = _TERM_RE.match(raw)
        if not m:
            raise ValueError(f"bad motif term: {raw!r}")
        neg, sv, p, dv = m.group(1) == "!", m.group(2), m.group(3), m.group(4)
        # a self-referential term would alias subj and obj to the SAME
        # column name, yielding duplicate columns that later joins resolve
        # ambiguously (or not at all) — reject instead of silently
        # mis-matching; likewise variables that collide with the generated
        # p<i> (wildcard-predicate) / t<i> (temporal) output columns
        if sv == dv:
            raise ValueError(
                f"self-referential motif term {raw!r}: src and dst variable "
                "must differ (self-loops are not expressible)"
            )
        for v in (sv, dv):
            if _RESERVED_VAR_RE.match(v):
                raise ValueError(
                    f"motif variable {v!r} collides with generated p<i>/t<i> "
                    "output columns; rename it"
                )
        terms.append((neg, sv, p, dv))
    if not terms:
        raise ValueError("empty motif pattern")
    if all(t[0] for t in terms):
        raise ValueError("motif pattern needs at least one positive term")
    return terms


def _join_order(pos: list[int], terms: list[tuple[bool, str, str, str]]) -> list[int]:
    """Greedy connected ordering of the positive terms; ValueError if the
    pattern is disconnected (which would force a cartesian join)."""
    remaining = set(pos[1:])
    order = [pos[0]]
    bound = {terms[pos[0]][1], terms[pos[0]][3]}
    while remaining:
        nxt = next(
            (i for i in sorted(remaining)
             if terms[i][1] in bound or terms[i][3] in bound),
            None,
        )
        if nxt is None:
            raise ValueError(
                "disconnected motif pattern (would require a cartesian join): "
                f"{terms}"
            )
        order.append(nxt)
        bound |= {terms[nxt][1], terms[nxt][3]}
        remaining.remove(nxt)
    return order


def match_motif(
    triples: DataFrame,
    pattern: str,
    distinct_vars: bool = True,
    time_ordered: bool = False,
) -> DataFrame:
    """Match a conjunctive edge pattern against the (group_id, subj,
    pred, obj) triples. Returns one row per embedding: group_id, one
    column per node variable, and p<i> columns for positive `*`
    predicates. `!`-prefixed terms are absence constraints (left-anti
    joins); their variables must be bound by the positive terms.
    distinct_vars=True additionally requires all node variables to bind
    pairwise-distinct entities (standard motif semantics; prevents the
    degenerate self-matches).

    time_ordered=True makes this a TEMPORAL motif (Paranjape et al.,
    WSDM 2017 semantics on fact validity): every positive term binds
    its edge's valid_at as t<i>, and embeddings must satisfy
    t0 <= t1 <= ... in the pattern's WRITTEN order (facts with NULL
    valid_at cannot witness a time-ordered pattern). The time columns
    stay in the output for downstream delta analysis."""
    terms = parse_motif(pattern)
    cols = ["group_id", "subj", "pred", "obj"] + (
        ["valid_at"] if time_ordered else []
    )
    base = triples.select(*cols).distinct()
    pos = [i for i, t in enumerate(terms) if not t[0]]
    neg = [i for i, t in enumerate(terms) if t[0]]

    pos_vars = {v for i in pos for v in (terms[i][1], terms[i][3])}
    for i in neg:
        unbound = {terms[i][1], terms[i][3]} - pos_vars
        if unbound:
            raise ValueError(
                f"negative motif term uses unbound variable(s) {sorted(unbound)}"
            )

    def term_df(i: int, with_pred_col: bool) -> DataFrame:
        _, sv, p, dv = terms[i]
        t = base
        cols = [
            F.col("group_id"),
            F.col("subj").alias(sv),
            F.col("obj").alias(dv),
        ]
        if p == "*":
            if with_pred_col:
                cols.append(F.col("pred").alias(f"p{i}"))
        else:
            t = t.where(F.col("pred") == p)
        if time_ordered and with_pred_col:
            t = t.where(F.col("valid_at").isNotNull())
            cols.append(F.col("valid_at").alias(f"t{i}"))
        return t.select(*cols)

    order = _join_order(pos, terms)
    out = term_df(order[0], True)
    for i in order[1:]:
        nxt = term_df(i, True)
        shared = ["group_id"] + [
            c for c in nxt.columns if c != "group_id" and c in out.columns
        ]
        out = out.join(nxt, shared)
    for i in neg:
        _, sv, p, dv = terms[i]
        out = out.join(
            term_df(i, False).dropDuplicates(),
            ["group_id", sv, dv],
            "left_anti",
        )
    if time_ordered:
        for prev, cur in zip(pos, pos[1:]):
            out = out.where(F.col(f"t{prev}") <= F.col(f"t{cur}"))
    if distinct_vars:
        vars_ = sorted(pos_vars)
        for i in range(len(vars_)):
            for j in range(i + 1, len(vars_)):
                out = out.where(F.col(vars_[i]) != F.col(vars_[j]))
    return out
