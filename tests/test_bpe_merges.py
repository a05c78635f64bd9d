"""Iterative BPE merge training (docs.bpe_merges): the driver gates
cross-engine equality via the `doc_bpe_merges` oracle; these pin the
merge-loop semantics on hand corpora — argmax tie-breaks, merged
symbols pairing in later rounds, and the greedy leftmost overlap rule
('aaaa' -> [aa, aa], never [a, aa, a])."""

from __future__ import annotations

from graphiti_spark.operators.docs import bpe_merges


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _merges(spark, texts, n):
    out = bpe_merges(_docs(spark, texts), n_merges=n).collect()
    return [(r["round"], r["lhs"], r["rhs"], r["total"]) for r in
            sorted(out, key=lambda r: r["round"])]


def test_low_lower(spark):
    """low:2 lower:1 — (l,o) and (o,w) tie at 3, 'l' < 'o' wins; the
    merged 'lo' then pairs with 'w'; round 3 ties (e,r)=(low,e)=1 and
    'e' < 'low'; round 4 pairs the two merged symbols."""
    got = _merges(spark, ["low low lower"], 4)
    assert got == [
        (1, "l", "o", 3),
        (2, "lo", "w", 3),
        (3, "e", "r", 1),
        (4, "low", "er", 1),
    ]


def test_overlap_greedy_leftmost(spark):
    """'aaaa': (a,a) occurs 3 times but the rewrite merges leftmost
    non-overlapping -> [aa, aa], which then merge to one symbol."""
    got = _merges(spark, ["aaaa"], 2)
    assert got == [(1, "a", "a", 3), (2, "aa", "aa", 1)]


def test_chained_boundary_merge(spark):
    """'banana' + weight from 'an an': merging (a,n) must catch BOTH
    banana occurrences (b an an a) even though the matches share a
    boundary — the case a separator-consuming string replace() loses.
    Round 2 then pairs the two merged symbols inside banana."""
    got = _merges(spark, ["banana an an an"], 2)
    # pairs r1: (a,n): 2 in banana + 3 singles = 5
    assert got[0] == (1, "a", "n", 5)
    # banana -> [b, an, an, a]: (an,an):1, (b,an):1, (an,a):1 — ties
    # break lexicographically: (an,a) < (an,an) < (b,an)
    assert got[1] == (2, "an", "a", 1)
