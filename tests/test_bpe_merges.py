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


def _py_bpe(texts, n_merges):
    """Pure-Python reference: Sennrich greedy BPE on the same corpus,
    vocab-collapsed, leftmost-nonoverlapping merge application."""
    import re
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in re.findall(r"[a-z]+", t.lower()):
            vocab[w] += 1
    words = {w: list(w) for w in vocab}
    merges = []
    for r in range(1, n_merges + 1):
        pairs = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += vocab[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), total = best
        merges.append((r, a, b, total))
        for w, syms in words.items():
            out, cur = [], None
            for s in syms:
                if cur == a and s == b:
                    out.append(a + b)
                    cur = None
                elif cur is None:
                    cur = s
                else:
                    out.append(cur)
                    cur = s
            if cur is not None:
                out.append(cur)
            words[w] = out
    return merges


def test_matches_python_reference_on_random_corpora(spark):
    """Deterministic pseudo-random corpora (seeded md5-ish words with
    heavy repeat runs — the overlap-prone shapes) must produce the
    exact merge table of the pure-Python Sennrich reference."""
    import hashlib

    for seed in range(4):
        rng_words = []
        for i in range(40):
            h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
            # map hex to a 4-letter alphabet to force repeats/overlaps
            rng_words.append("".join("abcd"[int(c, 16) % 4] for c in h[:8]))
        text = " ".join(rng_words)
        want = _py_bpe([text], 6)
        got = _merges(spark, [text], 6)[: len(want)]
        assert got == want, (seed, got, want)
