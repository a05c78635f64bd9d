"""Property-based tests (hypothesis, derandomized) for the pure text /
hash / embedding primitives — the invariants every Spark stage relies on."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from graphiti_spark.functions.embed import embed_texts
from graphiti_spark.functions.text import (
    clean_text,
    lucene_sanitize,
    normalize_entity_name,
    split_paragraphs,
    tokenize_words,
)
from graphiti_spark.operators.dedup import doc_jaccard, doc_minhash
from graphiti_spark.operators.resolve import char_shingles, jaccard, minhash_signature

SETTINGS = settings(max_examples=60, derandomize=True, deadline=None)

texts = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=200,
)
words = st.lists(
    st.text(alphabet=st.sampled_from("abcdefgh"), min_size=1, max_size=6),
    min_size=0, max_size=40,
)


@SETTINGS
@given(texts)
def test_clean_text_idempotent_and_clean(s):
    c = clean_text(s)
    assert clean_text(c) == c
    assert all(ord(ch) >= 32 or ch in "\n\r\t" for ch in c)
    assert "​" not in c and "﻿" not in c


@SETTINGS
@given(texts)
def test_normalize_idempotent(s):
    n = normalize_entity_name(s)
    assert normalize_entity_name(n) == n
    assert n == n.lower()
    assert "  " not in n


@SETTINGS
@given(st.text(max_size=100))
def test_lucene_sanitize_escapes_every_special(s):
    out = lucene_sanitize(s)
    specials = set('+-&|!(){}[]^"~*?:/' + "ORNTAD")
    i = 0
    while i < len(out):
        ch = out[i]
        if ch == "\\":
            i += 2  # escape pair
            continue
        assert ch not in specials and ch != "\\"
        i += 1


@SETTINGS
@given(texts)
def test_split_paragraphs_no_empty_chunks(s):
    for p in split_paragraphs(s):
        assert p.strip() == p and p != ""


@SETTINGS
@given(words, words)
def test_minhash_estimates_jaccard(a, b):
    ta, tb = " ".join(a), " ".join(b)
    if not tokenize_words(ta) or not tokenize_words(tb):
        return
    est = (doc_minhash(ta) == doc_minhash(tb)).mean()
    true = doc_jaccard(ta, tb)
    assert abs(est - true) <= 0.45  # 64 hashes: loose statistical bound


@SETTINGS
@given(st.text(alphabet=st.sampled_from("abcdef "), min_size=1, max_size=30))
def test_name_minhash_self_identity(name):
    assert jaccard(name, name) == 1.0
    assert (minhash_signature(name) == minhash_signature(name)).all()
    assert char_shingles(name)


@SETTINGS
@given(st.lists(st.text(max_size=50), min_size=1, max_size=8))
def test_embedding_invariants(texts_in):
    v = embed_texts(texts_in)
    assert v.shape == (len(texts_in), 1024)
    assert np.allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)
    # permutation-independent per-row determinism
    v2 = embed_texts(list(reversed(texts_in)))
    assert np.allclose(v[0], v2[-1], atol=1e-7)
