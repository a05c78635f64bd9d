"""Unit tests for the text primitives (reference parity:
graphiti_core/llm_client/client.py:63-83 cleaning,
graphiti_core/helpers.py:39-73 lucene_sanitize,
tests/helpers_test.py:22-34 golden pairs)."""

from __future__ import annotations

from graphiti_spark.functions.text import (
    clean_text,
    html_to_text,
    lucene_sanitize,
    normalize_entity_name,
    split_paragraphs,
    split_sentences,
    strip_honorific,
    tokenize_words,
    tokenize_ws,
)


def test_clean_text_strips_zero_width_and_control():
    assert clean_text("a​b‌‍﻿⁠c") == "abc"
    assert clean_text("a\x00b\x08c\x1fd") == "abcd"
    # keeps \n \r \t
    assert clean_text("a\nb\rc\td") == "a\nb\rc\td"
    assert clean_text(None) == ""
    assert clean_text("plain text.") == "plain text."


def test_clean_text_valid_unicode_passthrough():
    s = "héllo wörld — ünïcode 中文"
    assert clean_text(s) == s


def test_lucene_sanitize_goldens():
    # golden pairs in the spirit of reference tests/helpers_test.py:22-34
    assert lucene_sanitize("hello") == "hello"
    assert lucene_sanitize("NOT ok") == "\\N\\O\\T ok"  # uppercase op letters escaped
    assert lucene_sanitize("a+b") == "a\\+b"
    assert lucene_sanitize('say "hi"') == 'say \\"hi\\"'
    assert lucene_sanitize("x:y") == "x\\:y"
    assert lucene_sanitize("(a)") == "\\(a\\)"


def test_split_paragraphs():
    assert split_paragraphs("a\n\nb\n\n\n\nc") == ["a", "b", "c"]
    assert split_paragraphs("  x  \n\n") == ["x"]


def test_split_sentences():
    assert split_sentences("A works at B. C likes D.") == [
        "A works at B.",
        "C likes D.",
    ]


def test_tokenizers():
    assert tokenize_ws("a  b\tc") == ["a", "b", "c"]
    assert tokenize_words("Hello, World 42!") == ["hello", "world", "42"]


def test_normalize_entity_name():
    assert normalize_entity_name("Professor Alice Johnson") == "alice johnson"
    assert normalize_entity_name("Acme Corp Inc") == "acme corp"
    assert normalize_entity_name("Dr. Bob Hartley") == "bob hartley"
    assert normalize_entity_name("  Mixed   Case  ") == "mixed case"


def test_strip_honorific_keeps_display_suffix():
    assert strip_honorific("Professor Alice Johnson") == "Alice Johnson"
    assert strip_honorific("Acme Corp Inc") == "Acme Corp Inc"


def test_html_to_text():
    assert html_to_text(b"<html><body><p>a</p><p>b</p></body></html>") == "a\n\nb"
