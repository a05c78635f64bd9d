"""Text primitives: cleaning (byte-identical to the reference's input
cleaner), paragraph chunking, sentence splitting, tokenization and entity
name normalization.

All functions here are pure and operate on plain Python/pandas values so
they can be used identically inside Arrow-batched Spark UDFs and inside the
single-process golden oracle (pytest). No per-row Python UDFs are ever
registered — callers wrap these in `mapInPandas` / `pandas_udf`.

Reference parity:
- clean_text mirrors LLMClient._clean_input
  (/root/reference/graphiti_core/llm_client/client.py:63-83): utf-8
  ignore-roundtrip, zero-width char removal, control chars stripped except
  \n \r \t.
- lucene_sanitize mirrors /root/reference/graphiti_core/helpers.py:39-73.
- chunking mirrors the examples' paragraph/chapter splits
  (/root/reference/examples/wizard_of_oz/parser.py:10-27).
"""

from __future__ import annotations

import re

ZERO_WIDTH = "\u200b\u200c\u200d\ufeff\u2060"
_ZW_TABLE = {ord(c): None for c in ZERO_WIDTH}

_WS_TOKEN_RE = re.compile(r"\S+")
# BPE-ish pre-tokenizer: letter runs, digit runs, single other non-space
BPE_TOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
WORD_RE = re.compile(r"[a-z0-9]+")

HONORIFICS = ("professor ", "dr. ", "dr ", "mr. ", "ms. ", "mrs. ")
ORG_SUFFIXES = ("inc", "llc", "ltd")

_SENT_SPLIT_RE = re.compile(r"(?<=\.)\s+")


def clean_text(s: str) -> str:
    """Reference-parity cleaner (client.py:63-83). Must stay byte-identical
    per url — this is the north-rule per-row invariant."""
    if s is None:
        return ""
    cleaned = s.encode("utf-8", errors="ignore").decode("utf-8")
    cleaned = cleaned.translate(_ZW_TABLE)
    return "".join(ch for ch in cleaned if ord(ch) >= 32 or ch in "\n\r\t")


_TAG_RE = re.compile(r"<[^>]+>")


def html_to_text(html: bytes | str) -> str:
    """Minimal html -> text used only when a page has no text column.
    <p>/<br> boundaries become paragraph breaks; all other tags dropped."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="ignore")
    html = re.sub(r"(?i)</p\s*>|<br\s*/?>", "\n\n", html)
    text = _TAG_RE.sub("", html)
    text = re.sub(r"\n{3,}", "\n\n", text)
    return text.strip()


def split_paragraphs(text: str) -> list[str]:
    """Chunking rule: one chunk per blank-line-separated paragraph
    (wizard_of_oz/parser.py:10-27 chapter/paragraph split analogue)."""
    return [p for p in (q.strip() for q in text.split("\n\n")) if p]


def split_sentences(paragraph: str) -> list[str]:
    return [s for s in _SENT_SPLIT_RE.split(paragraph) if s]


def tokenize_ws(text: str) -> list[str]:
    return _WS_TOKEN_RE.findall(text)


def tokenize_words(text: str) -> list[str]:
    """Lowercase alnum word tokens — the analyzer for BM25/dedup/fingerprint.
    Must match the SQL oracle: regexp over lower(text)."""
    return WORD_RE.findall(text.lower())


def normalize_entity_name(name: str) -> str:
    """Normalization key for entity resolution (X5): lowercase, strip
    honorific prefixes and corporate suffix tokens, collapse whitespace.
    'Professor Alice Johnson' -> 'alice johnson'; 'Acme Corp Inc' ->
    'acme corp'."""
    n = " ".join(name.lower().split())
    for h in HONORIFICS:
        if n.startswith(h):
            n = n[len(h):]
            break
    parts = n.split(" ")
    while len(parts) > 1 and parts[-1] in ORG_SUFFIXES:
        parts = parts[:-1]
    return " ".join(parts)


def strip_honorific(span: str) -> str:
    """Drop a leading honorific from an extracted display span, keeping the
    rest verbatim (display names keep ' Inc' etc.)."""
    low = span.lower()
    for h in HONORIFICS:
        if low.startswith(h):
            return span[len(h):]
    return span


_LUCENE_ESCAPE = str.maketrans(
    {c: "\\" + c for c in '+-&|!(){}[]^"~*?:\\/'}
    | {c: "\\" + c for c in "ORNTAD"}
)


def lucene_sanitize(query: str) -> str:
    """Parity with helpers.py:39-73 (including its quirk of escaping the
    uppercase boolean-operator letters O R N T A D)."""
    return query.translate(_LUCENE_ESCAPE)
