"""Deterministic hashing embedder (U1/U2) — the engine's stand-in for
graphiti's network embedder clients.

Reference surface mirrored: EmbedderClient.create with fixed
EMBEDDING_DIM = 1024 (/root/reference/graphiti_core/embedder/client.py:22-34)
and the newline-flattening call sites node.generate_name_embedding /
edge.generate_embedding (/root/reference/graphiti_core/nodes.py:262-269,
edges.py:199-208).

Design: feature-hashed char 3-gram counts -> signed hashing trick ->
L2 normalization. Pure numpy, no network, stable across runs and
processes; batched via Arrow (mapInPandas / pandas_udf), never per-row.
Two strings with shared character n-grams get high cosine — which is the
property entity resolution and similarity search rely on.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

EMBEDDING_DIM = 1024  # embedder/client.py:22


def _ngrams(s: str, n: int = 3) -> list[str]:
    s = "^" + s.replace("\n", " ") + "$"
    if len(s) <= n:
        return [s]
    return [s[i : i + n] for i in range(len(s) - n + 1)]


def embed_texts(texts, dim: int = EMBEDDING_DIM) -> np.ndarray:
    """Vectorized over a sequence of strings -> (n, dim) float32,
    L2-normalized rows. Deterministic: crc32 feature hashing, sign from
    the next hash bit."""
    out = np.zeros((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        if not t:
            out[i, 0] = 1.0
            continue
        for g in _ngrams(t.lower()):
            h = zlib.crc32(g.encode("utf-8"))
            idx = h % dim
            sign = 1.0 if (h >> 16) & 1 else -1.0
            out[i, idx] += sign
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return (out / norms).astype(np.float32)


def embed_series(s: pd.Series, dim: int = EMBEDDING_DIM) -> pd.Series:
    vecs = embed_texts(s.fillna("").tolist(), dim)
    return pd.Series(list(vecs), index=s.index)


def with_embedding(df, text_col: str, out_col: str, dim: int = EMBEDDING_DIM):
    """Adds an ArrayType(Float) embedding column via mapInPandas (Arrow
    batches; one numpy pass per batch)."""
    from pyspark.sql import types as T

    # fresh StructType — StructType.add mutates in place, which would
    # corrupt the source DataFrame's cached schema
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = embed_series(pdf[text_col], dim)
            yield pdf

    return df.mapInPandas(gen, schema=schema)
