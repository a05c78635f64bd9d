"""Near-duplicate detection for the documents table at crawl scale:
MinHash + LSH banding and SimHash — the sub-quadratic paths that replace
the exact n-gram Jaccard self-join (docs.ngram_jaccard_pairs) when the
corpus no longer fits a shingle-key shuffle.

Same deterministic MinHash family as entity resolution
(operators/resolve.py) but over word 3-gram shingles of whole documents.
Candidate pairs from band-bucket collisions are verified with exact
Jaccard; SimHash pairs with Hamming distance.

Neither is SQL-expressible in the driver's DuckDB oracle (crc32 hash
family), so these register as rows-only checks; pytest pins the
guarantees that matter: determinism, candidate-recall vs exact Jaccard,
and verification precision.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..functions.text import tokenize_words

N_HASHES = 64
LSH_BANDS = 16          # 16 bands x 4 rows -> ~0.47 jaccard 50% threshold
LSH_ROWS = N_HASHES // LSH_BANDS
_MERSENNE = (1 << 61) - 1
_RNG = np.random.RandomState(7)
_A = _RNG.randint(1, _MERSENNE, size=N_HASHES, dtype=np.int64)
_B = _RNG.randint(0, _MERSENNE, size=N_HASHES, dtype=np.int64)

SIMHASH_BITS = 64


def word_shingles(text: str, n: int = 3) -> set[str]:
    toks = tokenize_words(text)
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _shingle_hashes(text: str) -> np.ndarray:
    import zlib

    return np.array(
        [zlib.crc32(s.encode("utf-8")) for s in word_shingles(text)], dtype=np.int64
    )


def doc_minhash(text: str) -> np.ndarray:
    h = _shingle_hashes(text)
    if len(h) == 0:
        return np.zeros(N_HASHES, dtype=np.int64)
    return ((_A[None, :] * h[:, None] + _B[None, :]) % _MERSENNE).min(axis=0)


def doc_jaccard(a: str, b: str) -> float:
    sa, sb = word_shingles(a), word_shingles(b)
    u = sa | sb
    return len(sa & sb) / len(u) if u else 0.0


def doc_simhash(text: str) -> int:
    """64-bit SimHash over word tokens (crc32 per token + upper bits as a
    second independent 32 bits)."""
    import zlib

    acc = np.zeros(SIMHASH_BITS, dtype=np.int64)
    for t in tokenize_words(text):
        h1 = zlib.crc32(t.encode("utf-8"))
        h2 = zlib.crc32((t + "#").encode("utf-8"))
        h = (h2 << 32) | h1
        for bit in range(SIMHASH_BITS):
            acc[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(SIMHASH_BITS):
        if acc[bit] > 0:
            out |= 1 << bit
    return out - (1 << 63)  # signed 64-bit for Spark LongType


def minhash_bands(docs: DataFrame) -> DataFrame:
    """(doc_id, band, bucket) — LSH banding of the MinHash signature,
    Arrow-batched. At crawl scale this is the partition/shuffle key of the
    dedup job; hot buckets (boilerplate) are capped downstream."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            sigs = np.stack([doc_minhash(t) for t in pdf["text"]])
            frames = []
            for band in range(LSH_BANDS):
                chunk = np.ascontiguousarray(
                    sigs[:, band * LSH_ROWS : (band + 1) * LSH_ROWS]
                )
                bucket = pd.util.hash_array(
                    chunk.view([("", np.int64)] * LSH_ROWS).ravel()
                ).astype(np.int64)
                frames.append(
                    pd.DataFrame(
                        {
                            "doc_id": pdf["doc_id"].to_numpy(),
                            "band": np.int32(band),
                            "bucket": bucket,
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return docs.select("doc_id", "text").mapInPandas(
        gen, schema="doc_id long, band int, bucket long"
    )


def minhash_candidates(docs: DataFrame, max_bucket: int = 1000) -> DataFrame:
    """Candidate near-dup pairs: same (band, bucket); buckets larger than
    max_bucket dropped (boilerplate guard — the quadratic blowup cap)."""
    bands = minhash_bands(docs)
    ok = (
        bands.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") <= max_bucket)
        .select("band", "bucket")
    )
    b = bands.join(ok, ["band", "bucket"])
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_dedup_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Verified near-dup pairs: LSH candidates -> exact Jaccard gate.
    Verification joins the texts back by doc_id (at scale: a skinny
    shuffle join against the candidate list, never all-pairs)."""
    cands = minhash_candidates(docs)
    texts = docs.select("doc_id", "text")
    paired = (
        cands.join(
            texts.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta")),
            "doc_a",
        ).join(
            texts.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb")),
            "doc_b",
        )
    )

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            j = np.array(
                [doc_jaccard(a, b) for a, b in zip(pdf["ta"], pdf["tb"])]
            )
            out = pdf.loc[j >= threshold, ["doc_a", "doc_b"]].copy()
            out["jaccard_u"] = (j[j >= threshold] * 1_000_000).astype(np.int64)
            yield out

    return paired.mapInPandas(
        verify, schema="doc_a long, doc_b long, jaccard_u long"
    )


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "simhash": np.array(
                        [doc_simhash(t) for t in pdf["text"]], dtype=np.int64
                    ),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        gen, schema="doc_id long, simhash long"
    )


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs: block on 4 x 16-bit chunks (any pair within
    Hamming distance 3 must agree on at least one chunk — pigeonhole), then
    verify the full Hamming distance JVM-side (bit_count on xor)."""
    fp = simhash_fingerprints(docs)
    chunks = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", F.col("c.chunk").alias("chunk"), F.col("c.val").alias("val"))
    l, r = chunks.alias("l"), chunks.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.simhash").alias("ha"),
            F.col("r.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cands.withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming"))
    )
