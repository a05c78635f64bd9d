"""Multimodal columns: image/audio/video as opaque BINARY columns with
typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side plumbing — schemas, partitioning, UDF signatures, batch
shapes — is real and tested. The actual media decoding is STUBBED: the
sandbox has no image/audio libraries, so `decode_image_batch` raises
NotImplementedError unless `fake=True`, in which case a deterministic
fake decoder (bytes -> seeded hash -> pixel stats) stands in. Swapping in
PIL/librosa later only changes the inside of the batch function; every
plan stays identical.

At 100 TB: media tables are partitioned by (modality, bucket(content_id));
decode stages are the rare CPU-heavy Python stages where
`spark.sql.execution.arrow.maxRecordsPerBatch` must be tuned DOWN (big
blobs per row) — set ~64 rows per batch for megabyte-scale blobs.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("content_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "content_id string, n_bytes long, mean_r double, mean_g double,"
    " mean_b double, phash long"
)

FRAME_SCHEMA = "content_id string, frame_idx long, frame_payload binary"


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests: payload = seeded bytes."""
    rows = []
    for i in range(n):
        rng = np.random.RandomState(i)
        payload = rng.bytes(256 + (i % 5) * 64)
        modality = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                f"m{i:04d}",
                modality,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[
                    modality
                ],
                64 + i % 16 if modality != "audio" else None,
                48 + i % 16 if modality != "audio" else None,
                (1000 + 37 * i) if modality != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for an image decoder: seed a PRNG from the
    payload's crc32 and emit an 8x8x3 'pixel' array."""
    rng = np.random.RandomState(zlib.crc32(payload) & 0x7FFFFFFF)
    return rng.randint(0, 256, size=(8, 8, 3)).astype(np.uint8)


def decode_image_batch(payloads: pd.Series, fake: bool = False) -> list[np.ndarray]:
    """STUB: real implementation would be PIL.Image.open per payload.
    The Spark-side contract (Series of bytes in, list of HxWx3 arrays
    out) is what downstream feature extraction depends on."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library not present in this "
            "environment; pass fake=True for the deterministic test decoder"
        )
    return [_fake_decode(bytes(p)) for p in payloads]


def image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode -> per-channel means + perceptual-hash-style fingerprint.
    One vectorized pass per Arrow batch; only image rows are shipped to
    Python (filter pushed before the UDF)."""
    imgs = media.where(F.col("modality") == "image").select("content_id", "payload")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            arrs = decode_image_batch(pdf["payload"], fake=fake)
            stack = np.stack(arrs).astype(np.float64)  # (n, 8, 8, 3)
            means = stack.mean(axis=(1, 2))  # (n, 3)
            gray = stack.mean(axis=3)  # (n, 8, 8)
            med = np.median(gray.reshape(len(arrs), -1), axis=1, keepdims=True)
            bits = (gray.reshape(len(arrs), -1) > med).astype(np.uint64)
            phash = np.zeros(len(arrs), dtype=np.uint64)
            for b in range(64):
                phash |= bits[:, b] << np.uint64(b)
            yield pd.DataFrame(
                {
                    "content_id": pdf["content_id"].to_numpy(),
                    "n_bytes": pdf["payload"].map(len).astype(np.int64),
                    "mean_r": means[:, 0],
                    "mean_g": means[:, 1],
                    "mean_b": means[:, 2],
                    "phash": phash.astype(np.int64),
                }
            )

    return imgs.mapInPandas(gen, schema=IMAGE_FEATURES_SCHEMA)


def resize_images(media: DataFrame, w: int, h: int, fake: bool = True) -> DataFrame:
    """Decode -> resize (stub: nearest-neighbor index sampling on the fake
    pixels) -> re-encode (stub: raw bytes). Keeps the binary-in/binary-out
    shape of a production resize stage."""
    imgs = media.where(F.col("modality") == "image").select("content_id", "payload")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for p in decode_image_batch(pdf["payload"], fake=fake):
                yi = (np.arange(h) * p.shape[0] // h).clip(0, p.shape[0] - 1)
                xi = (np.arange(w) * p.shape[1] // w).clip(0, p.shape[1] - 1)
                out.append(p[np.ix_(yi, xi)].tobytes())
            yield pd.DataFrame(
                {
                    "content_id": pdf["content_id"].to_numpy(),
                    "payload": out,
                    "width": np.int32(w),
                    "height": np.int32(h),
                }
            )

    return imgs.mapInPandas(
        gen,
        schema="content_id string, payload binary, width int, height int",
    )


def sample_frames(media: DataFrame, every_ms: int = 500, fake: bool = True) -> DataFrame:
    """Video frame sampling stub: one 'frame' per every_ms of duration,
    derived deterministically from the payload (a real impl would seek
    with pyav/ffmpeg). Output explodes one row per sampled frame — the
    UDTF-like batch shape a real sampler needs."""
    vids = media.where(F.col("modality") == "video").select(
        "content_id", "payload", "duration_ms"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, idxs, frames = [], [], []
            for cid, p, dur in zip(
                pdf["content_id"], pdf["payload"], pdf["duration_ms"]
            ):
                n = max(1, int(dur or 0) // every_ms)
                for k in range(n):
                    ids.append(cid)
                    idxs.append(k)
                    frames.append(
                        _fake_decode(bytes(p) + k.to_bytes(4, "little")).tobytes()
                        if fake
                        else b""
                    )
            yield pd.DataFrame(
                {"content_id": ids, "frame_idx": np.array(idxs, dtype=np.int64),
                 "frame_payload": frames}
            )

    return vids.mapInPandas(gen, schema=FRAME_SCHEMA)
