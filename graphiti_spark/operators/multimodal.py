"""Multimodal columns: image/audio/video as opaque BINARY columns with
typed metadata, processed via Arrow-batched mapInPandas.

The image path is REAL end-to-end: payloads are PNG bytes, decoded by the
pure-Python/numpy codec in functions/png.py (8-bit RGB/RGBA, all filter
types), features/resize operate on actual pixels, and the resize stage
re-encodes real PNGs. Swapping the codec for PIL/libjpeg-turbo in
production only changes the inside of the batch function — every Spark
plan stays identical.

Audio decode and video CONTAINER demuxing remain stubbed (no codec
libraries exist in this sandbox): `sample_frames` synthesizes
deterministic frames (clearly marked) while keeping the UDTF-like
explode shape a real pyav/ffmpeg sampler needs.

At 100 TB: media tables are partitioned by (modality, bucket(content_id));
decode stages are the rare CPU-heavy Python stages where
`spark.sql.execution.arrow.maxRecordsPerBatch` must be tuned DOWN (big
blobs per row) — set ~64 rows per batch for megabyte-scale blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..functions.png import png_decode, png_encode

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
    "content_id string, n_bytes long, width int, height int, mean_r double,"
    " mean_g double, mean_b double, phash long"
)

FRAME_SCHEMA = "content_id string, frame_idx long, frame_payload binary"


def _synth_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic RGB test image: a seeded gradient + noise pattern."""
    rng = np.random.RandomState(i)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            ((xx + yy) * 255 // max(w + h - 2, 1)),
        ],
        axis=2,
    )
    noise = rng.randint(0, 32, size=(h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic media table for tests: image payloads are REAL PNGs
    (encoded by functions/png.py); audio/video payloads are opaque seeded
    bytes (their decoders are the stubbed modalities)."""
    rows = []
    for i in range(n):
        rng = np.random.RandomState(i)
        modality = ["image", "audio", "video"][i % 3]
        w = 64 + i % 16 if modality != "audio" else None
        h = 48 + i % 16 if modality != "audio" else None
        if modality == "image":
            payload = png_encode(_synth_pixels(i, w, h))
        else:
            payload = rng.bytes(256 + (i % 5) * 64)
        rows.append(
            (
                f"m{i:04d}",
                modality,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[
                    modality
                ],
                w,
                h,
                (1000 + 37 * i) if modality != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image_batch(payloads: pd.Series) -> list[np.ndarray]:
    """bytes -> HxWxC uint8 pixel arrays (real PNG decode). This is the
    swap point for PIL/turbojpeg in production — same contract."""
    return [png_decode(bytes(p)) for p in payloads]


def _phash(arr: np.ndarray) -> np.int64:
    """64-bit average-hash: grayscale -> 8x8 index sample -> median
    threshold."""
    gray = arr[:, :, :3].mean(axis=2)
    h, w = gray.shape
    yi = (np.arange(8) * h // 8).clip(0, h - 1)
    xi = (np.arange(8) * w // 8).clip(0, w - 1)
    small = gray[np.ix_(yi, xi)].ravel()
    bits = small > np.median(small)
    v = 0
    for b in range(63):
        if bits[b]:
            v |= 1 << b
    return np.int64(v - ((1 << 63) if bits[63] else 0))


def image_features(media: DataFrame) -> DataFrame:
    """Decode -> dimensions + per-channel means + perceptual-hash
    fingerprint. Only image rows are shipped to Python (filter pushed
    before the UDF); one decode per row, numpy per batch."""
    imgs = media.where(F.col("modality") == "image").select("content_id", "payload")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            arrs = decode_image_batch(pdf["payload"])
            means = np.stack([a[:, :, :3].mean(axis=(0, 1)) for a in arrs])
            yield pd.DataFrame(
                {
                    "content_id": pdf["content_id"].to_numpy(),
                    "n_bytes": pdf["payload"].map(len).astype(np.int64),
                    "width": np.array([a.shape[1] for a in arrs], dtype=np.int32),
                    "height": np.array([a.shape[0] for a in arrs], dtype=np.int32),
                    "mean_r": means[:, 0],
                    "mean_g": means[:, 1],
                    "mean_b": means[:, 2],
                    "phash": np.array([_phash(a) for a in arrs], dtype=np.int64),
                }
            )

    return imgs.mapInPandas(gen, schema=IMAGE_FEATURES_SCHEMA)


def resize_images(media: DataFrame, w: int, h: int) -> DataFrame:
    """Decode -> nearest-neighbor resize on real pixels -> re-encode as
    PNG. Binary-in/binary-out, the production resize-stage shape."""
    imgs = media.where(F.col("modality") == "image").select("content_id", "payload")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for p in decode_image_batch(pdf["payload"]):
                yi = (np.arange(h) * p.shape[0] // h).clip(0, p.shape[0] - 1)
                xi = (np.arange(w) * p.shape[1] // w).clip(0, p.shape[1] - 1)
                out.append(png_encode(p[np.ix_(yi, xi)]))
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


def sample_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame sampling — CONTAINER DEMUX STUBBED (no pyav/ffmpeg in
    this sandbox): one deterministic synthesized frame (a real PNG) per
    every_ms of declared duration, seeded from the payload. Output
    explodes one row per sampled frame — the UDTF-like batch shape a real
    sampler needs; swapping in pyav only changes the frame source."""
    vids = media.where(F.col("modality") == "video").select(
        "content_id", "payload", "duration_ms"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, idxs, frames = [], [], []
            for cid, p, dur in zip(
                pdf["content_id"], pdf["payload"], pdf["duration_ms"]
            ):
                n = max(1, int(dur or 0) // every_ms)
                for k in range(n):
                    seed = zlib.crc32(bytes(p) + k.to_bytes(4, "little")) & 0x7FFFFFFF
                    ids.append(cid)
                    idxs.append(k)
                    frames.append(png_encode(_synth_pixels(seed % 10_000, 8, 8)))
            yield pd.DataFrame(
                {"content_id": ids, "frame_idx": np.array(idxs, dtype=np.int64),
                 "frame_payload": frames}
            )

    return vids.mapInPandas(gen, schema=FRAME_SCHEMA)
