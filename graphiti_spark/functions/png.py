"""Minimal pure-Python/numpy PNG codec (zlib from the stdlib only).

Supports the subset that covers crawl-scale image plumbing tests and the
engine's own re-encode path: 8-bit-per-sample, color types 2 (RGB) and
6 (RGBA), non-interlaced, all five scanline filter types (None / Sub /
Up / Average / Paeth) on decode; encode always emits filter 0 rows.

This exists so the multimodal operators (operators/multimodal.py) run a
REAL decoder end-to-end in the sandbox (no imaging libraries are
installed). In production the batch functions swap this for PIL/turbo-
jpeg without touching any Spark plan — the contract is bytes in,
HxWxC uint8 arrays out.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {2: 3, 6: 4}  # colortype -> samples per pixel


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """(H, W, 3|4) uint8 -> PNG bytes (filter 0, one IDAT)."""
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError("expected (H, W, 3|4) array")
    h, w, c = arr.shape
    colortype = 2 if c == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    raw = np.zeros((h, 1 + w * c), dtype=np.uint8)
    raw[:, 1:] = np.ascontiguousarray(arr, dtype=np.uint8).reshape(h, w * c)
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, 3|4) uint8. Raises ValueError on anything
    outside the supported subset (8-bit RGB/RGBA, non-interlaced)."""
    if not data.startswith(_SIGNATURE):
        raise ValueError("not a PNG (bad signature)")
    pos = len(_SIGNATURE)
    width = height = colortype = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, colortype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or colortype not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG (bitdepth={depth}, colortype={colortype})"
                )
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    c = _CHANNELS[colortype]
    stride = width * c
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if len(raw) != height * (1 + stride):
        raise ValueError("truncated IDAT")
    raw = raw.reshape(height, 1 + stride)
    filters = raw[:, 0]
    rows = raw[:, 1:].copy()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = int(filters[y])
        row = rows[y]
        if f == 0:
            pass
        elif f == 1:  # Sub — sequential along x, vectorized over channels
            for x in range(c, stride):
                row[x] = (int(row[x]) + int(row[x - c])) & 0xFF
        elif f == 2:  # Up
            rows[y] = row = (row.astype(np.int16) + prev).astype(np.uint8)
        elif f == 3:  # Average
            for x in range(stride):
                left = int(row[x - c]) if x >= c else 0
                row[x] = (int(row[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif f == 4:  # Paeth
            left = np.zeros(c, dtype=np.uint8)
            upleft = np.zeros(c, dtype=np.uint8)
            for x0 in range(0, stride, c):
                pred = _paeth(left, prev[x0 : x0 + c], upleft)
                row[x0 : x0 + c] = (
                    row[x0 : x0 + c].astype(np.int16) + pred
                ).astype(np.uint8)
                upleft = prev[x0 : x0 + c]
                left = row[x0 : x0 + c]
        else:
            raise ValueError(f"unknown filter type {f}")
        prev = rows[y]
    return rows.reshape(height, width, c)
