"""Minimal pure-numpy YUV4MPEG2 (.y4m) video codec.

Y4M is the canonical uncompressed video interchange container (mjpegtools
/ ffmpeg `-f yuv4mpeg`): an ASCII stream header

    YUV4MPEG2 W<width> H<height> F<num>:<den> Ip A1:1 C420jpeg\\n

followed by frames, each `FRAME\\n` + planar YUV420 (full-res Y plane,
half-res U and V planes). This module implements a real demuxer and
muxer for that format — 8-bit C420 — plus the BT.601 integer RGB<->YUV
conversion, so operators/multimodal.py performs REAL container demux +
frame decode end-to-end in this sandbox (no ffmpeg/pyav installed). In
production the batch function swaps this for pyav; every Spark plan
stays identical — the contract is bytes in, (frames, fps) out.
"""

from __future__ import annotations

import numpy as np


def _rgb_to_yuv420(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(H, W, 3) uint8 -> full-range BT.601 Y, and 2x2-mean-subsampled U, V
    (all uint8). H and W must be even (Y4M C420 requirement)."""
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    sub = lambda p: (  # noqa: E731 — 2x2 box mean
        p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))
    )
    clip = lambda p: np.clip(np.round(p), 0, 255).astype(np.uint8)  # noqa: E731
    return clip(y), clip(sub(u)), clip(sub(v))


def _yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Nearest-neighbor chroma upsample + BT.601 full-range inverse."""
    uf = u.repeat(2, axis=0).repeat(2, axis=1).astype(np.float64) - 128.0
    vf = v.repeat(2, axis=0).repeat(2, axis=1).astype(np.float64) - 128.0
    yf = y.astype(np.float64)
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    b = yf + 1.772 * uf
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def y4m_encode(frames: list[np.ndarray], fps: tuple[int, int] = (25, 1)) -> bytes:
    """RGB frames (all (H, W, 3) uint8, even H/W) -> .y4m bytes."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    if h % 2 or w % 2:
        raise ValueError("C420 needs even dimensions")
    out = [f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C420jpeg\n".encode()]
    for fr in frames:
        if fr.shape[:2] != (h, w):
            raise ValueError("all frames must share dimensions")
        y, u, v = _rgb_to_yuv420(fr)
        out.append(b"FRAME\n" + y.tobytes() + u.tobytes() + v.tobytes())
    return b"".join(out)


def y4m_decode(data: bytes) -> tuple[list[np.ndarray], tuple[int, int]]:
    """.y4m bytes -> (RGB frames list[(H, W, 3) uint8], (fps_num, fps_den)).

    Parses the stream-header parameter list per the yuv4mpeg spec; only
    8-bit C420 variants are supported (C420 / C420jpeg / C420mpeg2 —
    siting differences don't matter at nearest-neighbor upsampling).
    """
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps = (25, 1)
    for param in data[9:nl].split():
        key, val = chr(param[0]), param[1:].decode()
        if key == "W":
            w = int(val)
        elif key == "H":
            h = int(val)
        elif key == "F":
            num, den = val.split(":")
            fps = (int(num), int(den))
        elif key == "C" and not val.startswith("420"):
            raise ValueError(f"unsupported chroma mode C{val}")
    if not w or not h:
        raise ValueError("missing W/H in stream header")
    ysz, csz = w * h, (w // 2) * (h // 2)
    frame_bytes = ysz + 2 * csz
    frames: list[np.ndarray] = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or data[pos : pos + 5] != b"FRAME":
            raise ValueError("corrupt frame header")
        start = fnl + 1
        raw = data[start : start + frame_bytes]
        if len(raw) < frame_bytes:
            raise ValueError("truncated frame payload")
        y = np.frombuffer(raw[:ysz], np.uint8).reshape(h, w)
        u = np.frombuffer(raw[ysz : ysz + csz], np.uint8).reshape(h // 2, w // 2)
        v = np.frombuffer(raw[ysz + csz :], np.uint8).reshape(h // 2, w // 2)
        frames.append(_yuv420_to_rgb(y, u, v))
        pos = start + frame_bytes
    return frames, fps
