"""Minimal pure-numpy WAV (RIFF/PCM) codec — stdlib struct only.

Covers the subset crawl-scale audio plumbing needs: canonical RIFF/WAVE
container, `fmt ` + `data` chunks, PCM 16-bit signed and 8-bit unsigned,
any channel count / sample rate, unknown chunks skipped per the RIFF
spec (chunks are (tag, size, payload) with word alignment).

This makes the audio modality REAL end-to-end in the sandbox (no codec
libraries installed): operators/multimodal.py decodes actual PCM samples
and computes features on them. In production the batch function swaps
this for soundfile/ffmpeg without touching any Spark plan — the contract
is bytes in, (samples[n, ch] float32 in [-1, 1], rate) out.
"""

from __future__ import annotations

import struct

import numpy as np


def wav_encode(samples: np.ndarray, rate: int) -> bytes:
    """(n,) or (n, ch) int16 / float in [-1, 1] -> 16-bit PCM WAV bytes."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.dtype != np.int16:
        arr = np.clip(np.round(np.asarray(arr, dtype=np.float64) * 32767.0),
                      -32768, 32767).astype(np.int16)
    n, ch = arr.shape
    data = arr.astype("<i2").tobytes()
    byte_rate = rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, byte_rate, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 samples[n, ch] in [-1, 1], sample_rate).

    Walks RIFF chunks (word-aligned), accepts PCM (format 1) at 8 or 16
    bits; raises ValueError on anything else — the caller treats that as
    an undecodable payload, exactly like a real decoder would.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    rate = channels = bits = None
    pcm = None
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        payload = data[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            audio_format, channels, rate = struct.unpack("<HHI", payload[:8])
            bits = struct.unpack("<H", payload[14:16])[0]
            if audio_format != 1:
                raise ValueError(f"unsupported WAV format {audio_format}")
        elif tag == b"data":
            pcm = payload
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if pcm is None or rate is None:
        raise ValueError("missing fmt/data chunk")
    if bits == 16:
        arr = np.frombuffer(pcm[: len(pcm) - (len(pcm) % (2 * channels))], "<i2")
        out = arr.astype(np.float32) / 32768.0
    elif bits == 8:
        arr = np.frombuffer(pcm[: len(pcm) - (len(pcm) % channels)], np.uint8)
        out = (arr.astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    return out.reshape(-1, channels), int(rate)
