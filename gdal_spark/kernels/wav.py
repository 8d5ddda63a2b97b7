"""RIFF/WAVE PCM codec (pure stdlib/numpy).

Makes the multimodal AUDIO branch real the way kernels/png.py and
kernels/jpeg.py did for images: the sandbox has no soundfile/libsndfile
(probed every round), but canonical WAV is a 44-byte RIFF header +
little-endian PCM frames — fully implementable from the public format.

Scope: PCM integer formats (8-bit unsigned, 16-bit signed), any
channel count / sample rate; `read` walks RIFF chunks generically
(skips LIST/fact/odd-padded chunks) and rejects non-PCM audio like a
codec would.
"""
from __future__ import annotations

import struct

import numpy as np


def write(samples: np.ndarray, *, sample_rate: int = 16000) -> bytes:
    """Encode (n,) mono or (n, ch) PCM. int16 -> 16-bit, uint8 ->
    8-bit."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    assert a.ndim == 2
    if a.dtype == np.int16:
        bits = 16
    elif a.dtype == np.uint8:
        bits = 8
    else:
        raise ValueError(f"unsupported PCM dtype {a.dtype}")
    ch = a.shape[1]
    data = a.astype("<i2" if bits == 16 else "u1").tobytes()
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * block, block, bits)
    pad = b"\x00" if len(data) & 1 else b""   # RIFF chunks word-align
    out = b"RIFF" \
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data) + len(pad)) \
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data + pad
    return out


def read(buf: bytes):
    """Decode -> (samples (n, ch) int16/uint8, sample_rate)."""
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE", "not a WAV"
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(buf):
        cid = buf[i:i + 4]
        ln = struct.unpack("<I", buf[i + 4:i + 8])[0]
        body = buf[i + 8:i + 8 + ln]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        i += 8 + ln + (ln & 1)          # chunks are word-aligned
    assert fmt is not None and data is not None, "missing fmt/data chunk"
    audio_fmt, ch, rate, _, _, bits = fmt
    if audio_fmt != 1:
        raise NotImplementedError(f"non-PCM WAV (format {audio_fmt})")
    if bits == 16:
        a = np.frombuffer(data, dtype="<i2")
    elif bits == 8:
        a = np.frombuffer(data, dtype="u1")
    else:
        raise NotImplementedError(f"{bits}-bit PCM")
    return a.reshape(-1, ch), rate
