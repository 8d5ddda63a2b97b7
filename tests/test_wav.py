"""RIFF/WAVE PCM codec (kernels/wav.py) + the real audio branch of the
multimodal surface."""
from __future__ import annotations

import struct

import numpy as np
import pytest

from gdal_spark.kernels import wav as W


def test_roundtrip_16bit_mono_and_8bit_stereo():
    x = (np.arange(-500, 500, dtype=np.int16) * 13).astype(np.int16)
    a, r = W.read(W.write(x, sample_rate=22050))
    assert r == 22050 and a.shape == (1000, 1) and (a[:, 0] == x).all()
    s = np.stack([np.arange(256, dtype=np.uint8),
                  np.arange(256, dtype=np.uint8)[::-1]], 1)
    a2, r2 = W.read(W.write(s, sample_rate=8000))
    assert (a2 == s).all() and r2 == 8000


def test_reader_skips_extra_chunks():
    # RIFF allows LIST/fact chunks between fmt and data — walk, don't
    # assume the 44-byte canonical layout
    x = np.array([1, -2, 3], dtype=np.int16)
    buf = W.write(x, sample_rate=16000)
    fmt_at = buf.index(b"fmt ")
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd+pad
    patched = buf[:fmt_at] + extra + buf[fmt_at:]
    patched = patched[:4] + struct.pack(
        "<I", len(patched) - 8) + patched[8:]
    a, r = W.read(patched)
    assert (a[:, 0] == x).all() and r == 16000


def test_reader_rejects_non_pcm_and_garbage():
    x = np.array([0, 1], dtype=np.int16)
    buf = bytearray(W.write(x))
    fmt_off = bytes(buf).index(b"fmt ") + 8
    buf[fmt_off:fmt_off + 2] = struct.pack("<H", 3)   # IEEE float fmt
    with pytest.raises(NotImplementedError):
        W.read(bytes(buf))
    with pytest.raises(AssertionError):
        W.read(b"\x89PNG\r\n\x1a\n garbage")


def test_audio_features_matches_pcm_rule(spark):
    import pandas as pd

    from gdal_spark.operators import multimodal as MM

    ids = np.arange(0, 300, 7)
    d = spark.createDataFrame(pd.DataFrame({"doc_id": ids}))
    feat = MM.audio_features(MM.attach_wav_media(d)).orderBy("doc_id") \
        .toPandas()
    for _, r in feat.iterrows():
        i = int(r["doc_id"])
        x = ((i * 17 + 13 * np.arange(MM.WAV_N, dtype=np.int64)) % 65536) \
            - 32768
        assert r["n_samples"] == MM.WAV_N
        assert r["sample_rate"] == MM.WAV_RATE
        assert r["s_sum"] == x.sum()
        assert r["s_min"] == x.min() and r["s_max"] == x.max()
        sign = x >= 0
        assert r["zero_cross"] == (sign[1:] != sign[:-1]).sum()
