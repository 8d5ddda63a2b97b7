"""Lossless WebP / VP8L codec (kernels/webp.py): container structure,
byte-exact round-trips, prefix-code serialization, LZ77 value coding,
the WebP tile-sink artifacts, and the image_features magic dispatch."""
from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from gdal_spark.kernels import webp as W
from gdal_spark.kernels.webp import (_BitReader, _BitWriter,
                                     _canonical_codes, _huffman_lengths,
                                     _prefix_of, _read_prefix_code,
                                     _value_of, _write_prefix_code)


def _rgba(img):
    if img.shape[2] == 4:
        return img
    H, Wd = img.shape[:2]
    return np.concatenate(
        [img, np.full((H, Wd, 1), 255, np.uint8)], axis=2)


def test_container_structure():
    img = np.full((7, 9, 4), 42, dtype=np.uint8)
    buf = W.encode(img)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WEBP"
    assert struct.unpack("<I", buf[4:8])[0] == len(buf) - 8
    assert buf[12:16] == b"VP8L"
    n = struct.unpack("<I", buf[16:20])[0]
    assert len(buf) == 20 + n + (n % 2)
    assert buf[20] == 0x2F                      # VP8L signature
    # 14-bit width-1 / height-1, LSB-first after the signature byte
    bits = int.from_bytes(buf[21:25], "little")
    assert (bits & 0x3FFF) == 9 - 1
    assert ((bits >> 14) & 0x3FFF) == 7 - 1


def test_roundtrip_noise_various_shapes():
    rng = np.random.default_rng(7)
    for shape in [(1, 1, 4), (3, 5, 3), (16, 16, 4), (64, 64, 3),
                  (17, 31, 4), (1, 40, 3), (40, 1, 4)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = W.decode(W.encode(img))
        assert np.array_equal(out, _rgba(img)), shape


def test_roundtrip_structured_tiles():
    # flat (one giant dist-1 run), stripes (dist=width runs), gradient
    flat = np.full((256, 256, 4), 37, dtype=np.uint8)
    stripes = np.zeros((64, 64, 4), dtype=np.uint8)
    stripes[::2] = 200
    stripes[:, :, 3] = 255
    gx = np.tile(np.arange(64, dtype=np.uint8), (64, 1))
    grad = np.stack([gx, gx.T, gx // 2,
                     np.full((64, 64), 255, np.uint8)], axis=2)
    for img in (flat, stripes, grad):
        buf = W.encode(img)
        assert np.array_equal(W.decode(buf), _rgba(img))
    # lossless + LZ77: a flat 256x256 RGBA tile is a few dozen bytes
    assert len(W.encode(flat)) < 200


def test_alpha_exactness_and_hint():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(16, 16, 4), dtype=np.uint8)
    img[:, :, 3] = rng.integers(0, 255, size=(16, 16), dtype=np.uint8)
    buf = W.encode(img)
    assert np.array_equal(W.decode(buf)[:, :, 3], img[:, :, 3])
    # alpha-used hint bit: bit 28 after the signature byte
    bits = int.from_bytes(buf[21:26], "little")
    assert (bits >> 28) & 1 == 1
    opaque = img.copy()
    opaque[:, :, 3] = 255
    bits = int.from_bytes(W.encode(opaque)[21:26], "little")
    assert (bits >> 28) & 1 == 0


def test_lz77_prefix_value_inverse():
    # every length 1..4096 and plain distance value round-trips
    for v in list(range(1, 4097)) + [120 + 65536]:
        code, extra_bits, extra = _prefix_of(v)
        assert 0 <= extra < (1 << extra_bits) or extra_bits == 0
        w = _BitWriter()
        w.put(extra, extra_bits)
        assert _value_of(code, _BitReader(w.flush())) == v
    assert _prefix_of(4096)[0] < 24          # fits the length alphabet
    assert _prefix_of(120 + 65536)[0] < 40   # fits the distance alphabet


def test_prefix_code_serialization_fuzz():
    rng = np.random.default_rng(0)
    for _ in range(60):
        alpha = int(rng.choice([40, 256, 280]))
        freq = np.zeros(alpha, dtype=np.int64)
        k = int(rng.integers(3, min(64, alpha)))
        idx = rng.choice(alpha, size=k, replace=False)
        freq[idx] = rng.integers(1, 10_000, size=k)
        lengths = _huffman_lengths(freq, 15)
        assert lengths.max() <= 15
        # complete code: Kraft sum exactly 1
        assert sum(2.0 ** -l for l in lengths[lengths > 0]) == 1.0
        w = _BitWriter()
        _write_prefix_code(w, lengths)
        dec = _read_prefix_code(_BitReader(w.flush()), alpha)
        for sym, (code, ln) in _canonical_codes(lengths).items():
            w2 = _BitWriter()
            w2.put_code(code, ln)
            assert dec.read(_BitReader(w2.flush())) == sym


def test_huffman_length_limit_geometric_histograms():
    # geometric frequencies force deep trees; the flatten-and-rebuild
    # loop must clamp to the spec limits while keeping Kraft == 1
    for n_sym, alpha, limit in ((20, 280, 15), (40, 280, 15),
                                (64, 280, 15), (16, 19, 7)):
        freq = np.zeros(alpha, dtype=np.int64)
        for i in range(n_sym):
            freq[i] = 1 << min(i, 50)
        lengths = _huffman_lengths(freq, limit)
        assert lengths.max() <= limit
        assert sum(2.0 ** -l for l in lengths[lengths > 0]) == 1.0
        w = _BitWriter()
        _write_prefix_code(w, lengths)
        dec = _read_prefix_code(_BitReader(w.flush()), alpha)
        for sym, (code, ln) in _canonical_codes(lengths).items():
            w2 = _BitWriter()
            w2.put_code(code, ln)
            assert dec.read(_BitReader(w2.flush())) == sym


def test_decoder_rejects_unsupported_features():
    with pytest.raises(AssertionError):
        W.decode(b"\x89PNG\r\n\x1a\nnope")
    # craft a header with the transform bit set
    w = _BitWriter()
    w.put(0x2F, 8)
    w.put(0, 14)
    w.put(0, 14)
    w.put(0, 1)
    w.put(0, 3)
    w.put(1, 1)                               # transform present
    payload = w.flush()
    buf = (b"RIFF" + struct.pack("<I", 12 + 8 + len(payload)) + b"WEBP" +
           b"VP8L" + struct.pack("<I", len(payload)) + payload)
    with pytest.raises(NotImplementedError):
        W.decode(buf)


def test_webp_tile_sink(spark, tmp_path):
    import pyspark.sql.functions as F

    from gdal_spark import io as gio
    from gdal_spark.operators import base_tiles as BT

    ts = 16
    px = None
    for b in range(3):
        t = (BT.base_tiles(spark, tz=1, tile_size=ts,
                           src=BT.src_pixels(spark, salt=b + 1,
                                             byte_range=True))
             .withColumn("band", F.lit(b)))
        px = t if px is None else px.unionByName(t)
    alpha = BT.base_tiles(spark, tz=1, tile_size=ts,
                          src=BT.src_alpha(spark)).withColumn("band", F.lit(3))
    px = px.unionByName(alpha)
    out_dir = str(tmp_path / "wtiles")
    man = gio.write_tile_pngs(px, out_dir, tile_size=ts, bands=4,
                              driver="webp")
    rows = man.collect()
    assert rows
    import binascii
    for r in rows:
        assert r["path"].endswith(".webp") and os.path.exists(r["path"])
        buf = open(r["path"], "rb").read()
        assert binascii.crc32(buf) & 0xFFFFFFFF == r["crc32"]
        arr = W.decode(buf)
        assert arr.shape == (ts, ts, 4)       # alpha preserved, unlike JPEG
    man.unpersist()


def test_image_features_decodes_webp_payloads(spark):
    import pandas as pd

    from gdal_spark.operators import multimodal as MM

    rows = []
    for i in range(24):
        yy, xx = np.mgrid[0:24, 0:32]
        img = ((xx * (2 + i) + yy * 3) % 256).astype(np.uint8)
        rgba = np.stack([img, img // 2, img // 3,
                         np.full_like(img, 255)], axis=2)
        rows.append((i, W.encode(rgba), int(img.astype(np.int64).sum())))
    pdf = pd.DataFrame(rows, columns=["doc_id", "payload", "true_sum"])
    d = spark.createDataFrame(pdf[["doc_id", "payload"]])
    feat = MM.image_features(d).orderBy("doc_id").toPandas()
    assert (feat["width"] == 32).all() and (feat["height"] == 24).all()
    # lossless: the R-channel stats are exact
    assert (feat["px_sum"].to_numpy() == pdf["true_sum"].to_numpy()).all()
