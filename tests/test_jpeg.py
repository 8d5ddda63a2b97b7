"""Baseline JPEG codec (kernels/jpeg.py) — T.81 sequential DCT, JFIF:
structure, round-trip distortion bounds, rate/quality monotonicity,
and the JPEG tile-sink artifacts."""
from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.kernels import jpeg as J


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def test_gray_roundtrip_smooth():
    x = np.arange(64)
    g = ((x[None, :] * 2 + x[:, None] * 3) % 256).astype(np.uint8)
    buf = J.encode(g, quality=90)
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    assert buf[6:10] == b"JFIF"
    back = J.decode(buf)
    assert back.shape == g.shape and back.dtype == np.uint8
    assert _psnr(g, back) > 40.0


def test_rgb_roundtrip_and_nonmultiple_of_8_dims():
    yy, xx = np.mgrid[0:45, 0:77]   # deliberately not /8
    rgb = np.stack([(xx * 3) % 256, (yy * 5) % 256,
                    ((xx + yy) * 2) % 256], axis=2).astype(np.uint8)
    back = J.decode(J.encode(rgb, quality=85))
    assert back.shape == rgb.shape
    assert _psnr(rgb, back) > 38.0


def test_quality_controls_rate_and_distortion():
    yy, xx = np.mgrid[0:48, 0:48]
    img = np.stack([(xx * 5) % 256] * 3, axis=2).astype(np.uint8)
    lo, hi = J.encode(img, quality=25), J.encode(img, quality=95)
    assert len(lo) < len(hi)
    assert _psnr(img, J.decode(lo)) < _psnr(img, J.decode(hi))


def test_flat_block_is_tiny_and_exact():
    img = np.full((16, 16), 130, dtype=np.uint8)
    buf = J.encode(img, quality=85)
    assert (J.decode(buf) == img).all()   # DC-only, quantizes exactly


def test_decoder_rejects_non_jpeg():
    with pytest.raises(AssertionError):
        J.decode(b"\x89PNG\r\n\x1a\nnope")


def test_jpeg_tile_sink(spark, tmp_path):
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
    out_dir = str(tmp_path / "jtiles")
    man = gio.write_tile_pngs(px, out_dir, tile_size=ts, bands=4,
                              driver="jpeg", jpeg_quality=90)
    rows = man.collect()
    assert rows
    for r in rows:
        assert r["path"].endswith(".jpg") and os.path.exists(r["path"])
        arr = J.decode(open(r["path"], "rb").read())
        assert arr.shape == (ts, ts, 3)   # alpha dropped, like gdal2tiles
    man.unpersist()


def test_image_features_decodes_jpeg_payloads(spark):
    # multi-codec multimodal branch: JPEG payloads sniffed by magic,
    # decoded with the in-repo codec; stats approximate the source
    # within lossy error
    import pandas as pd

    from gdal_spark.operators import multimodal as MM

    rows = []
    for i in range(24):
        yy, xx = np.mgrid[0:24, 0:32]
        img = ((xx * (2 + i) + yy * 3) % 256).astype(np.uint8)
        rows.append((i, J.encode(img, quality=90), int(img.sum())))
    pdf = pd.DataFrame(rows, columns=["doc_id", "payload", "true_sum"])
    d = spark.createDataFrame(pdf[["doc_id", "payload"]])
    feat = MM.image_features(d).orderBy("doc_id").toPandas()
    assert (feat["width"] == 32).all() and (feat["height"] == 24).all()
    rel = np.abs(feat["px_sum"].to_numpy() - pdf["true_sum"].to_numpy()) \
        / pdf["true_sum"].to_numpy()
    assert rel.max() < 0.02


def test_avi_mjpeg_roundtrip_and_video_frame_sample(spark):
    import pandas as pd

    from gdal_spark.kernels import avi as A
    from gdal_spark.operators import multimodal as MM

    # container roundtrip + frame decode fidelity
    frames, imgs = [], []
    for f in range(4):
        img = ((f * 37 + np.arange(256, dtype=np.int64)) % 256) \
            .astype(np.uint8).reshape(16, 16)
        imgs.append(img)
        frames.append(J.encode(img, quality=92))
    buf = A.write_mjpeg(frames, width=16, height=16)
    w, h, back = A.read_frames(buf)
    assert (w, h, len(back)) == (16, 16, 4)
    assert all(a == b for a, b in zip(frames, back))
    assert _psnr(imgs[0], J.decode(back[0])) > 35.0
    # non-MJPG stream rejected
    bad = buf.replace(b"MJPG", b"H264", 2)
    with pytest.raises(NotImplementedError):
        A.read_frames(bad)
    # Spark demux-decode fan-out
    ids = np.arange(0, 120, 11)
    d = spark.createDataFrame(pd.DataFrame({"doc_id": ids}))
    out = MM.video_frame_sample(MM.attach_avi_media(d), every_k=2) \
        .orderBy("doc_id", "frame_idx").toPandas()
    for i in ids:
        rows = out[out["doc_id"] == i]
        nf = 3 + int(i) % 4
        assert list(rows["frame_idx"]) == list(range(0, nf, 2))
        assert (rows["n_frames"] == nf).all()
        assert (rows["width"] == 16).all() and (rows["height"] == 16).all()
