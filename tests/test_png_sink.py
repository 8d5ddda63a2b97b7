"""PNG tile sink: real {z}/{x}/{y}.png artifacts whose decoded bands
reproduce the exact per-band checksums of the RGBA checksum-grid gate
query (the test_gdal2tiles.py:121-124 expected_cs pattern)."""
from __future__ import annotations

import os

import numpy as np
import pytest

from gdal_spark.kernels import png as P


def test_png_roundtrip_rgba():
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, size=(16, 16, 4)).astype(np.uint8)
    buf = P.encode_rgba(arr)
    assert buf[:8] == b"\x89PNG\r\n\x1a\n"
    back = P.decode(buf)
    assert back.shape == (16, 16, 4)
    assert (back == arr).all()


def test_png_roundtrip_gray_and_determinism():
    arr = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3).astype(np.uint8)
    b1 = P.encode_gray(arr)
    b2 = P.encode_gray(arr.copy())
    assert b1 == b2  # byte-deterministic artifact
    assert (P.decode(b1) == arr).all()


def test_tile_sink_artifacts_match_checksum_grid(spark, tmp_path):
    """Write the RGBA fixture's base tiles as real PNGs; decode every
    artifact and recompute sum((1+pos)*value) mod P per band — must
    equal the oracle-checked checksum grid."""
    import pyspark.sql.functions as F

    from gdal_spark import io as gio
    from gdal_spark.operators import base_tiles as BT
    from gdal_spark.queries import _RGBA_SALTS

    ts = 16
    px = None
    for b, salt in enumerate(_RGBA_SALTS):
        src = BT.src_pixels(spark, salt=salt, byte_range=True)
        t = BT.base_tiles(spark, tz=2, tile_size=ts, src=src) \
            .withColumn("band", F.lit(b))
        px = t if px is None else px.unionByName(t)
    alpha = BT.base_tiles(spark, tz=2, tile_size=ts, src=BT.src_alpha(spark)) \
        .withColumn("band", F.lit(3))
    px = px.unionByName(alpha)

    out_dir = str(tmp_path / "tiles")
    manifest = gio.write_tile_pngs(px, out_dir, tile_size=ts, bands=4)
    files = {(r["tz"], r["tx"], r["ty"]): r for r in manifest.collect()}
    assert files, "no tiles written"

    # expected per-band checksums directly from the pixel rows (the
    # same reduction the oracle-checked tile_checksums grid gates)
    from gdal_spark.operators.base_tiles import CHECKSUM_P

    exp = {
        (r["tz"], r["tx"], r["ty"], r["band"]): r["cs"]
        for r in px.groupBy("tz", "tx", "ty", "band").agg(
            (F.sum((F.lit(1) + F.col("pos")) * F.col("value"))
             % CHECKSUM_P).alias("cs")).collect()
    }

    for (tz, tx, ty), r in files.items():
        assert os.path.exists(r["path"])
        arr = P.decode(open(r["path"], "rb").read())
        assert arr.shape == (ts, ts, 4)
        pos = np.arange(ts * ts).reshape(ts, ts)
        for b in range(4):
            cs = int((((1 + pos) * arr[:, :, b].astype(np.int64)).sum())
                     % CHECKSUM_P)
            key = (tz, tx, ty, b)
            if key in exp:
                assert cs == int(exp[key]) % CHECKSUM_P, (key, cs)
            else:
                # band absent from the pixel rows -> fully transparent
                assert cs == 0, key


def test_streaming_tile_png_sink(spark, tmp_path):
    """availableNow file-stream of pixel rows -> foreachBatch PNG sink:
    the artifacts appear and decode to the batch values."""
    import pyspark.sql.functions as F

    from gdal_spark import streaming as S
    from gdal_spark.operators import base_tiles as BT

    ts = 16
    src = BT.src_pixels(spark, salt=7, byte_range=True)
    px = BT.base_tiles(spark, tz=1, tile_size=ts, src=src) \
        .withColumn("band", F.lit(0))
    in_dir = str(tmp_path / "px_in")
    px.write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema(px.schema).parquet(in_dir)
    out_dir = str(tmp_path / "tiles_stream")
    q = S.stream_tile_pngs(
        stream, out_dir, tile_size=ts, bands=1,
        checkpoint=str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    expected = {(r["tz"], r["tx"], r["ty"]) for r in
                px.select("tz", "tx", "ty").distinct().collect()}
    got = set()
    import os as _os
    for tz in _os.listdir(out_dir):
        for tx in _os.listdir(_os.path.join(out_dir, tz)):
            for f in _os.listdir(_os.path.join(out_dir, tz, tx)):
                got.add((int(tz), int(tx), int(f.removesuffix(".png"))))
    assert got == expected
    # spot-decode one tile against the batch pixel values
    tz, tx, ty = sorted(got)[0]
    arr = P.decode(open(f"{out_dir}/{tz}/{tx}/{ty}.png", "rb").read())
    vals = {r["pos"]: r["value"] for r in px.filter(
        (F.col("tz") == tz) & (F.col("tx") == tx) & (F.col("ty") == ty)
    ).collect()}
    for pos, v in vals.items():
        assert arr[pos // ts, pos % ts] == int(v) & 0xFF


def test_tile_sink_resume_writes_only_missing(spark, tmp_path):
    """Kill-and-resume discipline (checkpoint-manifest anti-join): a
    second run rewrites nothing already in the manifest, writes only
    missing tiles, and the manifest chain records lineage rows."""
    import pyspark.sql.functions as F

    from gdal_spark import checkpoint as CK
    from gdal_spark import io as gio
    from gdal_spark.operators import base_tiles as BT

    ts = 16
    px = (BT.base_tiles(spark, tz=1, tile_size=ts,
                        src=BT.src_pixels(spark, salt=3, byte_range=True))
          .withColumn("band", F.lit(0))
          .unionByName(
              BT.base_tiles(spark, tz=2, tile_size=ts,
                            src=BT.src_pixels(spark, salt=3, byte_range=True))
              .withColumn("band", F.lit(0))))
    out_dir = str(tmp_path / "tiles")

    # run 1: z1 only ("the job died before reaching z2")
    m1 = gio.write_tile_pngs_resumable(
        px.filter(F.col("tz") == 1), out_dir, tile_size=ts, bands=1,
        job_id="t", input_snapshot="snap:A")
    assert m1["tiles_written"] > 0 and m1["zoom_rounds"] == 1
    man = CK.read_manifest(spark, out_dir, "t")
    done1 = {r["part_key"] for r in man.collect()}
    mtimes1 = {}
    for pk in done1:
        p = os.path.join(out_dir, pk + ".png")
        assert os.path.exists(p)
        mtimes1[pk] = os.stat(p).st_mtime_ns

    # sabotage: delete one z1 artifact (manifest row survives) — the
    # manifest, not file existence, governs resume
    lost = sorted(done1)[0]
    os.unlink(os.path.join(out_dir, lost + ".png"))

    # run 2: full tile set — resumes, writes ONLY the missing z2 tiles
    m2 = gio.write_tile_pngs_resumable(
        px, out_dir, tile_size=ts, bands=1, job_id="t",
        input_snapshot="snap:A")
    assert m2["zoom_rounds"] == 1  # z1 fully pruned by the anti-join
    man2 = CK.read_manifest(spark, out_dir, "t").collect()
    done2 = {r["part_key"] for r in man2}
    assert done1 < done2
    for pk, old in mtimes1.items():
        if pk == lost:
            assert not os.path.exists(os.path.join(out_dir, pk + ".png"))
        else:
            assert os.stat(os.path.join(out_dir, pk + ".png")).st_mtime_ns == old
    for pk in done2 - done1:
        assert pk.startswith("2/")
        assert os.path.exists(os.path.join(out_dir, pk + ".png"))
    # lineage: every manifest row carries the input snapshot + nbytes
    assert all(r["input_snapshot"] == "snap:A" and r["n_rows_out"] > 0
               for r in man2)

    # run 3: nothing pending — zero rounds, zero writes
    m3 = gio.write_tile_pngs_resumable(
        px, out_dir, tile_size=ts, bands=1, job_id="t")
    assert m3["tiles_written"] == 0 and m3["zoom_rounds"] == 0


def test_tile_sink_resume_webp_driver(spark, tmp_path):
    """The resume discipline composes with the non-default tile
    drivers: driver= reaches write_tile_pngs, artifacts get the
    driver's extension, and a resumed run prunes by manifest."""
    import pyspark.sql.functions as F

    from gdal_spark import io as gio
    from gdal_spark.kernels import webp as W
    from gdal_spark.operators import base_tiles as BT

    ts = 16
    px = (BT.base_tiles(spark, tz=1, tile_size=ts,
                        src=BT.src_pixels(spark, salt=5, byte_range=True))
          .withColumn("band", F.lit(0)))
    out_dir = str(tmp_path / "tiles_webp")
    m1 = gio.write_tile_pngs_resumable(
        px, out_dir, tile_size=ts, bands=1, driver="webp", job_id="w")
    assert m1["tiles_written"] > 0
    wrote = [os.path.join(dp, f) for dp, _, fs in os.walk(out_dir)
             for f in fs if not dp.endswith("_manifest")]
    assert wrote and all(f.endswith(".webp") for f in wrote)
    # decodable + grayscale written as equal RGB channels
    arr = W.decode(open(sorted(wrote)[0], "rb").read())
    assert arr.shape == (ts, ts, 4)
    assert (arr[:, :, 0] == arr[:, :, 1]).all()
    # resume: nothing pending, nothing rewritten
    m2 = gio.write_tile_pngs_resumable(
        px, out_dir, tile_size=ts, bands=1, driver="webp", job_id="w")
    assert m2["tiles_written"] == 0 and m2["zoom_rounds"] == 0


def test_image_features_and_resize_real_codec(spark):
    """Multimodal image branch with the REAL codec: features from
    decoded PNGs match the closed pixel rule; box resize preserves the
    global mean within integer-floor error and re-encodes decodably."""
    import pandas as pd

    from gdal_spark.operators import multimodal as MM

    ids = pd.DataFrame({"doc_id": np.arange(0, 400, 7)})
    d = spark.createDataFrame(ids)
    media = MM.attach_png_media(d)
    feat = MM.image_features(media).orderBy("doc_id").toPandas()
    for _, r in feat.iterrows():
        i = int(r["doc_id"])
        w, h = 8 + i % 9, 8 + (i * 3) % 7
        flat = (i * 31 + np.arange(w * h, dtype=np.int64)) % 256
        assert (r["width"], r["height"]) == (w, h)
        assert r["px_sum"] == flat.sum()
        assert r["px_min"] == flat.min() and r["px_max"] == flat.max()
    small = MM.image_resize(media, out_w=4, out_h=4).limit(20).toPandas()
    for _, r in small.iterrows():
        arr = P.decode(bytes(r["payload"]))
        assert arr.shape == (4, 4)
    nn = MM.image_resize(media, out_w=4, out_h=4, method="nearest") \
        .limit(5).toPandas()
    for _, r in nn.iterrows():
        assert P.decode(bytes(r["payload"])).shape == (4, 4)
