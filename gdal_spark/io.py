"""Table IO seam: Iceberg when available, plain parquet otherwise.

The production deployment reads/writes Iceberg (snapshot isolation is
what checkpoint/resume anchors to, BASELINE north_rule); the sandbox
has no Iceberg runtime jars, so the same API falls back to parquet
directories with an explicit `snapshot` column standing in for the
snapshot id. Everything above this seam is format-agnostic.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def have_iceberg(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: B018
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a named table from an sf directory (driver testdata layout)
    or an Iceberg catalog identifier of the form 'catalog.db.table'."""
    if "." in name and "/" not in name:
        return spark.read.table(name)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def write_table(df: DataFrame, path_or_ident: str, *, mode: str = "overwrite",
                partition_by: list[str] | None = None) -> None:
    """Append/overwrite through the seam. Iceberg identifiers use
    writeTo (appends become snapshots -> resumable); paths use parquet.
    """
    if "/" not in path_or_ident:
        w = df.writeTo(path_or_ident)
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path_or_ident)


def write_range_partitioned(df: DataFrame, path_or_ident: str, *,
                            prefix_col: str = "quadkey",
                            prefix_len: int = 4,
                            n_files: int | None = None,
                            mode: str = "overwrite") -> None:
    """Range-partition the output by CELL PREFIX before writing (the
    north-star layout rule: co-located tiles/cells land in the same
    files, so a downstream cell- or tile-range scan prunes to a
    contiguous file subset).

    quadkey prefixes order tiles along the Z-order curve, so
    repartitionByRange on the prefix gives spatial file clustering
    without a custom partitioner; within each range Spark range-samples
    the ACTUAL key distribution, which is what keeps skewed cell
    populations balanced across files at 100 TB (static hash buckets
    would not). `n_files` defaults to spark.sql.shuffle.partitions."""
    from pyspark.sql import functions as F

    key = F.substring(F.col(prefix_col).cast("string"), 1, prefix_len)
    d = df.withColumn("_range_key", key)
    if n_files:
        d = d.repartitionByRange(n_files, "_range_key", prefix_col)
    else:
        d = d.repartitionByRange("_range_key", prefix_col)
    write_table(d.drop("_range_key"), path_or_ident, mode=mode)


def write_tile_pngs(px: DataFrame, out_dir: str, *, tile_size: int,
                    bands: int = 4, driver: str = "png",
                    jpeg_quality: int = 85) -> DataFrame:
    """Write REAL {z}/{x}/{y}.png artifacts from band-pixel rows — the
    gdal2tiles tile sink closed end-to-end (gdal2tiles.py tile
    rendering; artifact checksums test_gdal2tiles.py:121-124).

    px: (tz, tx, ty, band, pos, value) with uint8 values; absent
    pixels are transparent (alpha 0 + zero channels), matching the
    reference's unwritten-region semantics. bands=4 expects bands
    0..2 = RGB, 3 = alpha; bands=1 writes grayscale.

    Distributed shape: ONE groupBy per tile key, each task encodes and
    writes its own files directly (no driver collect) — at 100 TB the
    artifact write parallelizes like any shuffle stage. Returns the
    manifest (tz, tx, ty, path, nbytes, crc32) for verification and
    downstream indexing.

    Shared-filesystem requirement: tasks write with os.makedirs /
    os.replace on the EXECUTOR-local view of `out_dir`, so on a real
    multi-node cluster `out_dir` must be a shared mount (NFS, Lustre,
    a FUSE-mounted object store); otherwise tiles scatter across
    worker-local disks. For plain object stores without a POSIX
    mount, swap the write_group body for the store's SDK put — the
    Spark plan (group → encode → per-task put) is unchanged.

    driver: "png" (default — lossless RGBA/gray, r4 codec), "jpeg"
    (gdal2tiles --tiledriver JPEG analog, kernels/jpeg.py baseline
    codec): RGB without alpha (JPEG has none — the reference's JPEG
    tiles likewise drop it) or grayscale, `.jpg` extension; or "webp"
    (gdal2tiles --tiledriver WEBP analog, kernels/webp.py VP8L
    lossless codec): RGBA with alpha preserved, grayscale written as
    equal RGB channels (VP8L has no gray mode), `.webp` extension.

    Eager (an action runs inside): the write is the side effect.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    from .kernels import jpeg as jpeg_mod
    from .kernels import png as png_mod
    from .kernels import webp as webp_mod

    assert driver in ("png", "jpeg", "webp")
    schema = ("tz int, tx bigint, ty bigint, path string, nbytes bigint, "
              "crc32 bigint")
    ts = tile_size
    nb = bands
    ext = {"png": "png", "jpeg": "jpg", "webp": "webp"}[driver]

    def write_group(key, pdf):
        import binascii
        import tempfile

        tz, tx, ty = int(key[0]), int(key[1]), int(key[2])
        pos = pdf["pos"].to_numpy(dtype=np.int64)
        val = (pdf["value"].to_numpy(dtype=np.int64) & 0xFF).astype(np.uint8)
        if nb == 4:
            arr = np.zeros((ts * ts, 4), dtype=np.uint8)
            arr[pos, pdf["band"].to_numpy(dtype=np.int64)] = val
            if driver == "png":
                buf = png_mod.encode_rgba(arr.reshape(ts, ts, 4))
            elif driver == "webp":
                buf = webp_mod.encode(arr.reshape(ts, ts, 4))
            else:
                buf = jpeg_mod.encode(
                    arr.reshape(ts, ts, 4)[:, :, :3], quality=jpeg_quality)
        else:
            arr = np.zeros(ts * ts, dtype=np.uint8)
            arr[pos] = val
            if driver == "png":
                buf = png_mod.encode_gray(arr.reshape(ts, ts))
            elif driver == "webp":
                g = arr.reshape(ts, ts)
                buf = webp_mod.encode(np.stack([g, g, g], axis=2))
            else:
                buf = jpeg_mod.encode(arr.reshape(ts, ts),
                                      quality=jpeg_quality)
        d = os.path.join(out_dir, str(tz), str(tx))
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"{ty}.{ext}")
        # atomic last-writer-wins: readers (and re-renders from a
        # streaming micro-batch) never observe a truncated artifact.
        # mkstemp creates 0600 — restore world-readable artifact perms,
        # and never leak the temp file into the served directory if the
        # task dies mid-write
        fd, tmp = tempfile.mkstemp(dir=d, suffix=f".{ext}.tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(buf)
            os.chmod(tmp, 0o644)
            os.replace(tmp, path)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
        return pd.DataFrame([{
            "tz": tz, "tx": tx, "ty": ty, "path": path,
            "nbytes": len(buf),
            "crc32": binascii.crc32(buf) & 0xFFFFFFFF,
        }])

    manifest = px.groupBy("tz", "tx", "ty").applyInPandas(write_group, schema)
    # materialize ONCE (the files are the output; an uncached manifest
    # would re-render tiles on every downstream action). Callers that
    # drop the manifest (the streaming sink) must unpersist it.
    manifest = manifest.cache()
    manifest.count()
    return manifest


def write_tile_pngs_resumable(px: DataFrame, out_dir: str, *,
                              tile_size: int, bands: int = 4,
                              driver: str = "png", jpeg_quality: int = 85,
                              job_id: str = "tiles",
                              input_snapshot: str = "parquet:static") -> dict:
    """write_tile_pngs with the checkpoint-manifest resume discipline
    (checkpoint.py): the gdal2tiles `--resume` semantics
    (gdal2tiles.py options.resume — skip tiles that already exist)
    done as a manifest anti-join instead of per-file existence RPCs.

    - part key = "z/x/y" per TILE; completed tiles are pruned BEFORE
      the groupBy shuffle, so a resumed 100 TB render re-shuffles only
      the missing tiles' pixels.
    - one round per zoom level (bounded driver loop, <= ~20 entries —
      no driver-side collect of the tile list): each zoom's artifacts
      are written, then its manifest rows append in one distributed
      write. A kill mid-zoom loses only that zoom's manifest; the
      atomic per-tile os.replace makes the re-render idempotent.
    - lineage: each manifest row carries input_snapshot + the artifact
      byte count (n_rows_out = nbytes for this artifact sink) + the
      zoom round's wall_ms.

    The manifest, not file existence, governs resume: a tile whose
    file was lost but whose manifest row survives is NOT re-rendered
    (delete its manifest row to force it), matching run_partitioned's
    snapshot discipline. Returns metrics."""
    import time as _time

    from pyspark.sql import functions as F

    from . import checkpoint as CK

    spark = px.sparkSession
    done = CK.read_manifest(spark, out_dir, job_id).select(
        F.col("part_key").alias("_done_key"))
    keyed = px.withColumn("_pk", F.concat_ws("/", "tz", "tx", "ty"))
    # persist the pruned pixel set: without it the full input scan +
    # manifest anti-join would re-execute once per zoom round (plus
    # once for the zoom collect) — n_zooms+1 passes over a 100 TB
    # input instead of one
    pending = keyed.join(done, keyed["_pk"] == done["_done_key"],
                         "left_anti").drop("_pk").persist()
    zooms = sorted(r["tz"] for r in pending.select("tz").distinct().collect())
    t0 = _time.time()
    n_tiles = 0
    for tz in zooms:
        t1 = _time.time()
        man = write_tile_pngs(pending.filter(F.col("tz") == tz), out_dir,
                              tile_size=tile_size, bands=bands,
                              driver=driver, jpeg_quality=jpeg_quality)
        wall = int((_time.time() - t1) * 1000)
        rows = man.select(
            F.lit(job_id).alias("job_id"),
            F.concat_ws("/", "tz", "tx", "ty").alias("part_key"),
            F.lit(input_snapshot).alias("input_snapshot"),
            F.col("nbytes").cast("bigint").alias("n_rows_out"),
            F.lit(wall).cast("bigint").alias("wall_ms"),
            F.current_timestamp().alias("finished_at"),
        )
        rows.write.mode("append").parquet(CK.manifest_path(out_dir))
        n_tiles += man.count()
        man.unpersist()
    pending.unpersist()
    return {"job_id": job_id, "tiles_written": n_tiles,
            "zoom_rounds": len(zooms), "wall_sec": _time.time() - t0}
