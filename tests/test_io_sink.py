"""Tile sink layout + io seam tests (SURVEY §2.1: tile tables written
partitioned by zoom, quadkey-prefix range partitioning inside)."""
from __future__ import annotations

import os

from pyspark.sql import functions as F

from gdal_spark import io
from gdal_spark.operators import tiling
from gdal_spark.sources import docs


def test_tile_pyramid_sink_partitioned_by_zoom(spark, tmp_path):
    d = docs.synth_docs(spark, 3000).select("doc_id", "lon", "lat")
    pyr = tiling.pyramid_counts(d, max_zoom=4, min_zoom=0)
    out = str(tmp_path / "tiles")
    io.write_table(pyr, out, partition_by=["zoom"])
    # {zoom=z} directory layout — the {z}/... tile-tree analog
    zdirs = sorted(p for p in os.listdir(out) if p.startswith("zoom="))
    assert zdirs == [f"zoom={z}" for z in range(5)]
    back = spark.read.parquet(out)
    assert back.count() == pyr.count()
    # partition pruning: a zoom filter must prune to one partition dir
    plan = back.filter(F.col("zoom") == 2)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(zoom" in plan


def test_read_table_seam(spark, sf_dir):
    df = io.read_table(spark, sf_dir, "region")
    assert df.count() == 5


def test_write_append_mode(spark, tmp_path):
    out = str(tmp_path / "t")
    a = spark.range(5).select(F.col("id"))
    io.write_table(a, out, mode="overwrite")
    io.write_table(a, out, mode="append")
    assert spark.read.parquet(out).count() == 10


def test_write_range_partitioned_clusters_by_prefix(spark, tmp_path):
    import glob

    from gdal_spark import io as gio
    from gdal_spark.operators import tiling
    from gdal_spark.sources import docs as D

    tiled = tiling.assign_tiles(D.synth_docs(spark, 4000), zoom=8)
    out = str(tmp_path / "ranged")
    gio.write_range_partitioned(
        tiled.select("doc_id", "quadkey", "tx", "ty_xyz"), out,
        prefix_col="quadkey", prefix_len=3, n_files=8)
    files = sorted(glob.glob(out + "/*.parquet"))
    assert len(files) >= 2
    # each file holds a CONTIGUOUS quadkey range: per-file [min, max]
    # intervals must not interleave
    spans = []
    for f in files:
        pdf = spark.read.parquet(f).select("quadkey").toPandas()
        if len(pdf):
            qk = pdf["quadkey"].astype(str)
            spans.append((qk.min(), qk.max()))
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1[:3] <= lo2[:3], (hi1, lo2)
