"""Viewshed line-of-sight semantics + pansharpen arithmetic."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import focal, raster


def _flat_with_wall(spark, w, wall_x, wall_h):
    return spark.range(w * w).select(
        (F.col("id") % w).alias("gx"),
        (F.col("id") / w).cast("bigint").alias("gy"),
        F.when(F.col("id") % w == wall_x, F.lit(wall_h)).otherwise(F.lit(0)).alias("value"),
    )


def test_viewshed_wall_occludes(spark):
    w = 16
    # flat terrain, vertical wall at x=10 of height 100; observer at (2, 8)
    band = _flat_with_wall(spark, w, wall_x=10, wall_h=100)
    out = {(r["gx"], r["gy"]): r["visible"] for r in
           focal.viewshed(band, width=w, ox=2, oy=8, obs_height=2.0).collect()}
    assert out[(2, 8)]            # observer pixel
    assert out[(5, 8)]            # before the wall
    assert out[(10, 8)]           # the wall top itself is visible
    assert not out[(14, 8)]       # behind the wall along the ray
    assert out[(0, 8)]            # opposite direction unaffected


def test_viewshed_flat_all_visible(spark):
    w = 12
    band = spark.range(w * w).select(
        (F.col("id") % w).alias("gx"),
        (F.col("id") / w).cast("bigint").alias("gy"),
        F.lit(5).alias("value"),
    )
    out = focal.viewshed(band, width=w, ox=6, oy=6, obs_height=2.0)
    assert out.filter(~F.col("visible")).count() == 0


def test_pansharpen_ratio_identity(spark):
    # if pan == pseudo everywhere, bands pass through unchanged
    base = spark.range(64).select(
        (F.col("id") % 8).alias("gx"), (F.col("id") / 8).cast("bigint").alias("gy"),
        (F.col("id") + 10).alias("b1"), (F.col("id") + 30).alias("b2"),
    )
    pan = base.select("gx", "gy", ((F.col("b1") + F.col("b2")) / 2).alias("value"))
    out = raster.pansharpen_weighted(base, pan, bands=["b1", "b2"]).collect()
    for r in out:
        gid = r["gy"] * 8 + r["gx"]
        assert r["b1_sharp"] == pytest.approx(gid + 10, abs=1e-9)
        assert r["b2_sharp"] == pytest.approx(gid + 30, abs=1e-9)
