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


def test_viewshed_curvature_horizon(spark):
    # flat terrain + earth-curvature correction: visibility must end at
    # a horizon ring; verified against an independent per-pixel python
    # reference of the same -cc formula (gdal_viewshed -cc semantics)
    import numpy as np
    from gdal_spark.operators import focal

    W = 48
    flat = spark.range(W * W).selectExpr(
        f"id % {W} AS gx", f"CAST(id / {W} AS BIGINT) AS gy",
        "CAST(100 AS BIGINT) AS value")
    cc, cell, diam = 0.85714, 500.0, 12756274.0
    out = focal.viewshed(flat, width=W, ox=W // 2, oy=W // 2,
                         obs_height=2.0, curve_coeff=cc, cell_size=cell,
                         earth_diameter=diam).collect()
    got = {(r["gx"], r["gy"]): r["visible"] for r in out}

    z_obs = 102.0
    for (gx, gy), v in got.items():
        n = max(abs(gx - W // 2), abs(gy - W // 2))
        if n < 2:
            assert v
            continue
        d2p = (gx - W // 2) ** 2 + (gy - W // 2) ** 2
        best = -np.inf
        for k in range(1, n):
            t = k / n
            zs = 100.0 - cc * (d2p * t * t * cell * cell) / diam
            best = max(best, (zs - z_obs) / t)
        zp = 100.0 - cc * (d2p * cell * cell) / diam
        assert v == (best < (zp - z_obs)), (gx, gy)
    # sanity: the correction actually bites — some pixels invisible,
    # near pixels visible
    vis_count = sum(got.values())
    assert 0 < vis_count < W * W
    # and without curvature everything is visible from above
    out0 = focal.viewshed(flat, width=W, ox=W // 2, oy=W // 2,
                          obs_height=2.0).collect()
    assert all(r["visible"] for r in out0)


def test_viewshed_ground_and_dem_modes(spark):
    # ridge fixture: observer at (1,4); a z=50 wall at x=4 hides the
    # plain behind it. GROUND mode must report exactly the height
    # deficit; DEM mode the minimum visible elevation.
    import numpy as np
    from gdal_spark.operators import focal

    W = 12
    rows = [(x, y, (50 if x == 4 else 0)) for y in range(W) for x in range(W)]
    band = spark.createDataFrame(rows, "gx bigint, gy bigint, value bigint")
    g = {(r["gx"], r["gy"]): r for r in focal.viewshed(
        band, width=W, ox=1, oy=4, obs_height=2.0, mode="GROUND").collect()}
    d = {(r["gx"], r["gy"]): r for r in focal.viewshed(
        band, width=W, ox=1, oy=4, obs_height=2.0, mode="DEM").collect()}
    # pixel straight behind the wall along the ray y=4: (8,4), n=7,
    # max slope from the wall sample at t=3/7: (50-2)/(3/7) = 112
    p = (8, 4)
    assert not g[p]["visible"]
    assert abs(g[p]["ground_req"] - (2.0 + 48.0 / (3.0 / 7.0))) < 1e-9
    assert abs(d[p]["dem_min"] - (2.0 + 48.0 / (3.0 / 7.0) + 0.0)) < 1e-9
    # visible pixel in front of the wall: zero deficit
    q = (3, 4)
    assert g[q]["visible"] and g[q]["ground_req"] == 0.0
    # near pixels (chebyshev < 2): dem_min is their own raw z, clamped
    # at 0 like every non-NORMAL output (viewshed_executor.cpp:184-186,
    # setOutput(result, cell, dfZ=cell) leaves the DEM base untouched)
    assert d[(1, 4)]["dem_min"] == 0.0  # observer pixel, z=0
    assert d[(2, 4)]["dem_min"] == 0.0  # adjacent, z=0
    assert d[(2, 5)]["dem_min"] == 0.0  # diagonal neighbor
    # GROUND deficit is always max(0, dem_min - z) on far pixels
    for k, rv in g.items():
        if max(abs(k[0] - 1), abs(k[1] - 4)) < 2:
            continue
        if d[k]["dem_min"] is not None and not np.isnan(d[k]["dem_min"]):
            z = 50.0 if k[0] == 4 else 0.0
            assert abs(rv["ground_req"] - max(0.0, d[k]["dem_min"] - z)) < 1e-9


def test_cumulative_viewshed_flat_terrain_all_255(spark):
    # flat band: every pixel is visible from every grid observer, so
    # the per-pixel sums are all equal to the observer count and the
    # 8-bit scale (floor(255/max * v), cumulative.cpp:200-213) maps
    # everything to exactly 255
    from gdal_spark.operators import focal

    W = 32
    rows = [(x, y, 5) for y in range(W) for x in range(W)]
    band = spark.createDataFrame(rows, "gx bigint, gy bigint, value bigint")
    out = focal.cumulative_viewshed(band, width=W, spacing=8).collect()
    assert len(out) == W * W
    assert all(r["value"] == 255 for r in out)


def test_cumulative_viewshed_wall_shadow(spark):
    # z=60 wall at x=20: pixels east of the wall are hidden from the
    # western observers (x in {0,8,16}) but still seen by the eastern
    # column (x=24), so their counts — and scaled values — are strictly
    # below the open plain west of the wall
    import numpy as np
    from gdal_spark.operators import focal

    W = 32
    rows = [(x, y, 60 if x == 20 else 0) for y in range(W) for x in range(W)]
    band = spark.createDataFrame(rows, "gx bigint, gy bigint, value bigint")
    got = {(r["gx"], r["gy"]): r["value"] for r in
           focal.cumulative_viewshed(band, width=W, spacing=8).collect()}
    assert max(got.values()) == 255
    # deep shadow just east of the wall vs open plain west of it
    assert got[(22, 12)] < got[(10, 12)]
    assert all(0 <= v <= 255 for v in got.values())


def test_cumulative_viewshed_256_observers_plan_constant(spark):
    """The 100k-observer regime proxy (alg/viewshed/cumulative.cpp:66):
    observers are rows in ONE plan, so (a) driver plan-build work must
    not scale with observer count — the optimized-plan node count at
    256 observers equals the 4-observer count — and (b) the 256-observer
    job actually runs, matching the flat-terrain invariant."""
    from gdal_spark.operators import focal

    W = 32
    rows = [(x, y, 5) for y in range(W) for x in range(W)]
    band = spark.createDataFrame(rows, "gx bigint, gy bigint, value bigint")

    def plan_nodes(df):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        return sum(1 for ln in plan.splitlines() if ln.strip())

    few = focal.cumulative_viewshed(band, width=W, spacing=16)   # 4 obs
    many = focal.cumulative_viewshed(band, width=W, spacing=2)   # 256 obs
    assert plan_nodes(many) == plan_nodes(few)

    got = {(r["gx"], r["gy"]): r["value"] for r in many.collect()}
    # flat terrain: every observer sees every pixel -> all 255
    assert len(got) == W * W
    assert set(got.values()) == {255}
