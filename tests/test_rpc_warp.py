"""RPC transformer (operators.rpc_warp) vs alg/gdal_rpc.cpp semantics:
RPC00B term order, +0.5 corner convention, finite-difference seeded
fixed-point inverse with the 0.1-px default threshold."""
from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.operators import rpc_warp as R


@pytest.fixture(scope="module")
def rpc():
    return R.rpc_fixture()


def test_forward_identity_point(rpc):
    # at the normalization origin all terms except the constant vanish:
    # pixel = num0/den0 * scale + off + 0.5 exactly
    px, py = R.rpc_forward(rpc, np.array([rpc.long_off]),
                           np.array([rpc.lat_off]),
                           height=rpc.height_off)
    exp_px = rpc.samp_num[0] / rpc.samp_den[0] * rpc.samp_scale \
        + rpc.samp_off + 0.5
    exp_py = rpc.line_num[0] / rpc.line_den[0] * rpc.line_scale \
        + rpc.line_off + 0.5
    assert abs(px[0] - exp_px) < 1e-12
    assert abs(py[0] - exp_py) < 1e-12


def test_term_order_matches_rpc00b(rpc):
    # a coefficient bump on term k must move the output by exactly
    # term_k * scale (denominator 1): probes the gdal_rpc.cpp:345-369
    # ordering for a non-trivial (L, P, H)
    L, P, H = 0.37, -0.52, 0.21
    lon = rpc.long_off + L * rpc.long_scale
    lat = rpc.lat_off + P * rpc.lat_scale
    h = rpc.height_off + H * rpc.height_scale
    terms = [1.0, L, P, H, L * P, L * H, P * H, L * L, P * P, H * H,
             L * P * H, L**3, L * P * P, L * H * H, L * L * P, P**3,
             P * H * H, L * L * H, P * P * H, H**3]
    base = R.RPC(**{k: getattr(rpc, k) for k in (
        "long_off", "long_scale", "lat_off", "lat_scale", "height_off",
        "height_scale", "samp_off", "samp_scale", "line_off", "line_scale")},
        samp_num=(1.0,) + (0.0,) * 19, samp_den=(1.0,) + (0.0,) * 19,
        line_num=(1.0,) + (0.0,) * 19, line_den=(1.0,) + (0.0,) * 19)
    px0, _ = R.rpc_forward(base, np.array([lon]), np.array([lat]), h)
    for k in range(20):
        num = [1.0] + [0.0] * 19
        num[k] += 0.25
        bumped = R.RPC(**{kk: getattr(rpc, kk) for kk in (
            "long_off", "long_scale", "lat_off", "lat_scale", "height_off",
            "height_scale", "samp_off", "samp_scale", "line_off",
            "line_scale")},
            samp_num=tuple(num), samp_den=(1.0,) + (0.0,) * 19,
            line_num=(1.0,) + (0.0,) * 19, line_den=(1.0,) + (0.0,) * 19)
        px1, _ = R.rpc_forward(bumped, np.array([lon]), np.array([lat]), h)
        got = (px1[0] - px0[0]) / rpc.samp_scale / 0.25
        assert abs(got - terms[k]) < 1e-9, f"term {k}"


def test_inverse_converges_to_threshold(rpc):
    lon = np.linspace(rpc.long_off - 0.1, rpc.long_off + 0.1, 400)
    lat = np.linspace(rpc.lat_off - 0.08, rpc.lat_off + 0.08, 400)
    px, py = R.rpc_forward(rpc, lon, lat)
    lo, la = R.rpc_inverse(rpc, px, py)
    bx, by = R.rpc_forward(rpc, lo, la)
    err = np.maximum(np.abs(bx - px), np.abs(by - py))
    assert err.max() < R.DEFAULT_PIX_ERR_THRESHOLD


def test_height_term_participates(rpc):
    lon = np.array([rpc.long_off + 0.05])
    lat = np.array([rpc.lat_off + 0.03])
    p0, l0 = R.rpc_forward(rpc, lon, lat, height=0.0)
    p1, l1 = R.rpc_forward(rpc, lon, lat, height=400.0)
    # height changes the projection (parallax) — nonzero but bounded
    assert 1e-6 < abs(p1[0] - p0[0]) < 200.0


def test_spark_forward_sql_matches_numpy(spark, rpc):
    import pyspark.sql.functions as F

    df = spark.range(200).select(
        F.col("id"),
        (F.lit(rpc.long_off - 0.09) + F.col("id") * 0.0009).alias("lon"),
        (F.lit(rpc.lat_off - 0.07) + F.col("id") * 0.0007).alias("lat"),
    )
    out = R.apply_rpc_forward_sql(df, rpc).orderBy("id").collect()
    lon = np.array([r["lon"] for r in out])
    lat = np.array([r["lat"] for r in out])
    px, py = R.rpc_forward(rpc, lon, lat)
    got_px = np.array([r["pixel"] for r in out])
    got_py = np.array([r["line"] for r in out])
    assert np.abs(got_px - px).max() < 1e-7
    assert np.abs(got_py - py).max() < 1e-7
    # and the plan is pure JVM codegen — no Python stage
    plan = R.apply_rpc_forward_sql(df, rpc) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


def test_spark_inverse_udf_matches_numpy(spark, rpc):
    import pyspark.sql.functions as F

    df = spark.range(150).select(
        F.col("id"),
        (F.lit(3000.0) + F.col("id") * 31.0).alias("pixel"),
        (F.lit(2000.0) + F.col("id") * 23.0).alias("line"),
    )
    out = R.apply_rpc_inverse(df, rpc).orderBy("id").collect()
    lo, la = R.rpc_inverse(rpc, np.array([r["pixel"] for r in out]),
                           np.array([r["line"] for r in out]))
    assert np.abs(np.array([r["lon"] for r in out]) - lo).max() < 1e-12
    assert np.abs(np.array([r["lat"] for r in out]) - la).max() < 1e-12


# ------------------------------------------------------- RPC_DEM path

@pytest.fixture(scope="module")
def dem():
    return R.dem_fixture()


def test_dem_fwd_roundtrip_and_convergence(rpc, dem):
    # forward with DEM heights then the iterative ray/DEM inverse:
    # recovered lon/lat re-projects within the 0.1-px threshold
    ids = np.arange(0, 6000, 7)
    lon = 2.21 + (ids % 400).astype(np.float64) * 0.00045
    lat = 48.78 + ((ids // 400) % 300).astype(np.float64) * 0.00047
    fp, fl = R.rpc_forward_dem(rpc, dem, lon, lat)
    assert not np.isnan(fp).any()
    lo, la = R.rpc_inverse_dem(rpc, dem, fp, fl)
    assert not np.isnan(lo).any()
    bp, bl = R.rpc_forward_dem(rpc, dem, lo, la)
    err = np.maximum(np.abs(bp - fp), np.abs(bl - fl))
    assert err.max() < R.DEFAULT_PIX_ERR_THRESHOLD
    # and the heights actually participated: constant-height forward
    # at h=0 differs measurably (terrain is 60..200 m here)
    p0, _ = R.rpc_forward(rpc, lon, lat, 0.0)
    assert np.abs(fp - p0).max() > 0.1


def test_dem_fwd_outside_dem_is_nan(rpc, dem):
    # gdal_rpc.cpp forward: GetHeightAtLongLat failure -> point fails
    lon = np.array([dem.gt[0] - 0.5, 2.3])
    lat = np.array([48.85, 48.85])
    fp, fl = R.rpc_forward_dem(rpc, dem, lon, lat)
    assert np.isnan(fp[0]) and np.isnan(fl[0])
    assert not np.isnan(fp[1])


def test_dem_inverse_miss_after_iter0_fails(rpc, dem):
    # a DEM chip that misses the target region: iteration 0 snaps to
    # the border (never fails), but any later-iteration miss marks the
    # point failed (gdal_rpc.cpp:1239-1244) -> NaN
    tiny = R.DEM(dem.grid[:4, :4], dem.gt)
    px, py = R.rpc_forward(rpc, np.array([2.35]), np.array([48.80]), 100.0)
    lo, la = R.rpc_inverse_dem(rpc, tiny, px, py)
    assert np.isnan(lo[0]) and np.isnan(la[0])


def test_dem_ref_z_outside_returns_zero(rpc, dem):
    shifted = R.DEM(dem.grid, (10.0, 0.002, 0.0, 10.0, 0.0, -0.002))
    assert R.dem_ref_z(rpc, shifted) == 0.0


def test_dem_inv_oracle_bit_exact(rpc, dem):
    # the DuckDB CTE replay IS the numpy iteration: byte-matched
    # arithmetic over a 300-point scene, zero tolerance
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd
    ids = np.arange(0, 6000, 20)
    lon = 2.21 + (ids % 400).astype(np.float64) * 0.00045
    lat = 48.78 + ((ids // 400) % 300).astype(np.float64) * 0.00047
    fp, fl = R.rpc_forward_dem(rpc, dem, lon, lat)
    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"id": ids, "lon": lon, "lat": lat}))
    fwd = R.rpc_dem_fwd_sql_ctes(rpc, dem, R.dem_fixture_h_sql, "pts")
    got = con.execute(
        f"WITH {fwd} SELECT pixel, line FROM rpc_dem_fwd ORDER BY 1"
    ).fetchnumpy()
    assert np.array_equal(np.sort(fp), got["pixel"])
    ilo, ila = R.rpc_inverse_dem(rpc, dem, fp, fl)
    inv = R.rpc_dem_inv_sql_ctes(rpc, dem, R.dem_fixture_h_sql,
                                 "(SELECT id, pixel AS px, line AS py "
                                 "FROM rpc_dem_fwd)")
    got2 = con.execute(
        f"WITH {fwd}, {inv} SELECT lon, lat FROM rpc_dem_inv ORDER BY 1"
    ).fetchnumpy()
    assert np.array_equal(np.sort(ilo), got2["lon"])
    assert np.array_equal(np.sort(ila), np.sort(got2["lat"]))


def test_dem_inverse_gather_matches_broadcast(spark, rpc, dem):
    # the no-broadcast chip-gather variant (tile join + regroup +
    # per-chip masked kernel) returns bit-identical iterates to the
    # broadcast kernel for points whose window holds the iterates —
    # the entire fixture scene here
    import pandas as pd
    from pyspark.sql import functions as F

    ids = np.arange(0, 6000, 11)
    lon = 2.21 + (ids % 400).astype(np.float64) * 0.00045
    lat = 48.78 + ((ids // 400) % 300).astype(np.float64) * 0.00047
    fp, fl = R.rpc_forward_dem(rpc, dem, lon, lat)
    blo, bla = R.rpc_inverse_dem(rpc, dem, fp, fl)

    pts = spark.createDataFrame(
        pd.DataFrame({"id": ids, "pixel": fp, "line": fl}))
    tiles = R.dem_tiles_df(spark, dem, tile=32)
    got = R.apply_rpc_inverse_dem_gather(
        pts, rpc, dem, tiles, tile=32, chip_r=4,
    ).orderBy("id").toPandas()
    assert len(got) == len(ids)
    assert np.array_equal(got["lon"].to_numpy(), blo)
    assert np.array_equal(got["lat"].to_numpy(), bla)


def test_dem_inverse_gather_fails_points_leaving_chip(spark, rpc, dem):
    # chip_r=0 gives a 2x2 window: any point whose iterate needs a
    # corner outside it fails conservatively (NaN), never silently
    # returns wrong heights
    import pandas as pd

    ids = np.arange(40)
    lon = 2.25 + (ids % 8).astype(np.float64) * 0.01
    lat = 48.82 + (ids // 8).astype(np.float64) * 0.01
    fp, fl = R.rpc_forward_dem(rpc, dem, lon, lat)
    pts = spark.createDataFrame(
        pd.DataFrame({"id": ids, "pixel": fp, "line": fl}))
    tiles = R.dem_tiles_df(spark, dem, tile=32)
    got = R.apply_rpc_inverse_dem_gather(
        pts, rpc, dem, tiles, tile=32, chip_r=0,
    ).toPandas()
    blo, _ = R.rpc_inverse_dem(rpc, dem, fp, fl)
    ok = got["lon"].notna().to_numpy()
    # whatever converged must equal the broadcast kernel's answer
    order = np.argsort(got["id"].to_numpy())
    lon_sorted = got["lon"].to_numpy()[order]
    ok_sorted = ok[order]
    assert np.array_equal(lon_sorted[ok_sorted], blo[ok_sorted])


def test_dem_inverse_gather_keeps_nan_input_rows(spark, rpc, dem):
    # NaN pixel inputs must come back as (id, NaN, NaN) — the same
    # cardinality contract as the broadcast variant — not vanish in
    # the explode
    import pandas as pd

    pts = spark.createDataFrame(pd.DataFrame({
        "id": [1, 2], "pixel": [float("nan"), 7000.0],
        "line": [float("nan"), 5000.0]}))
    tiles = R.dem_tiles_df(spark, dem, tile=32)
    got = R.apply_rpc_inverse_dem_gather(pts, rpc, dem, tiles, tile=32) \
        .orderBy("id").toPandas()
    assert len(got) == 2
    assert np.isnan(got.loc[0, "lon"]) and np.isnan(got.loc[0, "lat"])
    assert not np.isnan(got.loc[1, "lon"])
