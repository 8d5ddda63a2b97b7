"""Geolocation-array transformer (operators.geoloc_warp) vs
alg/gdalgeoloc.cpp PixelLineToXY semantics."""
from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.operators import geoloc_warp as G


@pytest.fixture(scope="module")
def grid():
    return G.swath_fixture()


def test_forward_interior_bilinear_exact(grid):
    # at a grid NODE (glp, gll integers) the bilinear must return the
    # node's geoloc value exactly (fx = fy = 0)
    ix, iy = 10, 7
    px = (ix + grid.conv) * grid.pixel_step
    py = (iy + grid.conv) * grid.line_step
    gx, gy = G.geoloc_forward(grid, np.array([px]), np.array([py]))
    assert gx[0] == grid.glx[iy, ix]
    assert gy[0] == grid.gly[iy, ix]


def test_forward_edge_extrapolation(grid):
    # beyond the last grid column: iX clamps to W-2, frac > 1 — the
    # reference's "infinite extension" (gdalgeoloc.cpp:455-500). The
    # value continues the last cell's linear trend.
    H, W = grid.glx.shape
    px = (W - 1 + 0.75 + grid.conv) * grid.pixel_step
    py = (5 + grid.conv) * grid.line_step
    gx, _ = G.geoloc_forward(grid, np.array([px]), np.array([py]))
    x_last = grid.glx[5, W - 1]
    x_prev = grid.glx[5, W - 2]
    expect = x_prev + 1.75 * (x_last - x_prev)
    assert abs(gx[0] - expect) < 1e-12


def test_inverse_roundtrip(grid):
    rng = np.random.RandomState(3)
    px = rng.uniform(10, 1000, 500)
    py = rng.uniform(10, 740, 500)
    gx, gy = G.geoloc_forward(grid, px, py)
    bx, by = G.geoloc_inverse(grid, gx, gy)
    assert np.abs(bx - px).max() < 1e-6
    assert np.abs(by - py).max() < 1e-6


def test_sql_twin_matches_numpy(grid):
    import duckdb

    ids = np.arange(0, 3000, 7)
    px = (ids % 1024).astype(np.float64)
    py = ((ids // 1024) % 768).astype(np.float64)
    gx, gy = G.geoloc_forward(grid, px, py)
    con = duckdb.connect()
    con.execute("CREATE TABLE swath AS SELECT * FROM (VALUES " + ",".join(
        f"({int(i)},{float(p)!r},{float(l)!r})"
        for i, p, l in zip(ids, px, py)) + ") t(id, px, py)")
    df = con.execute(
        f"WITH {G.swath_forward_sql('swath')} "
        "SELECT id, geo_x, geo_y FROM geoloc_fwd ORDER BY id").df()
    assert np.abs(df["geo_x"].to_numpy() - gx).max() < 1e-12
    assert np.abs(df["geo_y"].to_numpy() - gy).max() < 1e-12


def test_spark_udf_matches_numpy(spark, grid):
    import pyspark.sql.functions as F

    df = spark.range(300).select(
        F.col("id"),
        (F.col("id") * 3 % 1024).cast("double").alias("pixel"),
        (F.col("id") * 2 % 768).cast("double").alias("line"))
    out = G.apply_geoloc_forward(df, grid).orderBy("id").collect()
    gx, gy = G.geoloc_forward(
        grid, np.array([r["pixel"] for r in out]),
        np.array([r["line"] for r in out]))
    assert np.abs(np.array([r["geo_x"] for r in out]) - gx).max() == 0.0
    assert np.abs(np.array([r["geo_y"] for r in out]) - gy).max() == 0.0
    inv = G.apply_geoloc_inverse(
        G.apply_geoloc_forward(df, grid), grid, "geo_x", "geo_y") \
        .orderBy("id").collect()
    assert max(abs(r["pixel"] - (r["id"] * 3 % 1024)) for r in inv) < 1e-6


def test_inverse_oracle_bit_exact():
    # the DuckDB Newton replay IS the numpy iteration: zero tolerance
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd
    g = G.swath_fixture()
    ids = np.arange(0, 20000, 41)
    px = (ids % 1024).astype(np.float64)
    py = ((ids // 1024) % 768).astype(np.float64)
    gx, gy = G.geoloc_forward(g, px, py)
    rgx, rgy = np.round(gx, 9), np.round(gy, 9)
    ip, il = G.geoloc_inverse(g, rgx, rgy)
    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"id": ids, "gx": rgx, "gy": rgy}))
    got = con.execute(
        f"WITH {G.swath_inverse_sql('pts')} "
        f"SELECT id, pixel, line FROM geoloc_inv ORDER BY id"
    ).fetchnumpy()
    assert np.array_equal(got["pixel"], ip)
    assert np.array_equal(got["line"], il)
    # and the backmap actually inverts: forward(inverse) == input
    bx, by = G.geoloc_forward(g, ip, il)
    assert np.abs(bx - rgx).max() < 1e-9
    assert np.abs(by - rgy).max() < 1e-9
