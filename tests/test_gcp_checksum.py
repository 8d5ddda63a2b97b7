"""GCP warp transformers (polynomial + TPS) and GDALChecksumImage."""
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import gcp_warp, raster


def _affine_gcps():
    # targets exactly affine in (px, py): X = 2 + 0.5 px - 0.1 py
    out = []
    for k in range(6):
        px, py = float((k * 17) % 31), float((k * 29) % 23)
        out.append((px, py, 2.0 + 0.5 * px - 0.1 * py, -1.0 + 0.2 * px + 0.3 * py))
    return out


def test_poly1_recovers_affine(spark):
    m = gcp_warp.fit_polynomial_gcps(_affine_gcps(), order=1)
    df = spark.range(0, 50).select(
        (F.col("id") % 13).cast("double").alias("px"),
        (F.col("id") % 7).cast("double").alias("py"),
    )
    rows = gcp_warp.apply_polynomial(df, m).collect()
    for r in rows:
        assert abs(r["geo_x"] - (2.0 + 0.5 * r["px"] - 0.1 * r["py"])) < 1e-9
        assert abs(r["geo_y"] - (-1.0 + 0.2 * r["px"] + 0.3 * r["py"])) < 1e-9


def test_poly_orders_need_enough_gcps():
    with pytest.raises(ValueError):
        gcp_warp.fit_polynomial_gcps(_affine_gcps(), order=3)  # 6 < 10


def test_tps_interpolates_gcps(spark):
    gcps = gcp_warp.gcp_fixture()
    m = gcp_warp.fit_tps_gcps(gcps)
    df = spark.createDataFrame(
        [(i, g[0], g[1]) for i, g in enumerate(gcps)], "id int, px double, py double"
    )
    got = {r["id"]: (r["geo_x"], r["geo_y"])
           for r in gcp_warp.apply_tps(df, m).collect()}
    for i, (_, _, tx, ty) in enumerate(gcps):
        assert abs(got[i][0] - tx) < 1e-8   # TPS is an interpolant
        assert abs(got[i][1] - ty) < 1e-8


def test_tps_reduces_to_driver_formula(spark):
    """Spark TPS apply == direct numpy evaluation of the
    thinplatespline.cpp:666-691 formula at off-GCP points."""
    gcps = gcp_warp.gcp_fixture()
    m = gcp_warp.fit_tps_gcps(gcps)
    pts = [(0, 3.25, 7.5), (1, 30.0, 20.0), (2, 63.0, 47.0)]
    df = spark.createDataFrame(pts, "id int, px double, py double")
    got = {r["id"]: (r["geo_x"], r["geo_y"])
           for r in gcp_warp.apply_tps(df, m).collect()}
    gx, gy = np.array(m["gx"]), np.array(m["gy"])
    cx, cy = m["cx"], m["cy"]
    for i, px, py in pts:
        p, q = px - m["x_mean"], py - m["y_mean"]
        ex = cx[0] + cx[1] * p + cx[2] * q
        ey = cy[0] + cy[1] * p + cy[2] * q
        for r in range(len(gx)):
            d2 = (p - gx[r]) ** 2 + (q - gy[r]) ** 2
            k = d2 * math.log(d2) if d2 > 0 else 0.0
            ex += cx[r + 3] * k
            ey += cy[r + 3] * k
        assert abs(got[i][0] - ex) < 1e-9
        assert abs(got[i][1] - ey) < 1e-9


def _ref_checksum(vals, width):
    """Literal reimplementation of alg/gdalchecksum.cpp integer loop."""
    primes = raster.CHECKSUM_PRIMES
    cs = 0
    for y in range(len(vals) // width):
        for x in range(width):
            v = vals[y * width + x]
            v = max(-2147483647, min(2147483647, v))
            # C remainder truncates toward zero
            r = int(math.fmod(v, primes[(y * width + x) % 11]))
            cs += r
        cs &= 0xFFFF
    return cs


def test_checksum_matches_reference_loop(spark):
    vals = [((i * 73 + 11) % 509) - 200 for i in range(64)]  # incl. negatives
    df = spark.createDataFrame(
        [(i % 8, i // 8, v) for i, v in enumerate(vals)],
        "gx int, gy int, value long",
    )
    got = raster.checksum_image(df, width=8).collect()[0]["checksum"]
    assert got == _ref_checksum(vals, 8)


def test_checksum_float_conversion(spark):
    vals = [v / 3.0 for v in range(-20, 28)]
    df = spark.createDataFrame(
        [(i % 6, i // 6, v) for i, v in enumerate(vals)],
        "gx int, gy int, value double",
    )
    got = raster.checksum_image(df, width=6, floating=True).collect()[0]["checksum"]
    ints = [math.floor(v + 0.5) for v in vals]
    assert got == _ref_checksum(ints, 6)


def test_rasterize_all_touched_superset_and_boundary(spark):
    # thin triangle: boundary crosses many cells whose centers are outside
    polys = raster.pixel_polys(spark, [(0, [1.3, 10.6, 1.4], [1.2, 2.9, 3.1])])
    at = {(r["gx"], r["gy"]) for r in
          raster.rasterize_all_touched(polys, width=16, height=8).collect()}
    inner = {(r["gx"], r["gy"]) for r in
             raster.rasterize_interior(polys, width=16, height=8).collect()}
    assert inner <= at
    assert len(at) > len(inner)          # boundary-only pixels exist
    assert (10, 2) in at                 # apex cell touched
    # every touched pixel is within the triangle's bbox cells
    assert all(1 <= x <= 10 and 1 <= y <= 3 for x, y in at)


def test_rasterize_inverse_complements_fill(spark):
    polys = raster.pixel_polys(spark, [(0, [2.2, 6.7, 6.6, 2.3], [2.1, 2.4, 6.8, 6.7])])
    inv = {(r["gx"], r["gy"]) for r in
           raster.rasterize_inverse(polys, width=10, height=10).collect()}
    inner = {(r["gx"], r["gy"]) for r in
             raster.rasterize_interior(polys, width=10, height=10).collect()}
    assert inv.isdisjoint(inner)
    assert len(inv) + len(inner) == 100
