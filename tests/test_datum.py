"""Datum-shifted reprojection (kernels.datum): EPSG:27700 via the
7-parameter Helmert chain.

Oracle strategy: the Airy-1830 Transverse Mercator is pinned against
the published Ordnance Survey worked example ("A guide to coordinate
systems in Great Britain", the standard 52°39'27.2531"N /
1°43'4.5177"E -> 651409.903E 313177.270N case); the Helmert stage is
pinned by exact-inverse round-trips and the DuckDB SQL twin replaying
the identical literals (reference semantics: PROJ TOWGS84 pipeline
behind ogr/ogrct.cpp:2254)."""
from __future__ import annotations

import duckdb
import numpy as np
import pytest

from gdal_spark.kernels import datum as D

# OS worked example, OSGB36 geodetic -> National Grid (published to mm)
OS_LAT = 52 + 39 / 60 + 27.2531 / 3600
OS_LON = 1 + 43 / 60 + 4.5177 / 3600
OS_E = 651409.903
OS_N = 313177.270


def test_airy_tm_matches_os_worked_example():
    e, n = D.tm_forward(np.array([OS_LON]), np.array([OS_LAT]), D.OSGB_GRID)
    assert abs(e[0] - OS_E) < 5e-4  # published to mm
    assert abs(n[0] - OS_N) < 5e-4


def test_airy_tm_roundtrip_exact():
    lon = np.linspace(-7.5, 1.8, 500)
    lat = np.linspace(49.9, 60.8, 500)
    e, n = D.tm_forward(lon, lat, D.OSGB_GRID)
    lo, la = D.tm_inverse(e, n, D.OSGB_GRID)
    assert np.abs(lo - lon).max() < 1e-12
    assert np.abs(la - lat).max() < 1e-12


def test_helmert_exact_inverse():
    lon = np.linspace(-6, 1.7, 300)
    lat = np.linspace(50.1, 58.4, 300)
    x, y, z = D.geodetic_to_geocentric(lon, lat, D.WGS84_A, D.WGS84_E2)
    x2, y2, z2 = D.OSGB36_TO_WGS84.forward(*D.OSGB36_TO_WGS84.inverse(x, y, z))
    for a, b in ((x, x2), (y, y2), (z, z2)):
        assert np.abs(a - b).max() < 1e-8  # meters; matrix inverse is exact


def test_datum_chain_roundtrip_and_shift_magnitude():
    lon = np.linspace(-6, 1.7, 1000)
    lat = np.linspace(50.1, 58.4, 1000)
    e, n = D.wgs84_to_osgb(lon, lat)
    lo, la = D.osgb_to_wgs84(e, n)
    # 2D datum shifts drop ellipsoidal height both ways (like PROJ's
    # 2D TOWGS84 pipeline); the induced asymmetry is ~1.5 mm
    assert np.abs(lo - lon).max() < 5e-8
    assert np.abs(la - lat).max() < 5e-8
    # the shift vs pretending coords were already OSGB36: ~90-130 m
    # over Britain (the well-known WGS84/OSGB36 separation)
    e0, n0 = D.tm_forward(lon, lat, D.OSGB_GRID)
    d = np.sqrt((e - e0) ** 2 + (n - n0) ** 2)
    assert 60.0 < d.min() and d.max() < 180.0


def test_geocentric_bowring_exact_on_ellipsoid():
    lon = np.linspace(-179.0, 179.0, 400)
    lat = np.linspace(-89.0, 89.0, 400)
    x, y, z = D.geodetic_to_geocentric(lon, lat, D.WGS84_A, D.WGS84_E2)
    lo, la = D.geocentric_to_geodetic(x, y, z, D.WGS84_A, D.WGS84_F)
    assert np.abs(lo - lon).max() < 1e-12
    assert np.abs(la - lat).max() < 1e-12


def test_sql_twin_matches_numpy():
    lon = np.linspace(-5.9, 1.6, 97)
    lat = np.linspace(50.3, 58.2, 97)
    E, N = D.wgs84_to_osgb(lon, lat)
    lo, la = D.osgb_to_wgs84(E, N)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts AS SELECT * FROM (VALUES "
        + ",".join(f"({i},{lon[i]!r},{lat[i]!r})" for i in range(len(lon)))
        + ") t(id, lon, lat)")
    q = (f"WITH {D.osgb_forward_sql_ctes('pts')}, "
         "fe AS (SELECT id, easting, northing FROM osgb_fwd), "
         f"{D.osgb_inverse_sql_ctes('fe')} "
         "SELECT f.id, f.easting, f.northing, i.lon, i.lat "
         "FROM fe f JOIN osgb_inv i USING (id) ORDER BY id")
    df = con.execute(q).df()
    assert np.abs(df["easting"].to_numpy() - E).max() < 1e-7
    assert np.abs(df["northing"].to_numpy() - N).max() < 1e-7
    assert np.abs(df["lon"].to_numpy() - lo).max() < 1e-12
    assert np.abs(df["lat"].to_numpy() - la).max() < 1e-12


def test_reproject_udf_dispatches_27700(spark):
    """The general dispatch (reproject_udf) now executes a real datum
    shift without pyproj."""
    from gdal_spark.operators.reproject import reproject_udf

    df = spark.createDataFrame(
        [(1, -0.1276, 51.5072), (2, -3.1883, 55.9533)], "id long, lon double, lat double")
    out = {r["id"]: r for r in
           reproject_udf(df, 4326, 27700).collect()}
    E, N = D.wgs84_to_osgb(np.array([-0.1276]), np.array([51.5072]))
    assert abs(out[1]["x_dst"] - E[0]) < 1e-6
    assert abs(out[1]["y_dst"] - N[0]) < 1e-6
    # inverse direction dispatches too
    back = reproject_udf(
        spark.createDataFrame([(1, float(E[0]), float(N[0]))],
                              "id long, lon double, lat double"),
        27700, 4326).collect()[0]
    assert abs(back["x_dst"] - (-0.1276)) < 1e-7
    assert abs(back["y_dst"] - 51.5072) < 1e-7


def test_etrs89_utm_dispatch(spark):
    """EPSG:25832 (ETRS89/UTM 32N, GRS80): same Krueger machinery,
    different ellipsoid — within a few mm of WGS84 UTM32 (the GRS80 vs
    WGS84 1/f difference), but not identical, and round-trippable."""
    from gdal_spark.kernels import tmerc
    from gdal_spark.operators.reproject import reproject_udf

    lon = np.linspace(6.5, 11.5, 200)
    lat = np.linspace(47.5, 54.5, 200)
    df = spark.createDataFrame(
        [(int(i), float(lon[i]), float(lat[i])) for i in range(len(lon))],
        "id long, lon double, lat double")
    out = reproject_udf(df, 4326, 25832).orderBy("id").collect()
    ex = np.array([r["x_dst"] for r in out])
    ny = np.array([r["y_dst"] for r in out])
    ew, nw = tmerc.utm_forward(lon, lat, 32)
    d = np.hypot(ex - ew, ny - nw)
    assert d.max() < 0.005  # GRS80 vs WGS84: sub-5mm
    assert d.max() > 0.0    # ...but genuinely a different ellipsoid
    back = reproject_udf(
        spark.createDataFrame(
            [(int(i), float(ex[i]), float(ny[i])) for i in range(len(ex))],
            "id long, lon double, lat double"),
        25832, 4326).orderBy("id").collect()
    assert max(abs(r["x_dst"] - lon[r["id"]]) for r in back) < 1e-10
    assert max(abs(r["y_dst"] - lat[r["id"]]) for r in back) < 1e-10
