"""Krüger-series UTM kernel: accuracy + SQL-twin bit-closeness.

Independent checks (no pyproj in this container):
- forward/inverse round trip closes to < 1e-9 degrees
- central meridian maps to exactly easting = 500000 and
  northing = k0 * meridian arc (independent Bessel arc series)
- agreement with Snyder 1987 (a DIFFERENT published series) within
  its own ~1 mm truncation inside +-3 degrees of the central meridian
- the DuckDB SQL twins agree with the numpy kernel to < 1e-7 m / deg
  (shared float-literal coefficients + identical op sequence)
"""
import duckdb
import numpy as np
import pandas as pd
import pytest

from gdal_spark.kernels import tmerc


@pytest.fixture(scope="module")
def pts():
    rng = np.random.default_rng(42)
    lon = 0.5 + 5.0 * rng.random(4000)
    lat = -75.0 + 155.0 * rng.random(4000)
    return lon, lat


def test_roundtrip_closes(pts):
    lon, lat = pts
    e, n = tmerc.utm_forward(lon, lat, 31)
    lon2, lat2 = tmerc.utm_inverse(e, n, 31)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


def test_central_meridian_easting_and_arc():
    lat = np.array([0.0, 30.0, 45.0, 60.0, 80.0])
    e, n = tmerc.utm_forward(np.full_like(lat, 3.0), lat, 31)
    assert np.abs(e - 500000.0).max() < 1e-6
    # independent meridian arc (Bessel/Snyder series, gdal's own
    # low-order formulas; truncation ~1e-4 m)
    e2 = tmerc.E2
    phi = np.radians(lat)
    M = tmerc.A_E * (
        (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * phi
        - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * np.sin(2 * phi)
        + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * np.sin(4 * phi)
        - (35 * e2**3 / 3072) * np.sin(6 * phi)
    )
    # tolerance = the low-order arc series' own truncation (~0.8 mm)
    assert np.abs(n - tmerc.K0 * M).max() < 2e-3


def test_agrees_with_snyder_series(pts):
    lon, lat = pts
    sel = (np.abs(lon - 3.0) < 2.5) & (np.abs(lat) < 70)
    lon, lat = lon[sel], lat[sel]
    e, n = tmerc.utm_forward(lon, lat, 31)
    a, e2, k0 = tmerc.A_E, tmerc.E2, tmerc.K0
    lam = np.radians(lon - 3.0)
    phi = np.radians(lat)
    ep2 = e2 / (1 - e2)
    N = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    T = np.tan(phi) ** 2
    C = ep2 * np.cos(phi) ** 2
    A_ = np.cos(phi) * lam
    M = a * (
        (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * phi
        - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * np.sin(2 * phi)
        + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * np.sin(4 * phi)
        - (35 * e2**3 / 3072) * np.sin(6 * phi)
    )
    x = k0 * N * (A_ + (1 - T + C) * A_**3 / 6
                  + (5 - 18 * T + T**2 + 72 * C - 58 * ep2) * A_**5 / 120) + 500000
    y = k0 * (M + N * np.tan(phi) * (
        A_**2 / 2 + (5 - T + 9 * C + 4 * C**2) * A_**4 / 24
        + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * A_**6 / 720))
    # tolerance is Snyder's truncation, not ours (Krüger-6 is sub-nm)
    assert np.abs(e - x).max() < 2e-3
    assert np.abs(n - y).max() < 2e-3


def test_sql_twins_match_numpy(pts):
    lon, lat = pts
    con = duckdb.connect()
    con.register("src", pd.DataFrame({"id": np.arange(lon.size), "lon": lon, "lat": lat}))
    fwd = tmerc.forward_sql_ctes("src", 31).strip()
    r = con.execute(
        f"WITH {fwd} SELECT id, easting, northing FROM utm_fwd ORDER BY id"
    ).df()
    e, n = tmerc.utm_forward(lon, lat, 31)
    assert np.abs(r.easting.values - e).max() < 1e-7
    assert np.abs(r.northing.values - n).max() < 1e-7

    con.register("fe", pd.DataFrame({"id": np.arange(lon.size), "easting": e, "northing": n}))
    inv = tmerc.inverse_sql_ctes("fe", 31).strip()
    r2 = con.execute(
        f"WITH {inv} SELECT id, lon, lat FROM utm_inv ORDER BY id"
    ).df()
    lon2, lat2 = tmerc.utm_inverse(e, n, 31)
    assert np.abs(r2.lon.values - lon2).max() < 1e-12
    assert np.abs(r2.lat.values - lat2).max() < 1e-12
