"""Lambert Conformal Conic + Polar Stereographic kernel pins.

Closed-form Snyder equations (no PROJ in the container), so the pins
are structural: the projection origin maps to the false origin, scale
equals 1 on the standard parallels (finite-difference estimate),
round-trips are sub-nanometer, and the reproject_udf dispatch path
executes without pyproj.
"""
from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.kernels import conic


def test_lambert93_natural_origin():
    e, n = conic.lcc_forward(np.array([3.0]), np.array([46.5]), conic.LAMBERT93)
    assert abs(e[0] - 700000.0) < 1e-6
    assert abs(n[0] - 6600000.0) < 1e-6


def test_lambert93_roundtrip():
    rng = np.random.default_rng(7)
    lon = -4.0 + 11.0 * rng.random(500)
    lat = 42.5 + 8.0 * rng.random(500)
    e, n = conic.lcc_forward(lon, lat, conic.LAMBERT93)
    lo, la = conic.lcc_inverse(e, n, conic.LAMBERT93)
    assert np.max(np.abs(lo - lon)) < 1e-11
    assert np.max(np.abs(la - lat)) < 1e-11


@pytest.mark.parametrize("phi", [44.0, 49.0])
def test_lambert93_unit_scale_on_standard_parallels(phi):
    # finite-difference scale along the parallel vs the ellipsoid's
    # parallel radius: k = dE / (nu * cos(phi) * dlam)
    d = 1e-6
    e0, n0 = conic.lcc_forward(np.array([3.0]), np.array([phi]), conic.LAMBERT93)
    e1, n1 = conic.lcc_forward(np.array([3.0 + d]), np.array([phi]), conic.LAMBERT93)
    dist = float(np.hypot(e1 - e0, n1 - n0))
    a, finv = conic.A_GRS80, conic.FINV_GRS80
    f = 1.0 / finv
    e2 = f * (2.0 - f)
    pr = np.radians(phi)
    nu = a / np.sqrt(1.0 - e2 * np.sin(pr) ** 2)
    k = dist / (nu * np.cos(pr) * np.radians(d))
    assert abs(k - 1.0) < 1e-6


def test_ps_north_pole_maps_to_false_origin():
    # t(90) = tan(0) * exp(...) = 0 exactly -> rho = 0 (no log in the
    # stereographic rho, so the pole itself is representable)
    e, n = conic.ps_forward(np.array([-45.0]), np.array([90.0]),
                            conic.NSIDC_NORTH)
    assert e[0] == 0.0 and n[0] == 0.0


def test_ps_roundtrip():
    rng = np.random.default_rng(8)
    lon = -180.0 + 360.0 * rng.random(500)
    lat = 61.0 + 27.0 * rng.random(500)
    e, n = conic.ps_forward(lon, lat, conic.NSIDC_NORTH)
    lo, la = conic.ps_inverse(e, n, conic.NSIDC_NORTH)
    dlon = (lo - lon + 180.0) % 360.0 - 180.0
    assert np.max(np.abs(dlon)) < 1e-11
    assert np.max(np.abs(la - lat)) < 1e-11


def test_ps_unit_scale_on_standard_parallel():
    d = 1e-6
    e0, n0 = conic.ps_forward(np.array([10.0]), np.array([70.0]), conic.NSIDC_NORTH)
    e1, n1 = conic.ps_forward(np.array([10.0 + d]), np.array([70.0]), conic.NSIDC_NORTH)
    dist = float(np.hypot(e1 - e0, n1 - n0))
    a, finv = conic.A_WGS84, conic.FINV_WGS84
    f = 1.0 / finv
    e2 = f * (2.0 - f)
    pr = np.radians(70.0)
    nu = a / np.sqrt(1.0 - e2 * np.sin(pr) ** 2)
    k = dist / (nu * np.cos(pr) * np.radians(d))
    assert abs(k - 1.0) < 1e-6


def test_reproject_udf_dispatch_no_pyproj(spark):
    from gdal_spark.operators import reproject

    df = spark.createDataFrame([(1, 3.0, 46.5), (2, 5.5, 44.2)],
                               "id bigint, lon double, lat double")
    out = reproject.reproject_udf(df, 4326, 2154).orderBy("id").collect()
    assert abs(out[0]["x_dst"] - 700000.0) < 1e-6
    assert abs(out[0]["y_dst"] - 6600000.0) < 1e-6
    # stereo + UTM dispatch both execute
    ps = reproject.reproject_udf(df, 4326, 3413, lon="lon", lat="lat")
    assert ps.count() == 2
    utm = reproject.reproject_udf(df, 4326, 32631)
    assert utm.count() == 2
