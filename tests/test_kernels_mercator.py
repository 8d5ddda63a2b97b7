"""Golden-value tests for the WebMercator/tile kernels.

Every expected value below is hand-derived from the reference formulas
(gdal2tiles.py:414-530), NOT from our implementation — so these tests
pin reference parity, including the ceil-1 boundary rule and the
TMS/XYZ flip.
"""
from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.kernels import mercator as M


def test_constants():
    assert M.ORIGIN_SHIFT == pytest.approx(20037508.342789244, abs=1e-6)
    assert float(M.resolution(0)) == pytest.approx(156543.03392804062, abs=1e-8)
    # resolution halves per zoom
    assert float(M.resolution(5)) == pytest.approx(156543.03392804062 / 32, abs=1e-9)


def test_latlon_to_meters_known_points():
    mx, my = M.lat_lon_to_meters(0.0, 0.0)
    assert float(mx) == 0.0
    assert abs(float(my)) < 1e-8  # ln(tan(45deg)) ~ 0 up to fp
    mx, my = M.lat_lon_to_meters(0.0, 180.0)
    assert float(mx) == pytest.approx(20037508.342789244)
    # top of the square world: my == ORIGIN_SHIFT
    mx, my = M.lat_lon_to_meters(M.MAX_LAT, 0.0)
    assert float(my) == pytest.approx(20037508.342789244, abs=1e-6)


def test_meters_roundtrip():
    rng = np.random.default_rng(42)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-M.MAX_LAT, M.MAX_LAT, 1000)
    mx, my = M.lat_lon_to_meters(lat, lon)
    lat2, lon2 = M.meters_to_lat_lon(mx, my)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_pixels_to_tile_ceil_minus_one_rule():
    # gdal2tiles.py:460-465: tile = ceil(px/256) - 1.  A pixel exactly on
    # the boundary (px = 256) belongs to the LOWER tile (index 0).
    tx, ty = M.pixels_to_tile(np.array([0.0, 255.9, 256.0, 256.1, 512.0]),
                              np.array([0.0, 0.0, 0.0, 0.0, 0.0]))
    assert tx.tolist() == [-1, 0, 0, 1, 1]
    # px=0 -> ceil(0)-1 = -1: the reference really returns -1 there
    # (callers clamp to the tminmax range, gdal2tiles.py:2426-2433).


def test_origin_tile_at_z1():
    # (lat,lon)=(0,0): mx=0 exactly -> px = OS/res(1) = 256.0 exactly
    # -> tx = ceil(1.0)-1 = 0 (boundary-to-lower rule).
    # my is ~-1e-9 (fp of ln(tan(pi/4))) -> py just under 256 -> ty=0.
    tx, ty = M.lat_lon_to_tile(0.0, 0.0, 1)
    assert int(tx) == 0 and int(ty) == 0
    # XYZ flip: ty_xyz = 2^1-1-0 = 1 (bottom-left quadrant in Google scheme)
    assert int(M.tms_to_xyz(int(ty), 1)) == 1


def test_tile_for_known_city():
    # Paris (48.8566, 2.3522) at z=10 in XYZ/Google scheme is tile
    # (524, 35219/343?) — derive: px = (mx+OS)/res(10);
    # mx = 2.3522*OS/180 = 261847.6;  res(10)=152.8740565703525
    # px = (20037508.34+261847.6)/152.874 = 132787.7 -> /256 = 518.7 -> tx=518
    # my = ln(tan((90+48.8566)pi/360))/(pi/180)*OS/180 = 6250962.1
    # py = (20037508.34+6250962.1)/152.874 = 171962.8 -> /256 = 671.7 -> ty_tms=671
    # ty_xyz = 1023-671 = 352  (well-known: Paris z10 x=518 y=352)
    tx, ty = M.lat_lon_to_tile(48.8566, 2.3522, 10)
    assert int(tx) == 518
    assert int(M.tms_to_xyz(int(ty), 10)) == 352


def test_tms_xyz_flip_involution():
    z = 7
    ty = np.arange(0, 2**z)
    np.testing.assert_array_equal(M.xyz_to_tms(M.tms_to_xyz(ty, z), z), ty)


def test_quadkey_bing_documented_example():
    # Bing maps documented example: XYZ tile (x=3, y=5, z=3) -> "213".
    ty_tms = (2**3 - 1) - 5  # our quadkey() takes TMS y and flips internally
    qk = M.quadkey(np.array([3]), np.array([ty_tms]), 3)
    assert qk[0] == "213"


def test_quadkey_z0_empty_and_prefix_property():
    assert M.quadkey(np.array([0]), np.array([0]), 0)[0] == ""
    # parent quadkey is the child's prefix: tile z3 (3, tms 2) -> z2 parent (1, tms 1)
    child = M.quadkey(np.array([3]), np.array([2]), 3)[0]
    parent = M.quadkey(np.array([1]), np.array([1]), 2)[0]
    assert child.startswith(parent)


def test_tile_bounds_inverse_of_assignment():
    # every point strictly inside a tile's bounds maps back to that tile
    rng = np.random.default_rng(7)
    z = 6
    txs = rng.integers(0, 2**z, 50)
    tys = rng.integers(0, 2**z, 50)
    minx, miny, maxx, maxy = M.tile_bounds(txs, tys, z)
    cx = (minx + maxx) / 2
    cy = (miny + maxy) / 2
    tx2, ty2 = M.meters_to_tile(cx, cy, z)
    np.testing.assert_array_equal(tx2, txs)
    np.testing.assert_array_equal(ty2, tys)


def test_zoom_for_pixel_size():
    # res(5)=4891.97: a pixel size of 5000 (coarser than z5, finer than z4)
    # -> first z with res < 5000 is 5, minus 1 -> 4  (gdal2tiles.py:503-508)
    assert M.zoom_for_pixel_size(5000.0) == 4
    assert M.zoom_for_pixel_size(1e9) == 0


def test_tile_range_clamped():
    # whole world at z2 -> full range with clamp (gdal2tiles.py:2426-2433)
    r = M.tile_range_for_extent(-M.ORIGIN_SHIFT, -M.ORIGIN_SHIFT,
                                M.ORIGIN_SHIFT, M.ORIGIN_SHIFT, 2)
    assert r == (0, 0, 3, 3)
