"""Tests for the quadkey-grid cell index (H3/S2-style API over the
reference tile grid)."""
from __future__ import annotations

import numpy as np

from gdal_spark.kernels import cells, mercator
from gdal_spark.sources import derive


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(3)
    for res in (0, 1, 5, 9, 14):
        lim = 2**res
        tx = rng.integers(0, lim, 200)
        ty = rng.integers(0, lim, 200)
        c = cells.pack_cell(tx, ty, res)
        tx2, ty2, r2 = cells.unpack_cell(c)
        np.testing.assert_array_equal(tx2, tx)
        np.testing.assert_array_equal(ty2, ty)
        assert (r2 == res).all()


def test_cell_ids_unique_across_resolutions():
    # marker bit makes (0,0,z) distinct for every z
    ids = {int(cells.pack_cell(np.array([0]), np.array([0]), r)[0]) for r in range(15)}
    assert len(ids) == 15


def test_cell_matches_tile_math():
    i = np.arange(5000)
    lon = derive.lon_np(i)
    lat = derive.lat_np(i)
    res = 7
    c = cells.cell(lat, lon, res)
    tx, ty, r = cells.unpack_cell(c)
    etx, ety_tms = mercator.lat_lon_to_tile(lat, lon, res)
    ety = mercator.tms_to_xyz(ety_tms, res)
    np.testing.assert_array_equal(tx, np.clip(etx, 0, 2**res - 1))
    np.testing.assert_array_equal(ty, np.clip(ety, 0, 2**res - 1))


def test_k_ring_counts_and_membership():
    c = int(cells.cell(np.array([10.0]), np.array([20.0]), 6)[0])
    ring0 = cells.k_ring(c, 0)
    assert ring0.tolist() == [c]
    ring1 = cells.k_ring(c, 1)
    assert len(ring1) == 9 and c in ring1.tolist()
    ring2 = cells.k_ring(c, 2)
    assert len(ring2) == 25


def test_k_ring_clamped_at_grid_edge():
    corner = int(cells.pack_cell(np.array([0]), np.array([0]), 4)[0])
    assert len(cells.k_ring(corner, 1)) == 4  # 2x2 survives the clamp


def test_ring_only_is_ring_frontier():
    tx, ty, res = 8, 8, 5
    full = {(x, y) for k in range(3) for (x, y) in cells.ring_only(tx, ty, res, k)}
    sq = {(x, y) for x in range(6, 11) for y in range(6, 11)}
    assert full == sq
    assert len(cells.ring_only(tx, ty, res, 2)) == 16  # perimeter of 5x5


def test_zorder_locality():
    # adjacent cells differ in few leading bits: check monotone blocks
    tx = np.array([0, 1, 0, 1])
    ty = np.array([0, 0, 1, 1])
    z = cells.zorder_code(tx, ty)
    assert z.tolist() == [0, 1, 2, 3]  # textbook Morton order


def test_polygon_cover_contains_polygon_points():
    ring = derive.polygon_ring_np(27)
    cover = set(cells.polygon_cover(ring, 6).tolist())
    # every vertex's cell is in the cover
    for x, y in ring:
        c = int(cells.cell(np.array([y]), np.array([x]), 6)[0])
        assert c in cover


def test_cover_resolution_bounded():
    ring = derive.polygon_ring_np(5)
    res = cells.cover_resolution(ring, max_cells=64)
    assert len(cells.polygon_cover(ring, res)) <= 64
    assert res > 0
