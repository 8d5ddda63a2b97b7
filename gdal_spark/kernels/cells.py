"""Quadkey-based cell index provider (H3/S2-style API, dependency-free).

The cell grid IS the WebMercator tile grid of gdal_spark.kernels.mercator
(reference formulas: gdal2tiles.py:414-530).  A cell at resolution `res`
is the XYZ tile (z=res, x=tx, y=ty_xyz) packed into one int64:

    cell_id = (1 << (2*res)) | (tx << res) | ty_xyz

The leading 1-bit encodes the resolution unambiguously (same trick as
S2's level encoding).  The pack is row-major (cheap: two shifts — keeps
the Spark column expression small enough for whole-stage codegen; a
Z-order interleave here blew the JVM 64KB codegen method limit).  For
spatial range partitioning use zorder_code(), the Z-order curve key
(the analog of the reference's quadtree index,
/root/reference/port/cpl_quad_tree.cpp), or the quadkey string prefix.

API: cell(lat, lon, res) / k_ring(cell, k) / cell_to_zxy / polygon_cover.
If an `h3` wheel is ever present it could be swapped in behind the same
API, but all tests and oracles run on this built-in provider.
"""

from __future__ import annotations

import numpy as np

from . import mercator


def _interleave16(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of v so they occupy even bit positions."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def pack_cell(tx, ty_xyz, res: int) -> np.ndarray:
    """(tx, ty_xyz, res) -> int64 cell id (row-major packed)."""
    tx = np.asarray(tx, dtype=np.int64)
    ty = np.asarray(ty_xyz, dtype=np.int64)
    marker = np.int64(1) << np.int64(2 * res)
    return marker | (tx << np.int64(res)) | ty


def unpack_cell(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell id -> (tx, ty_xyz, res)."""
    c = np.asarray(cell, dtype=np.int64)
    # resolution = floor(position of highest set bit / 2)
    nbits = np.zeros(c.shape, dtype=np.int64)
    tmp = c.copy()
    for _ in range(64):
        higher = tmp > 1
        if not higher.any():
            break
        nbits[higher] += 1
        tmp[higher] >>= 1
    res = nbits // 2
    code = c - (np.int64(1) << (2 * res))
    tx = code >> res
    ty = code & ((np.int64(1) << res) - 1)
    return tx, ty, res


def zorder_code(tx, ty_xyz) -> np.ndarray:
    """Z-order (Morton) key for spatial range partitioning: interleaved
    bits of (tx, ty) — neighbors share prefixes, so repartitionByRange
    on this key co-locates spatial neighbors across executors."""
    tx = np.asarray(tx, dtype=np.int64)
    ty = np.asarray(ty_xyz, dtype=np.int64)
    return (_interleave16(tx) | (_interleave16(ty) << np.uint64(1))).astype(np.int64)


def cell(lat, lon, res: int) -> np.ndarray:
    """lat/lon -> cell id at resolution `res` (XYZ tile at z=res)."""
    tx, ty_tms = mercator.lat_lon_to_tile(lat, lon, res)
    lim = 2**res - 1
    tx = np.clip(tx, 0, lim)
    ty_xyz = np.clip(mercator.tms_to_xyz(ty_tms, res), 0, lim)
    return pack_cell(tx, ty_xyz, res)


def k_ring(cell_id: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance k (clamped to the grid)."""
    tx, ty, res = unpack_cell(np.asarray([cell_id]))
    tx, ty, res = int(tx[0]), int(ty[0]), int(res[0])
    lim = 2**res - 1
    xs0 = max(0, tx - k)
    xs1 = min(lim, tx + k)
    ys0 = max(0, ty - k)
    ys1 = min(lim, ty + k)
    gx, gy = np.meshgrid(np.arange(xs0, xs1 + 1), np.arange(ys0, ys1 + 1))
    return pack_cell(gx.ravel(), gy.ravel(), res)


def ring_only(tx: int, ty: int, res: int, k: int) -> list[tuple[int, int]]:
    """Cells at Chebyshev distance EXACTLY k (the expansion front of the
    reference's grow-the-search-radius loop, alg/gdalgrid.cpp:896-909)."""
    lim = 2**res - 1
    if k == 0:
        return [(tx, ty)] if 0 <= tx <= lim and 0 <= ty <= lim else []
    out = []
    for dx in range(-k, k + 1):
        for dy in (-k, k):
            x, y = tx + dx, ty + dy
            if 0 <= x <= lim and 0 <= y <= lim:
                out.append((x, y))
    for dy in range(-k + 1, k):
        for dx in (-k, k):
            x, y = tx + dx, ty + dy
            if 0 <= x <= lim and 0 <= y <= lim:
                out.append((x, y))
    return out


def polygon_cover(ring_xy: np.ndarray, res: int) -> np.ndarray:
    """Covering cell set of a polygon ring at resolution `res`.

    bbox-based cover (the analog of the reference's spatial-filter bbox
    stage, ogrlayer.cpp:2253-2325): every cell whose tile square
    intersects the polygon's envelope.  Candidates are then refined by
    the exact PIP stage after the cell join, so over-coverage only costs
    performance, never correctness.
    """
    ring = np.asarray(ring_xy, dtype=np.float64)
    lim = 2**res - 1
    minx, miny = ring.min(axis=0)
    maxx, maxy = ring.max(axis=0)
    # clamp to mercator world
    minx = max(minx, -179.9999999)
    maxx = min(maxx, 179.9999999)
    miny = max(miny, -mercator.MAX_LAT)
    maxy = min(maxy, mercator.MAX_LAT)
    tx0, ty0_tms = mercator.lat_lon_to_tile(np.float64(miny), np.float64(minx), res)
    tx1, ty1_tms = mercator.lat_lon_to_tile(np.float64(maxy), np.float64(maxx), res)
    tx0 = int(np.clip(tx0, 0, lim)); tx1 = int(np.clip(tx1, 0, lim))
    ty0 = int(np.clip(mercator.tms_to_xyz(ty0_tms, res), 0, lim))
    ty1 = int(np.clip(mercator.tms_to_xyz(ty1_tms, res), 0, lim))
    if ty0 > ty1:
        ty0, ty1 = ty1, ty0
    gx, gy = np.meshgrid(np.arange(tx0, tx1 + 1), np.arange(ty0, ty1 + 1))
    return pack_cell(gx.ravel(), gy.ravel(), res)


def cover_count(ring_xy: np.ndarray, res: int) -> int:
    """Size of polygon_cover's bbox mesh WITHOUT materializing it —
    O(1) from the clamped tile ranges (a world-spanning ring at res 14
    would otherwise meshgrid ~1e8 cells just to be counted)."""
    ring = np.asarray(ring_xy, dtype=np.float64)
    lim = 2**res - 1
    minx = max(ring[:, 0].min(), -179.9999999)
    maxx = min(ring[:, 0].max(), 179.9999999)
    miny = max(ring[:, 1].min(), -mercator.MAX_LAT)
    maxy = min(ring[:, 1].max(), mercator.MAX_LAT)
    tx0, ty0_tms = mercator.lat_lon_to_tile(np.float64(miny), np.float64(minx), res)
    tx1, ty1_tms = mercator.lat_lon_to_tile(np.float64(maxy), np.float64(maxx), res)
    tx0 = int(np.clip(tx0, 0, lim)); tx1 = int(np.clip(tx1, 0, lim))
    ty0 = int(np.clip(mercator.tms_to_xyz(ty0_tms, res), 0, lim))
    ty1 = int(np.clip(mercator.tms_to_xyz(ty1_tms, res), 0, lim))
    if ty0 > ty1:
        ty0, ty1 = ty1, ty0
    return (tx1 - tx0 + 1) * (ty1 - ty0 + 1)


def cover_resolution(ring_xy: np.ndarray, max_cells: int = 64, max_res: int = 14) -> int:
    """Pick the finest resolution whose bbox cover stays under max_cells.
    Mirrors how the reference picks pyramid depth from extent
    (gdal2tiles ZoomForPixelSize semantics, gdal2tiles.py:503-508).
    Uses the O(1) cover_count — never materializes the mesh."""
    for res in range(max_res, -1, -1):
        if cover_count(ring_xy, res) <= max_cells:
            return res
    return 0
