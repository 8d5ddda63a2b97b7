"""Global WebMercator tile math — numpy port of the reference formulas.

Reference: /root/reference/swig/python/gdal-utils/osgeo_utils/gdal2tiles.py
(GlobalMercator, lines 414-530).  All functions are vectorized over numpy
arrays and are also used as the single-node oracle for the Spark column
expressions in gdal_spark.functions.tiles.

Semantics pinned from the reference:
- originShift = 2*pi*6378137/2 = 20037508.342789244  (gdal2tiles.py:421)
- initialResolution = 2*pi*6378137/tile_size          (gdal2tiles.py:417)
- PixelsToTile uses ceil(px/tile_size) - 1, NOT floor  (gdal2tiles.py:463-465)
  -> a point exactly on a tile boundary belongs to the LOWER tile.
- TMS->XYZ (Google) flip: ty_xyz = 2^z - 1 - ty_tms    (gdal2tiles.py:513)
- Quadkey: Bing-style interleave of (tx, flipped ty), MSB first
  (gdal2tiles.py:517-530).
"""

from __future__ import annotations

import numpy as np

R_EARTH = 6378137.0
ORIGIN_SHIFT = 2.0 * np.pi * R_EARTH / 2.0  # 20037508.342789244
TILE_SIZE = 256
INITIAL_RESOLUTION = 2.0 * np.pi * R_EARTH / TILE_SIZE  # 156543.03392804062
MAXZOOMLEVEL = 32

# Latitude limit of the square WebMercator world.
MAX_LAT = 85.05112877980659


def lat_lon_to_meters(lat, lon):
    """WGS84 lat/lon -> spherical mercator meters (gdal2tiles.py:422-430)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    mx = lon * ORIGIN_SHIFT / 180.0
    my = np.log(np.tan((90.0 + lat) * np.pi / 360.0)) / (np.pi / 180.0)
    my = my * ORIGIN_SHIFT / 180.0
    return mx, my


def meters_to_lat_lon(mx, my):
    """Inverse mercator (gdal2tiles.py:432-443)."""
    mx = np.asarray(mx, dtype=np.float64)
    my = np.asarray(my, dtype=np.float64)
    lon = (mx / ORIGIN_SHIFT) * 180.0
    lat = (my / ORIGIN_SHIFT) * 180.0
    lat = 180.0 / np.pi * (2.0 * np.arctan(np.exp(lat * np.pi / 180.0)) - np.pi / 2.0)
    return lat, lon


def resolution(zoom, tile_size: int = TILE_SIZE):
    """Meters/pixel at equator for a zoom (gdal2tiles.py:497-500)."""
    init = 2.0 * np.pi * R_EARTH / tile_size
    return init / (2.0 ** np.asarray(zoom, dtype=np.float64))


def meters_to_pixels(mx, my, zoom, tile_size: int = TILE_SIZE):
    """Mercator meters -> global pixel coords at zoom (gdal2tiles.py:452-458)."""
    res = resolution(zoom, tile_size)
    px = (np.asarray(mx, dtype=np.float64) + ORIGIN_SHIFT) / res
    py = (np.asarray(my, dtype=np.float64) + ORIGIN_SHIFT) / res
    return px, py


def pixels_to_tile(px, py, tile_size: int = TILE_SIZE):
    """Pixel -> tile index: ceil(px/size)-1, the reference's boundary rule
    (gdal2tiles.py:460-465)."""
    tx = (np.ceil(np.asarray(px, dtype=np.float64) / float(tile_size)) - 1).astype(np.int64)
    ty = (np.ceil(np.asarray(py, dtype=np.float64) / float(tile_size)) - 1).astype(np.int64)
    return tx, ty


def meters_to_tile(mx, my, zoom, tile_size: int = TILE_SIZE):
    px, py = meters_to_pixels(mx, my, zoom, tile_size)
    return pixels_to_tile(px, py, tile_size)


def lat_lon_to_tile(lat, lon, zoom, tile_size: int = TILE_SIZE):
    """lat/lon -> TMS tile index at zoom."""
    mx, my = lat_lon_to_meters(lat, lon)
    return meters_to_tile(mx, my, zoom, tile_size)


def tile_bounds(tx, ty, zoom, tile_size: int = TILE_SIZE):
    """TMS tile -> mercator envelope (minx,miny,maxx,maxy) (gdal2tiles.py:479-486)."""
    res = resolution(zoom, tile_size)
    tx = np.asarray(tx, dtype=np.float64)
    ty = np.asarray(ty, dtype=np.float64)
    minx = tx * tile_size * res - ORIGIN_SHIFT
    miny = ty * tile_size * res - ORIGIN_SHIFT
    maxx = (tx + 1) * tile_size * res - ORIGIN_SHIFT
    maxy = (ty + 1) * tile_size * res - ORIGIN_SHIFT
    return minx, miny, maxx, maxy


def tms_to_xyz(ty, zoom):
    """TMS -> XYZ/Google row flip (gdal2tiles.py:511-514)."""
    return (2 ** np.asarray(zoom, dtype=np.int64) - 1) - np.asarray(ty, dtype=np.int64)


# XYZ -> TMS is the same involution.
xyz_to_tms = tms_to_xyz


def quadkey(tx, ty_tms, zoom: int):
    """TMS tile -> Bing quadkey string (gdal2tiles.py:517-530).

    Vectorized: returns numpy array of strings of length `zoom`
    (z=0 -> empty string, like the reference).
    """
    tx = np.asarray(tx, dtype=np.int64)
    ty = (2**zoom - 1) - np.asarray(ty_tms, dtype=np.int64)
    n = tx.shape[0] if tx.ndim else 1
    digits = np.zeros((int(np.atleast_1d(tx).shape[0]), max(zoom, 1)), dtype=np.int64)
    txa = np.atleast_1d(tx)
    tya = np.atleast_1d(ty)
    for pos, i in enumerate(range(zoom, 0, -1)):
        mask = 1 << (i - 1)
        digits[:, pos] = ((txa & mask) != 0).astype(np.int64) + 2 * ((tya & mask) != 0).astype(np.int64)
    if zoom == 0:
        return np.array([""] * len(txa), dtype=object)
    out = np.empty(len(txa), dtype=object)
    for r in range(len(txa)):
        out[r] = "".join(str(d) for d in digits[r, :zoom])
    return out


def zoom_for_pixel_size(pixel_size: float, tile_size: int = TILE_SIZE) -> int:
    """First zoom whose resolution < pixelSize, minus one (gdal2tiles.py:503-508)."""
    for i in range(MAXZOOMLEVEL):
        if pixel_size > float(resolution(i, tile_size)):
            return max(0, i - 1)
    return MAXZOOMLEVEL - 1


def tile_range_for_extent(ominx, ominy, omaxx, omaxy, zoom, tile_size: int = TILE_SIZE):
    """Per-zoom tile min/max for a mercator extent with the reference's
    clamp to [0, 2^z - 1] (gdal2tiles.py:2426-2433)."""
    tminx, tminy = meters_to_tile(ominx, ominy, zoom, tile_size)
    tmaxx, tmaxy = meters_to_tile(omaxx, omaxy, zoom, tile_size)
    lim = 2**zoom - 1
    clamp = lambda v: int(min(max(int(v), 0), lim))
    return clamp(tminx), clamp(tminy), clamp(tmaxx), clamp(tmaxy)
