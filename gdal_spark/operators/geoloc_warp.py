"""Geolocation-array warp transformer (alg/gdalgeoloc.cpp): swath
imagery georeferenced by a (usually subsampled) per-pixel lon/lat grid
instead of an affine geotransform or RPCs.

Forward (pixel/line -> geoX/geoY) replicates
GDALGeoLoc::PixelLineToXY (gdalgeoloc.cpp:386-520) exactly for the
no-nodata, no-dateline case:

  glp = (pixel - PIXEL_OFFSET) / PIXEL_STEP - conv
  gll = (line  - LINE_OFFSET)  / LINE_STEP  - conv
    (conv = 0 when the geoloc origin is the top-left corner, 0.5 for
     pixel-center arrays — gdalgeoloc.cpp:600-604)
  iX = int(clamp(glp, 0, W-1)); iY likewise; then the reference's
  bilinear form X = (1-fy)*(X00 + fx*(X10-X00)) + fy*(X01 + fx*(X11-X01))
  with the last-column/row cells extrapolating from the PREVIOUS cell
  (iX--/iY--, fractional > 1 — the "infinite extension beyond borders"
  comment, gdalgeoloc.cpp:455-500).

Inverse: the reference rasterizes a backmap grid then refines
(GenerateBackMap + GDAL_GEOLOC_USE_MAX_ACCURACY). This engine inverts
the SAME continuous bilinear surface directly: affine seed from the
grid corners, then a fixed number of 2D Newton steps on the local quad
(exactly the accuracy the reference's max-accuracy refinement targets,
without materializing the backmap). Valid for monotone swath grids
(the common case); non-monotone grids would need the quadtree path.

Scale shape: the geoloc grid is SMALL (subsampled, a few MB even for a
100k-line swath) — it broadcasts inside the UDF closure; points ship
16 bytes each through Arrow.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class GeoLocArray:
    def __init__(self, glx: np.ndarray, gly: np.ndarray, *,
                 pixel_offset: float = 0.0, pixel_step: float = 1.0,
                 line_offset: float = 0.0, line_step: float = 1.0,
                 origin_top_left_corner: bool = False):
        assert glx.shape == gly.shape and glx.ndim == 2
        self.glx = np.asarray(glx, dtype=np.float64)
        self.gly = np.asarray(gly, dtype=np.float64)
        self.pixel_offset = float(pixel_offset)
        self.pixel_step = float(pixel_step)
        self.line_offset = float(line_offset)
        self.line_step = float(line_step)
        self.conv = 0.0 if origin_top_left_corner else 0.5


def _corners(g: GeoLocArray, ix, iy):
    H, W = g.glx.shape
    # last-column/row: extrapolate from the previous cell
    ix = np.where(ix >= W - 1, W - 2, ix)
    iy = np.where(iy >= H - 1, H - 2, iy)
    ix = np.maximum(ix, 0)
    iy = np.maximum(iy, 0)
    return ix, iy


def geoloc_forward(g: GeoLocArray, pixel, line):
    """(pixel, line) -> (geoX, geoY), gdalgeoloc.cpp PixelLineToXY."""
    px = np.asarray(pixel, dtype=np.float64)
    py = np.asarray(line, dtype=np.float64)
    H, W = g.glx.shape
    glp = (px - g.pixel_offset) / g.pixel_step - g.conv
    gll = (py - g.line_offset) / g.line_step - g.conv
    ix0 = np.clip(glp, 0.0, W - 1).astype(np.int64)
    iy0 = np.clip(gll, 0.0, H - 1).astype(np.int64)
    ix, iy = _corners(g, ix0, iy0)
    fx = glp - ix
    fy = gll - iy
    x00 = g.glx[iy, ix]
    x10 = g.glx[iy, ix + 1]
    x01 = g.glx[iy + 1, ix]
    x11 = g.glx[iy + 1, ix + 1]
    y00 = g.gly[iy, ix]
    y10 = g.gly[iy, ix + 1]
    y01 = g.gly[iy + 1, ix]
    y11 = g.gly[iy + 1, ix + 1]
    gx = (1 - fy) * (x00 + fx * (x10 - x00)) + fy * (x01 + fx * (x11 - x01))
    gy = (1 - fy) * (y00 + fx * (y10 - y00)) + fy * (y01 + fx * (y11 - y01))
    return gx, gy


def geoloc_inverse(g: GeoLocArray, geo_x, geo_y, *, n_iter: int = 8):
    """(geoX, geoY) -> (pixel, line): affine seed + fixed Newton steps
    on the continuous bilinear surface (deterministic, vectorized)."""
    gx = np.asarray(geo_x, dtype=np.float64)
    gy = np.asarray(geo_y, dtype=np.float64)
    H, W = g.glx.shape
    # affine seed from the grid corner span
    x00, y00 = g.glx[0, 0], g.gly[0, 0]
    dxp = (g.glx[0, -1] - x00) / (W - 1)
    dxl = (g.glx[-1, 0] - x00) / (H - 1)
    dyp = (g.gly[0, -1] - y00) / (W - 1)
    dyl = (g.gly[-1, 0] - y00) / (H - 1)
    det = dxp * dyl - dxl * dyp
    glp = ((gx - x00) * dyl - (gy - y00) * dxl) / det
    gll = ((gy - y00) * dxp - (gx - x00) * dyp) / det
    for _ in range(n_iter):
        ix0 = np.clip(glp, 0.0, W - 1).astype(np.int64)
        iy0 = np.clip(gll, 0.0, H - 1).astype(np.int64)
        ix, iy = _corners(g, ix0, iy0)
        fx = glp - ix
        fy = gll - iy
        x00_ = g.glx[iy, ix]
        x10 = g.glx[iy, ix + 1]
        x01 = g.glx[iy + 1, ix]
        x11 = g.glx[iy + 1, ix + 1]
        y00_ = g.gly[iy, ix]
        y10 = g.gly[iy, ix + 1]
        y01 = g.gly[iy + 1, ix]
        y11 = g.gly[iy + 1, ix + 1]
        bx = (1 - fy) * (x00_ + fx * (x10 - x00_)) \
            + fy * (x01 + fx * (x11 - x01))
        by = (1 - fy) * (y00_ + fx * (y10 - y00_)) \
            + fy * (y01 + fx * (y11 - y01))
        # local Jacobian of the bilinear surface
        jxp = (1 - fy) * (x10 - x00_) + fy * (x11 - x01)
        jxl = (x01 + fx * (x11 - x01)) - (x00_ + fx * (x10 - x00_))
        jyp = (1 - fy) * (y10 - y00_) + fy * (y11 - y01)
        jyl = (y01 + fx * (y11 - y01)) - (y00_ + fx * (y10 - y00_))
        jd = jxp * jyl - jxl * jyp
        glp = glp - ((bx - gx) * jyl - (by - gy) * jxl) / jd
        gll = gll - ((by - gy) * jxp - (bx - gx) * jyp) / jd
    pixel = (glp + g.conv) * g.pixel_step + g.pixel_offset
    line = (gll + g.conv) * g.line_step + g.line_offset
    return pixel, line


def apply_geoloc_forward(df: DataFrame, g: GeoLocArray,
                         pixel: str = "pixel",
                         line: str = "line") -> DataFrame:
    """Adds (geo_x, geo_y). The grid rides the UDF closure (broadcast
    once per executor)."""

    @F.pandas_udf("struct<geo_x:double, geo_y:double>")
    def _fwd(p: pd.Series, l: pd.Series) -> pd.DataFrame:
        x, y = geoloc_forward(g, p.to_numpy(), l.to_numpy())
        return pd.DataFrame({"geo_x": x, "geo_y": y})

    res = df.withColumn("_g", _fwd(F.col(pixel), F.col(line)))
    return res.withColumn("geo_x", F.col("_g.geo_x")).withColumn(
        "geo_y", F.col("_g.geo_y")).drop("_g")


def apply_geoloc_inverse(df: DataFrame, g: GeoLocArray,
                         geo_x: str = "geo_x",
                         geo_y: str = "geo_y") -> DataFrame:
    """Adds (pixel, line)."""

    @F.pandas_udf("struct<pixel:double, line:double>")
    def _inv(x: pd.Series, y: pd.Series) -> pd.DataFrame:
        p, l = geoloc_inverse(g, x.to_numpy(), y.to_numpy())
        return pd.DataFrame({"pixel": p, "line": l})

    res = df.withColumn("_pl", _inv(F.col(geo_x), F.col(geo_y)))
    return res.withColumn("pixel", F.col("_pl.pixel")).withColumn(
        "line", F.col("_pl.line")).drop("_pl")


# ------------------------------------------------------------- fixture

GRID_W, GRID_H = 64, 48
PIXEL_STEP = 16.0
LINE_STEP = 16.0

GLX_SQL = "(-120.0 + 0.01 * CAST({i} AS DOUBLE) + 0.002 * sin(0.15 * CAST({j} AS DOUBLE) + 0.3))"
GLY_SQL = "(35.0 + 0.008 * CAST({j} AS DOUBLE) + 0.0015 * sin(0.11 * CAST({i} AS DOUBLE) + 0.7))"


def swath_fixture() -> GeoLocArray:
    """Deterministic curved-swath geoloc grid (monotone, gentle sin
    curvature — the shape L1 swath geolocation arrays have). The SQL
    twin recomputes the identical closed form per corner."""
    i = np.arange(GRID_W, dtype=np.float64)[None, :]
    j = np.arange(GRID_H, dtype=np.float64)[:, None]
    glx = -120.0 + 0.01 * i + 0.002 * np.sin(0.15 * j + 0.3)
    gly = 35.0 + 0.008 * j + 0.0015 * np.sin(0.11 * i + 0.7)
    glx, gly = np.broadcast_arrays(glx, gly)
    return GeoLocArray(np.ascontiguousarray(glx), np.ascontiguousarray(gly),
                       pixel_step=PIXEL_STEP, line_step=LINE_STEP)


def swath_forward_sql(src: str, *, pixel: str = "px", line: str = "py",
                      keep: str = "id") -> str:
    """DuckDB CTE chain replaying geoloc_forward over the swath
    fixture: corner values recomputed closed-form from (iX, iY).
    Final CTE `geoloc_fwd` (keep, geo_x, geo_y)."""
    conv = "0.5"
    W, H = GRID_W, GRID_H

    def glx(i, j):
        return GLX_SQL.format(i=i, j=j)

    def gly(i, j):
        return GLY_SQL.format(i=i, j=j)

    return f"""
gl0 AS (
  SELECT {keep},
         ({pixel}) / {PIXEL_STEP!r} - {conv} AS glp,
         ({line}) / {LINE_STEP!r} - {conv} AS gll
  FROM {src}
),
gl1 AS (
  SELECT {keep}, glp, gll,
         CAST(floor(least(greatest(glp, 0.0), {float(W - 1)!r})) AS BIGINT) AS ix0,
         CAST(floor(least(greatest(gll, 0.0), {float(H - 1)!r})) AS BIGINT) AS iy0
  FROM gl0
),
gl2 AS (
  SELECT {keep}, glp, gll,
         greatest(CASE WHEN ix0 >= {W - 1} THEN {W - 2} ELSE ix0 END, 0) AS ix,
         greatest(CASE WHEN iy0 >= {H - 1} THEN {H - 2} ELSE iy0 END, 0) AS iy
  FROM gl1
),
gl3 AS (
  SELECT {keep}, glp - ix AS fx, gll - iy AS fy,
         {glx('ix', 'iy')} AS x00, {glx('ix + 1', 'iy')} AS x10,
         {glx('ix', 'iy + 1')} AS x01, {glx('ix + 1', 'iy + 1')} AS x11,
         {gly('ix', 'iy')} AS y00, {gly('ix + 1', 'iy')} AS y10,
         {gly('ix', 'iy + 1')} AS y01, {gly('ix + 1', 'iy + 1')} AS y11
  FROM gl2
),
geoloc_fwd AS (
  SELECT {keep},
         (1.0 - fy) * (x00 + fx * (x10 - x00)) + fy * (x01 + fx * (x11 - x01)) AS geo_x,
         (1.0 - fy) * (y00 + fx * (y10 - y00)) + fy * (y01 + fx * (y11 - y01)) AS geo_y
  FROM gl3
)"""


def swath_inverse_sql(src: str, *, geo_x: str = "gx", geo_y: str = "gy",
                      keep: str = "id", n_iter: int = 8) -> str:
    """DuckDB CTE chain replaying geoloc_inverse over the swath
    fixture: the affine seed's span coefficients are Python-computed
    literals (exactly the numpy values), each Newton step re-derives
    the four corner values closed-form and applies the same Jacobian
    update. Final CTE `geoloc_inv` (keep, pixel, line)."""
    g = swath_fixture()
    W, H = GRID_W, GRID_H
    x00, y00 = g.glx[0, 0], g.gly[0, 0]
    dxp = (g.glx[0, -1] - x00) / (W - 1)
    dxl = (g.glx[-1, 0] - x00) / (H - 1)
    dyp = (g.gly[0, -1] - y00) / (W - 1)
    dyl = (g.gly[-1, 0] - y00) / (H - 1)
    det = dxp * dyl - dxl * dyp

    def glx(i, j):
        return GLX_SQL.format(i=i, j=j)

    def gly(i, j):
        return GLY_SQL.format(i=i, j=j)

    parts = [f"""
gin0 AS (
  SELECT {keep}, ({geo_x}) AS gx, ({geo_y}) AS gy,
         ((({geo_x}) - {x00!r}) * {dyl!r} - (({geo_y}) - {y00!r}) * {dxl!r})
           / {det!r} AS glp,
         ((({geo_y}) - {y00!r}) * {dxp!r} - (({geo_x}) - {x00!r}) * {dyp!r})
           / {det!r} AS gll
  FROM {src}
)"""]
    for i in range(n_iter):
        parts.append(f"""
gin_a{i} AS (
  SELECT {keep}, gx, gy, glp, gll,
         CAST(floor(least(greatest(glp, 0.0), {float(W - 1)!r})) AS BIGINT) AS ix0,
         CAST(floor(least(greatest(gll, 0.0), {float(H - 1)!r})) AS BIGINT) AS iy0
  FROM gin{i}
),
gin_b{i} AS (
  SELECT {keep}, gx, gy, glp, gll,
         greatest(CASE WHEN ix0 >= {W - 1} THEN {W - 2} ELSE ix0 END, 0) AS ix,
         greatest(CASE WHEN iy0 >= {H - 1} THEN {H - 2} ELSE iy0 END, 0) AS iy
  FROM gin_a{i}
),
gin_c{i} AS (
  SELECT {keep}, gx, gy, glp, gll, glp - ix AS fx, gll - iy AS fy,
         {glx('ix', 'iy')} AS x00, {glx('ix + 1', 'iy')} AS x10,
         {glx('ix', 'iy + 1')} AS x01, {glx('ix + 1', 'iy + 1')} AS x11,
         {gly('ix', 'iy')} AS y00, {gly('ix + 1', 'iy')} AS y10,
         {gly('ix', 'iy + 1')} AS y01, {gly('ix + 1', 'iy + 1')} AS y11
  FROM gin_b{i}
),
gin_d{i} AS (
  SELECT {keep}, gx, gy, glp, gll,
         (1.0 - fy) * (x00 + fx * (x10 - x00))
           + fy * (x01 + fx * (x11 - x01)) AS bx,
         (1.0 - fy) * (y00 + fx * (y10 - y00))
           + fy * (y01 + fx * (y11 - y01)) AS by,
         (1.0 - fy) * (x10 - x00) + fy * (x11 - x01) AS jxp,
         (x01 + fx * (x11 - x01)) - (x00 + fx * (x10 - x00)) AS jxl,
         (1.0 - fy) * (y10 - y00) + fy * (y11 - y01) AS jyp,
         (y01 + fx * (y11 - y01)) - (y00 + fx * (y10 - y00)) AS jyl
  FROM gin_c{i}
),
gin{i + 1} AS (
  SELECT {keep}, gx, gy,
         glp - ((bx - gx) * jyl - (by - gy) * jxl)
               / (jxp * jyl - jxl * jyp) AS glp,
         gll - ((by - gy) * jxp - (bx - gx) * jyp)
               / (jxp * jyl - jxl * jyp) AS gll
  FROM gin_d{i}
)""")
    parts.append(f"""
geoloc_inv AS (
  SELECT {keep},
         (glp + 0.5) * {PIXEL_STEP!r} AS pixel,
         (gll + 0.5) * {LINE_STEP!r} AS line
  FROM gin{n_iter}
)""")
    return ",".join(p.strip() for p in parts)
