"""Deterministic, cross-engine-reproducible derivations.

Geometry (lon/lat), polygons and tile indices are pure integer/double
functions of row ids, so ANY scale regenerates identically with no data
files — and the SAME formulas can be emitted as ANSI SQL that DuckDB
evaluates bit-for-bit identically (verified: int64 %,*,+ and double
+,-,*,/ are exact IEEE ops in both engines).

This is the analog of the reference's fixture strategy (small synthetic
layers with known values, /root/reference/autotest/ogr/ogr_sql_test.py)
scaled to any row count.

Derivation: quadratic-mixed hash in int64. A pure LCG is AFFINE in the
id, which puts points on a lattice of diagonal lines (measured corr
-0.5 between lon and lat, whole map regions empty) — the squaring
rounds add the nonlinearity (mid-square family) while every
intermediate stays < 2^62, so int64 +,*,% reproduce bit-for-bit in any
engine (verified: 16x16 occupancy chi2 ~ 230 on 255 dof, corr 0.001):
    i0 = i % 2^31                            (pre-reduce: i*A must not
    h1 = (i0*A + salt*16807 + 12345) % 2^31   overflow int64 at 10^12 ids)
    h2 = (h1*h1 + h1) % 2^31
    h3 = (h2*A + i0 + salt) % 2^31
    h4 = (h3*h3 + h2) % 2^31
    hash01 = h4 / 2^31                       in [0, 1)
    lon = -180 + 360*hash01(id, 1)
    lat = -85.05 + 170.1*hash01(id, 2)       (inside mercator world)
"""

from __future__ import annotations

import numpy as np

M31 = 2147483648  # 2^31
A = 1103515245

SALT_LON = 1
SALT_LAT = 2
SALT_POLY_FX = 101
SALT_POLY_FY = 102
SALT_POLY_PHASE = 103

ORIGIN_SHIFT_SQL = "20037508.342789244"


# ---------------------------------------------------------------- numpy side

def hash01_np(i, salt: int) -> np.ndarray:
    i0 = np.asarray(i, dtype=np.int64) % M31
    h1 = (i0 * A + salt * 16807 + 12345) % M31
    h2 = (h1 * h1 + h1) % M31
    h3 = (h2 * A + i0 + salt) % M31
    h4 = (h3 * h3 + h2) % M31
    return h4.astype(np.float64) / np.float64(M31)


def lon_np(i) -> np.ndarray:
    return -180.0 + 360.0 * hash01_np(i, SALT_LON)


def lat_np(i) -> np.ndarray:
    return -85.05 + 170.1 * hash01_np(i, SALT_LAT)


# ----------------------------------------------------------------- SQL side
# Fragments valid in BOTH Spark SQL and DuckDB (ANSI subset).

def hash01_sql(expr: str, salt: int) -> str:
    """Identical int64 op sequence as hash01_np, ANSI SQL (DuckDB)."""
    i0 = f"(({expr})%{M31})"
    h1 = f"(({i0}*{A}+{salt * 16807 + 12345})%{M31})"
    h2 = f"(({h1}*{h1}+{h1})%{M31})"
    h3 = f"(({h2}*{A}+{i0}+{salt})%{M31})"
    h4 = f"(({h3}*{h3}+{h2})%{M31})"
    return f"{h4}/CAST({M31} AS DOUBLE)"


def lon_sql(expr: str) -> str:
    return f"CAST(-180 AS DOUBLE)+CAST(360 AS DOUBLE)*({hash01_sql(expr, SALT_LON)})"


def lat_sql(expr: str) -> str:
    return f"CAST(-85.05 AS DOUBLE)+CAST(170.1 AS DOUBLE)*({hash01_sql(expr, SALT_LAT)})"


def mercator_mx_sql(lon: str) -> str:
    """gdal2tiles.py:425 LatLonToMeters x."""
    return f"({lon})*{ORIGIN_SHIFT_SQL}/CAST(180 AS DOUBLE)"


def mercator_my_sql(lat: str) -> str:
    """gdal2tiles.py:426-429 LatLonToMeters y."""
    return (
        f"(ln(tan((CAST(90 AS DOUBLE)+({lat}))*pi()/CAST(360 AS DOUBLE)))"
        f"/(pi()/CAST(180 AS DOUBLE)))*{ORIGIN_SHIFT_SQL}/CAST(180 AS DOUBLE)"
    )


def tile_sql(m: str, zoom: int, tile_size: int = 256) -> str:
    """Mercator meter coord -> TMS tile index at fixed zoom.
    MetersToPixels (gdal2tiles.py:452-458) + PixelsToTile ceil-1
    (gdal2tiles.py:460-465), algebraically: ceil(((m+S)/res)/ts) - 1."""
    res = f"({ORIGIN_SHIFT_SQL}*2/CAST({tile_size} AS DOUBLE)/CAST({2**zoom} AS DOUBLE))"
    return (
        f"CAST(ceil((({m})+{ORIGIN_SHIFT_SQL})/{res}/CAST({tile_size} AS DOUBLE))"
        f" - 1 AS BIGINT)"
    )


def clamp_sql(expr: str, lo: int, hi: int) -> str:
    return f"least(greatest({expr}, {lo}), {hi})"


def xyz_ty_sql(ty_tms: str, zoom: int) -> str:
    """TMS->XYZ flip (gdal2tiles.py:511-514)."""
    return f"({2**zoom} - 1 - ({ty_tms}))"


def quadkey_sql(tx: str, ty_tms: str, zoom: int) -> str:
    """Quadkey digits, generated per fixed zoom (gdal2tiles.py:517-530).
    digit_i = bit(tx, z-i) + 2*bit(ty_xyz, z-i), concatenated MSB-first."""
    if zoom == 0:
        return "''"
    ty_x = f"({2**zoom} - 1 - ({ty_tms}))"
    parts = []
    for i in range(zoom, 0, -1):
        sh = i - 1
        parts.append(
            f"CAST((CAST(floor(({tx})/{2**sh}) AS BIGINT)%2)"
            f"+2*(CAST(floor({ty_x}/{2**sh}) AS BIGINT)%2) AS STRING)"
        )
    return "concat(" + ",".join(parts) + ")"


# ------------------------------------------------------------- polygon set
# countries64: 8x8 lon/lat grid, one convex polygon (ellipse-inscribed
# 5..12-gon) per cell, all parameters id-derived. Mirrors FIXTURES.md F3.

NPOLY = 64
GRID_W = 45.0       # 360/8
GRID_H = 20.25      # 162/8, world band [-81, 81] inside mercator limits
LAT0 = -81.0

# skew fixture (FIXTURES F3): polygon 0 scaled about its cell center
SKEW_FACTOR = 8.0
SKEW_CLIP_X = 179.9
SKEW_CLIP_Y = 84.0


def polygon_params_np(p) -> dict:
    p = np.asarray(p, dtype=np.int64)
    col = (p % 8).astype(np.float64)
    row = np.floor_divide(p, 8).astype(np.float64)
    fx = 0.08 + 0.12 * hash01_np(p, SALT_POLY_FX)
    fy = 0.08 + 0.12 * hash01_np(p, SALT_POLY_FY)
    cx = -180.0 + GRID_W * col + GRID_W / 2.0
    cy = LAT0 + GRID_H * row + GRID_H / 2.0
    rx = (1.0 - 2.0 * fx) * GRID_W / 2.0
    ry = (1.0 - 2.0 * fy) * GRID_H / 2.0
    nv = 5 + (p % 8)
    phase = 2.0 * np.pi * hash01_np(p, SALT_POLY_PHASE)
    return dict(cx=cx, cy=cy, rx=rx, ry=ry, nv=nv, phase=phase)


def polygon_ring_np(p: int) -> np.ndarray:
    """Closed ring (nv+1, 2) of polygon p."""
    prm = polygon_params_np([p])
    nv = int(prm["nv"][0])
    j = np.arange(nv, dtype=np.float64)
    ang = prm["phase"][0] + 2.0 * np.pi * j / nv
    xs = prm["cx"][0] + prm["rx"][0] * np.cos(ang)
    ys = prm["cy"][0] + prm["ry"][0] * np.sin(ang)
    ring = np.column_stack([xs, ys])
    return np.vstack([ring, ring[:1]])


def polygons_sql_cte() -> str:
    """DuckDB CTE emitting (p, cx, cy, rx, ry, nv, phase) for p in 0..63."""
    fx = hash01_sql("p", SALT_POLY_FX)
    fy = hash01_sql("p", SALT_POLY_FY)
    ph = hash01_sql("p", SALT_POLY_PHASE)
    return f"""
SELECT CAST(r.range AS BIGINT) AS p,
  CAST(-180 AS DOUBLE) + {GRID_W}*CAST(r.range%8 AS DOUBLE) + {GRID_W / 2.0} AS cx,
  CAST({LAT0} AS DOUBLE) + {GRID_H}*CAST(r.range//8 AS DOUBLE) + {GRID_H / 2.0} AS cy,
  (CAST(1 AS DOUBLE) - 2*(0.08 + 0.12*({fx})))*{GRID_W / 2.0} AS rx,
  (CAST(1 AS DOUBLE) - 2*(0.08 + 0.12*({fy})))*{GRID_H / 2.0} AS ry,
  5 + CAST(r.range%8 AS BIGINT) AS nv,
  2*pi()*({ph}) AS phase
FROM range({NPOLY}) r
""".replace("r.range%8", "(r.range % 8)").replace("r.range//8", "(r.range // 8)")


def pip_mp_join_sql(points_cte: str, *, hole_s: float, island_s: float,
                    id_col: str = "id", x_col: str = "x",
                    y_col: str = "y") -> str:
    """DuckDB twin of the WKB MultiPolygon join (sources.polygons
    countries64_mp): each country is outer n-gon + hole (scale hole_s)
    + island 4-gon diamond (scale island_s, phase 0). Containment =
    odd total crossing count over ALL THREE rings (even-odd; equals
    the per-part outer-minus-holes OR island semantics because the
    island is strictly inside the hole). Crossing rule identical to
    pip_join_sql (ogrlinearring.cpp:503-531)."""
    hs = repr(float(hole_s))
    is_ = repr(float(island_s))
    rnv = "(CASE WHEN rr.range = 2 THEN 4 ELSE nv END)"
    rs = f"(CASE WHEN rr.range = 0 THEN 1.0 WHEN rr.range = 1 THEN {hs} ELSE {is_} END)"
    rp = "(CASE WHEN rr.range = 2 THEN 0.0 ELSE phase END)"
    vx = (lambda idx: f"cx + (rx*{rs})*cos({rp} + 2*pi()*CAST({idx} AS DOUBLE)"
          f"/CAST({rnv} AS DOUBLE))")
    vy = (lambda idx: f"cy + (ry*{rs})*sin({rp} + 2*pi()*CAST({idx} AS DOUBLE)"
          f"/CAST({rnv} AS DOUBLE))")
    return f"""
WITH pts AS ({points_cte}),
polys AS ({polygons_sql_cte()}),
cand AS (
  SELECT pts.{id_col} AS pid_, pts.{x_col} AS px_, pts.{y_col} AS py_,
         polys.p, polys.cx, polys.cy, polys.rx, polys.ry, polys.nv, polys.phase
  FROM pts JOIN polys
    ON pts.{x_col} >= polys.cx - polys.rx AND pts.{x_col} <= polys.cx + polys.rx
   AND pts.{y_col} >= polys.cy - polys.ry AND pts.{y_col} <= polys.cy + polys.ry
),
edges AS (
  SELECT cand.*, CAST(rr.range AS BIGINT) AS ri, CAST(e.range AS BIGINT) AS j,
    {vx("e.range")} - px_ AS x2,
    {vy("e.range")} - py_ AS y2,
    {vx(f"(e.range+1)%{rnv}")} - px_ AS x1,
    {vy(f"(e.range+1)%{rnv}")} - py_ AS y1
  FROM cand CROSS JOIN range(3) rr CROSS JOIN range(12) e
  WHERE e.range < (CASE WHEN rr.range = 2 THEN 4 ELSE cand.nv END)
),
crossings AS (
  SELECT pid_, p,
    sum(CASE WHEN (((y1 > 0) AND (y2 <= 0)) OR ((y2 > 0) AND (y1 <= 0)))
              AND ((x1*y2 - x2*y1)/(y2 - y1)) > 0.0
        THEN 1 ELSE 0 END) AS c
  FROM edges GROUP BY pid_, p
)
SELECT pid_ AS {id_col}, p AS poly_id FROM crossings WHERE c % 2 = 1
"""


def pip_join_sql(points_cte: str, id_col: str = "id", x_col: str = "x",
                 y_col: str = "y", skew: bool = False,
                 nv_override: int | None = None) -> str:
    """DuckDB SQL computing the exact spatial join (point-in-polygon) of
    derived points vs countries64 with the REFERENCE crossing rule
    (ogrlinearring.cpp:503-531): bbox prefilter, then per-edge straddle
    test ((y1>0 & y2<=0)|(y2>0 & y1<=0)) and strict 0 < cross/(y2-y1).
    skew=True inflates polygon 0 by SKEW_FACTOR about its cell center
    with the world clip — the FIXTURES F3 hot-polygon case.
    nv_override replays the dense fixture (countries64_dense_cover):
    every ring resampled at exactly nv_override vertices, same
    cx + rx*cos(phase + 2*pi*j/nv) op sequence.
    Returns rows ({id_col}, poly_id)."""
    if skew:
        eff = f"""
SELECT p, cx, cy, nv, phase,
       CASE WHEN p = 0 THEN rx * {SKEW_FACTOR} ELSE rx END AS rx,
       CASE WHEN p = 0 THEN ry * {SKEW_FACTOR} ELSE ry END AS ry
FROM ({polygons_sql_cte()})"""
    else:
        eff = polygons_sql_cte()
    # vertex coords, clipped to the world box (identity for unskewed
    # polygons — their vertices never reach the clip bounds)
    nv_sql = "CAST(nv AS DOUBLE)" if nv_override is None else (
        f"CAST({nv_override} AS DOUBLE)")
    nv_mod = "nv" if nv_override is None else str(nv_override)
    range_n = 12 if nv_override is None else nv_override
    edge_filter = " WHERE e.range < cand.nv" if nv_override is None else ""
    vx = (lambda idx: f"least(greatest(cx + rx*cos(phase + 2*pi()*CAST({idx} AS DOUBLE)"
          f"/{nv_sql}), -{SKEW_CLIP_X}), {SKEW_CLIP_X})")
    vy = (lambda idx: f"least(greatest(cy + ry*sin(phase + 2*pi()*CAST({idx} AS DOUBLE)"
          f"/{nv_sql}), -{SKEW_CLIP_Y}), {SKEW_CLIP_Y})")
    return f"""
WITH pts AS ({points_cte}),
polys AS ({eff}),
cand AS (
  SELECT pts.{id_col} AS pid_, pts.{x_col} AS px_, pts.{y_col} AS py_,
         polys.p, polys.cx, polys.cy, polys.rx, polys.ry, polys.nv, polys.phase
  FROM pts JOIN polys
    ON pts.{x_col} >= polys.cx - polys.rx AND pts.{x_col} <= polys.cx + polys.rx
   AND pts.{y_col} >= polys.cy - polys.ry AND pts.{y_col} <= polys.cy + polys.ry
),
edges AS (
  SELECT cand.*, CAST(e.range AS BIGINT) AS j,
    {vx("e.range")} - px_ AS x2,
    {vy("e.range")} - py_ AS y2,
    {vx(f"(e.range+1)%{nv_mod}")} - px_ AS x1,
    {vy(f"(e.range+1)%{nv_mod}")} - py_ AS y1
  FROM cand CROSS JOIN range({range_n}) e{edge_filter}
),
crossings AS (
  SELECT pid_, p,
    sum(CASE WHEN (((y1 > 0) AND (y2 <= 0)) OR ((y2 > 0) AND (y1 <= 0)))
              AND ((x1*y2 - x2*y1)/(y2 - y1)) > 0.0
        THEN 1 ELSE 0 END) AS c
  FROM edges GROUP BY pid_, p
)
SELECT pid_ AS {id_col}, p AS poly_id FROM crossings WHERE c % 2 = 1
"""
