"""Lambert Conformal Conic (2SP) + Polar Stereographic (variant B).

The reference reprojects through PROJ for arbitrary CRS
(ogr/ogrct.cpp:2254 batch Transform). After UTM (kernels.tmerc), LCC
and polar stereographic are the two most common projected families in
real layers; this module re-derives both closed-form from the
published Snyder equations ("Map Projections — A Working Manual",
USGS PP 1395: LCC eqs. 15-1..15-11, polar stereographic eqs.
21-33..21-41 / EPSG guidance 9802 and 9829).

Cross-engine exactness strategy (same as kernels.tmerc): every
projection CONSTANT (cone constant n, aF, rho0, the stereographic
rho factor) is computed once in Python and embedded as the identical
float literal in numpy and in the generated DuckDB SQL; powers are
expanded to exp/ln so both engines run the same IEEE op sequence; the
inverse latitude iteration is a FIXED 8 rounds in both engines.
Residual libm ulp differences are absorbed by the mm / nano-degree
rounding at the query contract boundary.

Named parameter sets:
- LAMBERT93  = EPSG:2154 (RGF93 / Lambert-93, GRS80; the French
  national grid — a ubiquitous real-world LCC 2SP instance)
- NSIDC_NORTH = EPSG:3413 (WGS84 / NSIDC Sea Ice Polar Stereographic
  North, variant B with phi_ts = 70N, lon0 = -45)
"""
from __future__ import annotations

import math

import numpy as np

D2R = math.pi / 180.0
R2D = 180.0 / math.pi


def _t_py(phi: float, e: float) -> float:
    s = math.sin(phi)
    return math.tan(math.pi / 4.0 - phi / 2.0) * math.exp(
        -(e / 2.0) * math.log((1.0 - e * s) / (1.0 + e * s))
    )


def _m_py(phi: float, e: float) -> float:
    s = math.sin(phi)
    return math.cos(phi) / math.sqrt(1.0 - e * e * s * s)


def lcc_params(phi1_deg: float, phi2_deg: float, phi0_deg: float,
               lon0_deg: float, fe: float, fn: float,
               a: float, f_inv: float) -> dict:
    """Precompute the LCC 2SP constants (Snyder 15-1..15-11) once, in
    Python, so both engines consume identical float literals."""
    f = 1.0 / f_inv
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    p1, p2, p0 = phi1_deg * D2R, phi2_deg * D2R, phi0_deg * D2R
    m1, m2 = _m_py(p1, e), _m_py(p2, e)
    t1, t2, t0 = _t_py(p1, e), _t_py(p2, e), _t_py(p0, e)
    n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    F = m1 / (n * math.exp(n * math.log(t1)))
    aF = a * F
    rho0 = aF * math.exp(n * math.log(t0))
    return {
        "e": e, "n": n, "aF": aF, "rho0": rho0,
        "lam0": lon0_deg * D2R, "fe": fe, "fn": fn,
    }


def ps_params(phi_ts_deg: float, lon0_deg: float, fe: float, fn: float,
              a: float, f_inv: float) -> dict:
    """Polar stereographic variant B constants (north aspect): the
    scale is pinned at the standard parallel phi_ts via
    rho = a * m(phi_ts) / t(phi_ts) * t(phi)."""
    f = 1.0 / f_inv
    e = math.sqrt(f * (2.0 - f))
    pts = phi_ts_deg * D2R
    rho_f = a * _m_py(pts, e) / _t_py(pts, e)
    return {"e": e, "rho_f": rho_f, "lam0": lon0_deg * D2R, "fe": fe, "fn": fn}


A_GRS80, FINV_GRS80 = 6378137.0, 298.257222101
A_WGS84, FINV_WGS84 = 6378137.0, 298.257223563

LAMBERT93 = lcc_params(44.0, 49.0, 46.5, 3.0, 700000.0, 6600000.0,
                       A_GRS80, FINV_GRS80)
NSIDC_NORTH = ps_params(70.0, -45.0, 0.0, 0.0, A_WGS84, FINV_WGS84)

N_LAT_ITER = 8


def _t_np(phi: np.ndarray, e: float) -> np.ndarray:
    s = np.sin(phi)
    return np.tan(math.pi / 4.0 - phi / 2.0) * np.exp(
        -(e / 2.0) * np.log((1.0 - e * s) / (1.0 + e * s))
    )


def _phi_from_t_np(tp: np.ndarray, e: float) -> np.ndarray:
    phi = math.pi / 2.0 - 2.0 * np.arctan(tp)
    for _ in range(N_LAT_ITER):
        s = np.sin(phi)
        phi = math.pi / 2.0 - 2.0 * np.arctan(
            tp * np.exp((e / 2.0) * np.log((1.0 - e * s) / (1.0 + e * s)))
        )
    return phi


def lcc_forward(lon: np.ndarray, lat: np.ndarray, P: dict):
    phi = np.asarray(lat, dtype=np.float64) * D2R
    lam = np.asarray(lon, dtype=np.float64) * D2R
    t = _t_np(phi, P["e"])
    rho = P["aF"] * np.exp(P["n"] * np.log(t))
    th = P["n"] * (lam - P["lam0"])
    return P["fe"] + rho * np.sin(th), P["fn"] + P["rho0"] - rho * np.cos(th)


def lcc_inverse(E: np.ndarray, N: np.ndarray, P: dict):
    x = np.asarray(E, dtype=np.float64) - P["fe"]
    y = P["rho0"] - (np.asarray(N, dtype=np.float64) - P["fn"])
    rho = np.sqrt(x * x + y * y)
    tp = np.exp(np.log(rho / P["aF"]) / P["n"])
    th = np.arctan2(x, y)
    lam = th / P["n"] + P["lam0"]
    phi = _phi_from_t_np(tp, P["e"])
    return lam * R2D, phi * R2D


def ps_forward(lon: np.ndarray, lat: np.ndarray, P: dict):
    phi = np.asarray(lat, dtype=np.float64) * D2R
    lam = np.asarray(lon, dtype=np.float64) * D2R
    rho = P["rho_f"] * _t_np(phi, P["e"])
    th = lam - P["lam0"]
    return P["fe"] + rho * np.sin(th), P["fn"] - rho * np.cos(th)


def ps_inverse(E: np.ndarray, N: np.ndarray, P: dict):
    x = np.asarray(E, dtype=np.float64) - P["fe"]
    ny = -(np.asarray(N, dtype=np.float64) - P["fn"])
    rho = np.sqrt(x * x + ny * ny)
    tp = rho / P["rho_f"]
    th = np.arctan2(x, ny)
    lam = th + P["lam0"]
    phi = _phi_from_t_np(tp, P["e"])
    return lam * R2D, phi * R2D


# ------------------------------------------------------------- SQL twins

def _t_sql(phi: str, e: float) -> str:
    s = f"sin({phi})"
    return (f"tan(pi()/4.0 - ({phi})/2.0) * exp(-({e/2.0!r}) * "
            f"ln((1.0 - {e!r} * {s}) / (1.0 + {e!r} * {s})))")


def _phi_iter_ctes(src: str, tp_col: str, e: float, out: str) -> str:
    """CTE chain running the fixed 8-round latitude iteration; input
    CTE `src` must expose (id, {tp_col}); emits `{out}` with
    (id, phi)."""
    parts = [f"{out}_0 AS (SELECT *, pi()/2.0 - 2.0 * atan({tp_col}) AS phi "
             f"FROM {src})"]
    for k in range(1, N_LAT_ITER + 1):
        s = "sin(phi)"
        step = (f"pi()/2.0 - 2.0 * atan({tp_col} * exp(({e/2.0!r}) * "
                f"ln((1.0 - {e!r} * {s}) / (1.0 + {e!r} * {s}))))")
        prev = f"{out}_{k - 1}"
        parts.append(
            f"{out}_{k} AS (SELECT * EXCLUDE (phi), {step} AS phi FROM {prev})"
        )
    parts.append(f"{out} AS (SELECT * FROM {out}_{N_LAT_ITER})")
    return ",\n".join(parts)


def lcc_forward_sql_ctes(src: str, P: dict, *, lon: str = "lon",
                         lat: str = "lat") -> str:
    """CTEs: `lcc_fwd` with (id, easting, northing) from src(id, lon,
    lat) — the numpy op sequence replayed with identical literals."""
    t = _t_sql("phi", P["e"])
    return f"""
lccr AS (SELECT id, ({lat}) * {D2R!r} AS phi, ({lon}) * {D2R!r} AS lam FROM {src}),
lcct AS (SELECT id, lam, {t} AS t FROM lccr),
lccp AS (
  SELECT id, {P['aF']!r} * exp({P['n']!r} * ln(t)) AS rho,
         {P['n']!r} * (lam - {P['lam0']!r}) AS th
  FROM lcct
),
lcc_fwd AS (
  SELECT id, {P['fe']!r} + rho * sin(th) AS easting,
         {P['fn']!r} + {P['rho0']!r} - rho * cos(th) AS northing
  FROM lccp
)"""


def lcc_inverse_sql_ctes(src: str, P: dict, *, easting: str = "easting",
                         northing: str = "northing") -> str:
    """CTEs: `lcc_inv` with (id, lon, lat) from src(id, easting,
    northing)."""
    it = _phi_iter_ctes("lccq", "tp", P["e"], "lccphi")
    return f"""
lccxy AS (
  SELECT id, ({easting}) - {P['fe']!r} AS x,
         {P['rho0']!r} - (({northing}) - {P['fn']!r}) AS y
  FROM {src}
),
lccq AS (
  SELECT id, x, y,
         exp(ln(sqrt(x * x + y * y) / {P['aF']!r}) / {P['n']!r}) AS tp
  FROM lccxy
),
{it},
lcc_inv AS (
  SELECT id, (atan2(x, y) / {P['n']!r} + {P['lam0']!r}) * {R2D!r} AS lon,
         phi * {R2D!r} AS lat
  FROM lccphi
)"""


def ps_forward_sql_ctes(src: str, P: dict, *, lon: str = "lon",
                        lat: str = "lat") -> str:
    t = _t_sql("phi", P["e"])
    return f"""
psr AS (SELECT id, ({lat}) * {D2R!r} AS phi, ({lon}) * {D2R!r} AS lam FROM {src}),
pst AS (SELECT id, lam, {t} AS t FROM psr),
psp AS (SELECT id, {P['rho_f']!r} * t AS rho, lam - {P['lam0']!r} AS th FROM pst),
ps_fwd AS (
  SELECT id, {P['fe']!r} + rho * sin(th) AS easting,
         {P['fn']!r} - rho * cos(th) AS northing
  FROM psp
)"""


def ps_inverse_sql_ctes(src: str, P: dict, *, easting: str = "easting",
                        northing: str = "northing") -> str:
    it = _phi_iter_ctes("psq", "tp", P["e"], "psphi")
    return f"""
psxy AS (
  SELECT id, ({easting}) - {P['fe']!r} AS x,
         -((({northing}) - {P['fn']!r})) AS ny
  FROM {src}
),
psq AS (
  SELECT id, x, ny, sqrt(x * x + ny * ny) / {P['rho_f']!r} AS tp FROM psxy
),
{it},
ps_inv AS (
  SELECT id, (atan2(x, ny) + {P['lam0']!r}) * {R2D!r} AS lon,
         phi * {R2D!r} AS lat
  FROM psphi
)"""
