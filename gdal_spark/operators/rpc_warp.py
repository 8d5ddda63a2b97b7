"""RPC (rational polynomial coefficient) warp transformer — the
RPC00B 20-coefficient model satellite L1 imagery georeferences with
(reference: alg/gdal_rpc.cpp; forward RPCTransformPoint
gdal_rpc.cpp:386-466, term basis RPCComputeTerms, iterative inverse
RPCInverseTransformPoint gdal_rpc.cpp:1128-1360).

Semantics replicated exactly for the no-DEM case (constant user
height — GDAL's RPC_HEIGHT path):

- forward: normalize (lon, lat, h) by the offset/scale pairs
  (dateline-safe longitude diff), evaluate the four 20-term cubic
  polynomials over the RPC00B term order, pixel = SAMP_NUM/SAMP_DEN *
  SAMP_SCALE + SAMP_OFF + 0.5 (center-of-UL-pixel -> GDAL corner
  convention), line likewise.
- inverse: initial guess from the linear approximation around the
  reference point (finite-difference affine at dfLLDelta = 1e-4,
  inverted like GDALInvGeoTransform), then at most 10 fixed-point
  iterations (GDAL's no-DEM nMaxIterations) stepping by the inverse
  affine of the pixel residual, stopping per point once
  max(|dpx|, |dpy|) < pix_err_threshold (DEFAULT_PIX_ERR_THRESHOLD =
  0.1, gdal_rpc.cpp:63). The vectorized form freezes converged points
  (same results as GDAL's per-point break), and the SQL twin unrolls
  the identical masked iterations.

Distributed shape: the transformer constants (40 floats + affine) are
plain Python literals closed over an Arrow-batched pandas UDF — the
same 8-bytes-per-point data plane as the GCP/TPS family in gcp_warp.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_PIX_ERR_THRESHOLD = 0.1  # gdal_rpc.cpp:63
LL_DELTA = 0.0001                # gdal_rpc.cpp:1056
MAX_ITER_NO_DEM = 10             # gdal_rpc.cpp:1190


class RPC:
    """RPC00B metadata: offsets/scales + 4 x 20 coefficients."""

    def __init__(self, *, long_off, long_scale, lat_off, lat_scale,
                 height_off, height_scale, samp_off, samp_scale,
                 line_off, line_scale, samp_num, samp_den, line_num,
                 line_den):
        self.long_off = float(long_off)
        self.long_scale = float(long_scale)
        self.lat_off = float(lat_off)
        self.lat_scale = float(lat_scale)
        self.height_off = float(height_off)
        self.height_scale = float(height_scale)
        self.samp_off = float(samp_off)
        self.samp_scale = float(samp_scale)
        self.line_off = float(line_off)
        self.line_scale = float(line_scale)
        for name, c in (("samp_num", samp_num), ("samp_den", samp_den),
                        ("line_num", line_num), ("line_den", line_den)):
            c = tuple(float(v) for v in c)
            assert len(c) == 20, f"{name}: RPC00B wants 20 coefficients"
            setattr(self, name, c)


def _terms(L, P, H):
    """The RPC00B term basis in the reference's exact order
    (RPCComputeTerms, gdal_rpc.cpp:345-369). L = normalized longitude,
    P = normalized latitude, H = normalized height."""
    return (
        np.ones_like(L), L, P, H, L * P, L * H, P * H, L * L, P * P, H * H,
        L * P * H, L * L * L, L * P * P, L * H * H, L * L * P, P * P * P,
        P * H * H, L * L * H, P * P * H, H * H * H,
    )


def _poly(terms, coefs):
    s = terms[0] * coefs[0]
    for t, c in zip(terms[1:], coefs[1:]):
        s = s + t * c
    return s


def rpc_forward(rpc: RPC, lon, lat, height=0.0):
    """(lon, lat, h) -> (pixel, line), GDAL corner convention."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    h = np.broadcast_to(np.asarray(height, dtype=np.float64), lon.shape)
    diff = lon - rpc.long_off
    diff = np.where(diff < -270.0, diff + 360.0,
                    np.where(diff > 270.0, diff - 360.0, diff))
    L = diff / rpc.long_scale
    P = (lat - rpc.lat_off) / rpc.lat_scale
    H = (h - rpc.height_off) / rpc.height_scale
    t = _terms(L, P, H)
    x = _poly(t, rpc.samp_num) / _poly(t, rpc.samp_den)
    y = _poly(t, rpc.line_num) / _poly(t, rpc.line_den)
    return (x * rpc.samp_scale + rpc.samp_off + 0.5,
            y * rpc.line_scale + rpc.line_off + 0.5)


def rpc_affine(rpc: RPC) -> tuple[float, ...]:
    """The pixel/line -> lon/lat linear approximation GDAL seeds the
    inverse with (gdal_rpc.cpp:1040-1086): finite-difference affine
    around (LONG_OFF, LAT_OFF, refZ=0), inverted exactly like
    GDALInvGeoTransform. Returns the 6-tuple gt such that
    lon = gt0 + gt1*pixel + gt2*line, lat = gt3 + gt4*pixel + gt5*line."""
    ref_lon, ref_lat = rpc.long_off, rpc.lat_off
    rp, rl = rpc_forward(rpc, np.array([ref_lon]), np.array([ref_lat]))
    rp, rl = float(rp[0]), float(rl[0])
    dp, dl = rpc_forward(rpc, np.array([ref_lon + LL_DELTA]),
                         np.array([ref_lat]))
    g1 = (float(dp[0]) - rp) / LL_DELTA   # dpixel/dlon
    g4 = (float(dl[0]) - rl) / LL_DELTA   # dline/dlon
    dp, dl = rpc_forward(rpc, np.array([ref_lon]),
                         np.array([ref_lat + LL_DELTA]))
    g2 = (float(dp[0]) - rp) / LL_DELTA   # dpixel/dlat
    g5 = (float(dl[0]) - rl) / LL_DELTA   # dline/dlat
    g0 = rp - g1 * ref_lon - g2 * ref_lat
    g3 = rl - g4 * ref_lon - g5 * ref_lat
    # invert the 2x3 affine (GDALInvGeoTransform semantics)
    det = g1 * g5 - g2 * g4
    i1 = g5 / det
    i2 = -g2 / det
    i4 = -g4 / det
    i5 = g1 / det
    i0 = -g0 * i1 - g3 * i2
    i3 = -g0 * i4 - g3 * i5
    return (i0, i1, i2, i3, i4, i5)


def rpc_inverse(rpc: RPC, pixel, line, height=0.0,
                pix_err_threshold: float = DEFAULT_PIX_ERR_THRESHOLD,
                max_iter: int = MAX_ITER_NO_DEM):
    """(pixel, line) -> (lon, lat) at constant height: GDAL's
    fixed-point iteration with per-point stop (vectorized as a freeze
    mask — identical results to the scalar break). Points that never
    reach the threshold come back NaN, mirroring the reference's
    failure marking (gdal_rpc.cpp: HUGE_VAL + panSuccess=FALSE when
    iIter != -1 after the loop) rather than leaking an arbitrary
    non-converged iterate."""
    px = np.asarray(pixel, dtype=np.float64)
    py = np.asarray(line, dtype=np.float64)
    gt = rpc_affine(rpc)
    x = gt[0] + gt[1] * px + gt[2] * py
    y = gt[3] + gt[4] * px + gt[5] * py
    done = np.zeros(px.shape, dtype=bool)
    for _ in range(max_iter):
        bx, by = rpc_forward(rpc, x, y, height)
        dx = bx - px
        dy = by - py
        err = np.maximum(np.abs(dx), np.abs(dy))
        done = done | (err < pix_err_threshold)
        x = np.where(done, x, x - (dx * gt[1] + dy * gt[2]))
        y = np.where(done, y, y - (dx * gt[4] + dy * gt[5]))
    # exactly max_iter residual checks, like the reference loop — a
    # point that only converges ON the final update is failed by GDAL
    # too (no post-loop check there either)
    return np.where(done, x, np.nan), np.where(done, y, np.nan)


# ------------------------------------------------------ Spark operators

def apply_rpc_forward(df: DataFrame, rpc: RPC, lon: str = "lon",
                      lat: str = "lat", height: float = 0.0) -> DataFrame:
    """Adds (pixel, line). Arrow-batched; the RPC constants ride the
    closure (40 floats), each point ships 16 bytes."""

    @F.pandas_udf("struct<pixel:double, line:double>")
    def _fwd(lon_s: pd.Series, lat_s: pd.Series) -> pd.DataFrame:
        p, l = rpc_forward(rpc, lon_s.to_numpy(), lat_s.to_numpy(), height)
        return pd.DataFrame({"pixel": p, "line": l})

    res = df.withColumn("_pl", _fwd(F.col(lon), F.col(lat)))
    return res.withColumn("pixel", F.col("_pl.pixel")).withColumn(
        "line", F.col("_pl.line")).drop("_pl")


def apply_rpc_inverse(df: DataFrame, rpc: RPC, pixel: str = "pixel",
                      line: str = "line", height: float = 0.0,
                      pix_err_threshold: float = DEFAULT_PIX_ERR_THRESHOLD,
                      max_iter: int = MAX_ITER_NO_DEM) -> DataFrame:
    """Adds (lon, lat)."""

    @F.pandas_udf("struct<lon:double, lat:double>")
    def _inv(p_s: pd.Series, l_s: pd.Series) -> pd.DataFrame:
        lo, la = rpc_inverse(rpc, p_s.to_numpy(), l_s.to_numpy(), height,
                             pix_err_threshold, max_iter)
        return pd.DataFrame({"lon": lo, "lat": la})

    res = df.withColumn("_ll", _inv(F.col(pixel), F.col(line)))
    return res.withColumn("lon", F.col("_ll.lon")).withColumn(
        "lat", F.col("_ll.lat")).drop("_ll")


# ------------------------------------------------------------ SQL twins

def _r(x: float) -> str:
    return repr(float(x))


def _terms_sql(L: str, P: str, H: str) -> list[str]:
    return [
        "1.0", L, P, H, f"{L}*{P}", f"{L}*{H}", f"{P}*{H}", f"{L}*{L}",
        f"{P}*{P}", f"{H}*{H}", f"{L}*{P}*{H}", f"{L}*{L}*{L}",
        f"{L}*{P}*{P}", f"{L}*{H}*{H}", f"{L}*{L}*{P}", f"{P}*{P}*{P}",
        f"{P}*{H}*{H}", f"{L}*{L}*{H}", f"{P}*{P}*{H}", f"{H}*{H}*{H}",
    ]


def _poly_sql(terms: list[str], coefs) -> str:
    return "(" + " + ".join(f"{t} * {_r(c)}" for t, c in zip(terms, coefs)) + ")"


def rpc_fwd_sql_exprs(rpc: RPC, lon: str, lat: str,
                      height: float = 0.0) -> tuple[str, str]:
    """(pixel_expr, line_expr) over lon/lat SQL expressions — the exact
    forward arithmetic with shared literals (dateline branch omitted:
    identical for |lon - LONG_OFF| < 270, which every fixture and real
    scene satisfies)."""
    L = f"((({lon}) - {_r(rpc.long_off)}) / {_r(rpc.long_scale)})"
    P = f"((({lat}) - {_r(rpc.lat_off)}) / {_r(rpc.lat_scale)})"
    H = _r((height - rpc.height_off) / rpc.height_scale)
    t = _terms_sql(L, P, H)
    px = (f"({_poly_sql(t, rpc.samp_num)} / {_poly_sql(t, rpc.samp_den)}"
          f" * {_r(rpc.samp_scale)} + {_r(rpc.samp_off)} + 0.5)")
    py = (f"({_poly_sql(t, rpc.line_num)} / {_poly_sql(t, rpc.line_den)}"
          f" * {_r(rpc.line_scale)} + {_r(rpc.line_off)} + 0.5)")
    return px, py


def rpc_inv_sql_ctes(rpc: RPC, src: str, *, pixel: str = "px",
                     line: str = "py", keep: str = "id",
                     height: float = 0.0,
                     pix_err_threshold: float = DEFAULT_PIX_ERR_THRESHOLD,
                     max_iter: int = MAX_ITER_NO_DEM) -> str:
    """CTE chain unrolling the masked fixed-point iterations; final CTE
    `rpc_inv` (keep, lon, lat). Byte-identical arithmetic to
    rpc_inverse."""
    gt = rpc_affine(rpc)
    g = [_r(v) for v in gt]
    thr = _r(pix_err_threshold)
    parts = [f"""
rpc_i0 AS (
  SELECT {keep}, ({pixel}) AS tpx, ({line}) AS tpy,
         {g[0]} + {g[1]} * ({pixel}) + {g[2]} * ({line}) AS x,
         {g[3]} + {g[4]} * ({pixel}) + {g[5]} * ({line}) AS y,
         FALSE AS done
  FROM {src}
)"""]
    for i in range(max_iter):
        bx, by = rpc_fwd_sql_exprs(rpc, "x", "y", height)
        parts.append(f"""
rpc_b{i} AS (
  SELECT {keep}, tpx, tpy, x, y, done,
         {bx} - tpx AS dx, {by} - tpy AS dy
  FROM rpc_i{i}
),
rpc_d{i} AS (
  SELECT {keep}, tpx, tpy, x, y, dx, dy,
         (done OR greatest(abs(dx), abs(dy)) < {thr}) AS done
  FROM rpc_b{i}
),
rpc_i{i + 1} AS (
  SELECT {keep}, tpx, tpy,
         CASE WHEN done THEN x ELSE x - (dx * {g[1]} + dy * {g[2]}) END AS x,
         CASE WHEN done THEN y ELSE y - (dx * {g[4]} + dy * {g[5]}) END AS y,
         done
  FROM rpc_d{i}
)""")
    parts.append(f"""
rpc_inv AS (
  SELECT {keep},
         CASE WHEN done THEN x ELSE CAST('nan' AS DOUBLE) END AS lon,
         CASE WHEN done THEN y ELSE CAST('nan' AS DOUBLE) END AS lat
  FROM rpc_i{max_iter}
)""")
    return ",".join(p.strip() for p in parts)


# --------------------------------------------- Spark codegen-SQL twins

def apply_rpc_forward_sql(df: DataFrame, rpc: RPC, lon: str = "lon",
                          lat: str = "lat",
                          height: float = 0.0) -> DataFrame:
    """Forward RPC as Spark SQL column expressions — the IDENTICAL
    generated text the DuckDB oracle parses, so the arithmetic is
    bit-exact across engines (pure * / + — no libm), and the whole
    transform runs JVM-side in whole-stage codegen. Adds
    (pixel, line)."""
    px, py = rpc_fwd_sql_exprs(rpc, lon, lat, height)
    return df.withColumn("pixel", F.expr(px)).withColumn("line", F.expr(py))


# NOTE: no codegen-SQL twin for the INVERSE on purpose — 10 unrolled
# iterations of two 20-term rational evals would exceed the 64 KB
# whole-stage-codegen limit (the scale red flag this repo treats as a
# failure); the Arrow/numpy path above runs the same pure + - * /
# sequence, so cross-engine drift vs the DuckDB CTE replay is FMA-
# contraction-level only (measured <= 7e-15 deg), absorbed by the
# micro-degree gate rounding.


# ------------------------------------------------------------- fixture

def rpc_fixture() -> RPC:
    """Deterministic satellite-plausible RPC00B set (Paris-ish scene):
    dominant linear terms + small rational cross terms, denominators
    near 1 — the shape real RPC00B metadata has."""
    return RPC(
        long_off=2.3, long_scale=0.12, lat_off=48.85, lat_scale=0.09,
        height_off=120.0, height_scale=500.0,
        samp_off=6000.0, samp_scale=6200.0,
        line_off=4500.0, line_scale=4700.0,
        samp_num=(0.0021, 1.0173, -0.0832, 0.0027, 0.0061, -0.0008, 0.0004,
                  0.0013, -0.0022, 0.0001, 0.00017, 0.00032, -0.00021,
                  0.00008, 0.00044, -0.00012, 0.00005, 0.00021, -0.00009,
                  0.00002),
        samp_den=(1.0, 0.00071, -0.00042, 0.00013, 0.000095, -0.000031,
                  0.000022, 0.000088, -0.000046, 0.0000071, 0.0000052,
                  0.0000088, -0.0000035, 0.0000012, 0.0000061, -0.0000028,
                  0.0000009, 0.0000033, -0.0000016, 0.0000004),
        line_num=(-0.0018, 0.0924, -1.0224, -0.0031, -0.0053, 0.0007,
                  -0.0005, -0.0017, 0.0026, -0.0001, -0.00019, -0.00028,
                  0.00024, -0.00007, -0.00039, 0.00014, -0.00006, -0.00018,
                  0.00011, -0.00002),
        line_den=(1.0, -0.00064, 0.00051, -0.00011, -0.000087, 0.000027,
                  -0.000019, -0.000079, 0.000052, -0.0000065, -0.0000047,
                  -0.0000079, 0.0000041, -0.0000014, -0.0000055, 0.0000031,
                  -0.0000011, -0.0000029, 0.0000018, -0.0000005),
    )
