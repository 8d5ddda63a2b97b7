"""GCP-based warp transformers: polynomial (orders 1-3) and thin-plate
spline, re-derived Spark-first from the reference semantics.

Reference parity:
- Polynomial GCP transformer: alg/gdal_crs.cpp — CRS_georef
  (gdal_crs.cpp:612-672) applies E/N coefficient vectors over the
  monomial basis [1, e, n, e2, en, n2, e3, e2n, en2, n3]; source
  coordinates are mean-centered before fitting and applying
  (gdal_crs.cpp:286,457,693).
- Thin-plate spline: alg/thinplatespline.cpp — VIZ_GEOREF_SPLINE_FULL
  solves the (n+3)x(n+3) system with kernel k(r2) = r2*ln(r2)
  (VizGeorefSpline2DBase_func, thinplatespline.cpp:174-182) and
  applies f(P) = a0 + a1*Px + a2*Py + sum_r w_r * k(|P-gcp_r|^2) with
  P and the GCPs centered by the GCP mean (get_point,
  thinplatespline.cpp:666-691).

Spark-first split: the FIT is tiny (one numpy solve over the GCP list
on the driver — exactly where GDAL runs it) and produces plain float
coefficients; the APPLY is the distributed part. Polynomial apply is
pure JVM column math (whole-stage codegen, no Python); TPS apply is an
Arrow-batched pandas UDF with a per-GCP left-fold accumulation whose
operation order the SQL oracle replays term by term.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def fit_polynomial_gcps(
    gcps: list[tuple[float, float, float, float]], order: int
) -> dict:
    """Least-squares fit of the gdal_crs.cpp polynomial of `order` over
    GCPs [(px, py, X, Y), ...]. Source pixel coords are centered by
    their mean (gdal_crs.cpp:286). Returns {order, x_mean, y_mean,
    ex, ny} with ex/ny the E/N coefficient lists (len 3/6/10)."""
    n_terms = {1: 3, 2: 6, 3: 10}[order]
    if len(gcps) < n_terms:
        raise ValueError(f"order {order} needs >= {n_terms} GCPs")
    px = np.array([g[0] for g in gcps], dtype=np.float64)
    py = np.array([g[1] for g in gcps], dtype=np.float64)
    tx = np.array([g[2] for g in gcps], dtype=np.float64)
    ty = np.array([g[3] for g in gcps], dtype=np.float64)
    xm, ym = float(px.mean()), float(py.mean())
    e, m = px - xm, py - ym
    cols = [np.ones_like(e), e, m]
    if order >= 2:
        cols += [e * e, e * m, m * m]
    if order >= 3:
        cols += [e * e * e, e * e * m, e * m * m, m * m * m]
    A = np.stack(cols, axis=1)
    ex, *_ = np.linalg.lstsq(A, tx, rcond=None)
    ny, *_ = np.linalg.lstsq(A, ty, rcond=None)
    return {
        "order": order, "x_mean": xm, "y_mean": ym,
        "ex": [float(v) for v in ex], "ny": [float(v) for v in ny],
    }


def _poly_terms(e1: Column, n1: Column, order: int) -> list[Column]:
    """Monomial columns in CRS_georef order (gdal_crs.cpp:634-665)."""
    terms = [F.lit(1.0), e1, n1]
    if order >= 2:
        terms += [e1 * e1, e1 * n1, n1 * n1]
    if order >= 3:
        e2, n2 = e1 * e1, n1 * n1
        terms += [e1 * e2, e2 * n1, e1 * n2, n1 * n2]
    return terms


def apply_polynomial(
    df: DataFrame, model: dict, *, x: str = "px", y: str = "py",
    out_x: str = "geo_x", out_y: str = "geo_y",
) -> DataFrame:
    """Apply a fitted polynomial GCP transform as JVM column math:
    X = E0 + E1*e + E2*n + ... left-to-right, exactly the C statement
    order in CRS_georef, so an oracle writing the same expression
    chain is bit-identical."""
    e1 = F.col(x).cast("double") - F.lit(model["x_mean"])
    n1 = F.col(y).cast("double") - F.lit(model["y_mean"])
    terms = _poly_terms(e1, n1, model["order"])

    def chain(coefs: list[float]) -> Column:
        acc = F.lit(coefs[0]) * terms[0]
        for c, t in zip(coefs[1:], terms[1:]):
            acc = acc + F.lit(c) * t
        return acc

    return df.withColumn(out_x, chain(model["ex"])).withColumn(
        out_y, chain(model["ny"])
    )


def poly_sql_expr(model: dict, x_sql: str, y_sql: str) -> tuple[str, str]:
    """(X_expr, Y_expr) SQL replaying apply_polynomial term by term
    with the identical float literals and operation order."""
    e1 = f"({x_sql} - {model['x_mean']!r})"
    n1 = f"({y_sql} - {model['y_mean']!r})"
    terms = [f"1.0", e1, n1]
    if model["order"] >= 2:
        terms += [f"{e1}*{e1}", f"{e1}*{n1}", f"{n1}*{n1}"]
    if model["order"] >= 3:
        e2, n2 = f"({e1}*{e1})", f"({n1}*{n1})"
        terms += [f"{e1}*{e2}", f"{e2}*{n1}", f"{e1}*{n2}", f"{n1}*{n2}"]

    def chain(coefs: list[float]) -> str:
        parts = [f"{coefs[0]!r} * {terms[0]}"]
        parts += [f"{c!r} * {t}" for c, t in zip(coefs[1:], terms[1:])]
        return "(" + " + ".join(parts) + ")"

    return chain(model["ex"]), chain(model["ny"])


def fit_tps_gcps(gcps: list[tuple[float, float, float, float]]) -> dict:
    """Solve the thin-plate-spline system (thinplatespline.cpp
    VIZ_GEOREF_SPLINE_FULL, solve(): (n+3)x(n+3) with 3 side
    conditions sum(w)=sum(w*x)=sum(w*y)=0 and kernel r2*ln(r2) over
    mean-centered GCP coords). Returns {x_mean, y_mean, gx, gy,
    cx, cy} with c* = [a0, a1, a2, w_1..w_n]."""
    n = len(gcps)
    if n < 3:
        raise ValueError("TPS needs >= 3 GCPs")
    px = np.array([g[0] for g in gcps], dtype=np.float64)
    py = np.array([g[1] for g in gcps], dtype=np.float64)
    xm, ym = float(px.mean()), float(py.mean())
    gx, gy = px - xm, py - ym
    tx = np.array([g[2] for g in gcps], dtype=np.float64)
    ty = np.array([g[3] for g in gcps], dtype=np.float64)
    d2 = (gx[:, None] - gx[None, :]) ** 2 + (gy[:, None] - gy[None, :]) ** 2
    with np.errstate(divide="ignore", invalid="ignore"):
        K = np.where(d2 > 0.0, d2 * np.log(d2), 0.0)
    A = np.zeros((n + 3, n + 3))
    A[0, 3:] = 1.0
    A[1, 3:] = gx
    A[2, 3:] = gy
    A[3:, 0] = 1.0
    A[3:, 1] = gx
    A[3:, 2] = gy
    A[3:, 3:] = K
    bx = np.concatenate([[0.0, 0.0, 0.0], tx])
    by = np.concatenate([[0.0, 0.0, 0.0], ty])
    cx = np.linalg.solve(A, bx)
    cy = np.linalg.solve(A, by)
    return {
        "x_mean": xm, "y_mean": ym,
        "gx": [float(v) for v in gx], "gy": [float(v) for v in gy],
        "cx": [float(v) for v in cx], "cy": [float(v) for v in cy],
    }


def apply_tps(
    df: DataFrame, model: dict, *, x: str = "px", y: str = "py",
    out_x: str = "geo_x", out_y: str = "geo_y",
) -> DataFrame:
    """TPS apply as ONE Arrow-batched pandas UDF (the model — a few
    hundred floats — rides in the UDF closure; at cluster scale it
    serializes once per executor, not per row). Accumulation is a
    strict left fold over [affine, gcp_1, ..., gcp_n] so the SQL
    oracle's `+` chain reproduces the identical doubles."""
    gx = np.array(model["gx"])
    gy = np.array(model["gy"])
    cx = np.array(model["cx"])
    cy = np.array(model["cy"])
    xm, ym = model["x_mean"], model["y_mean"]

    @pandas_udf("struct<gx:double, gy:double>")
    def _tps(xs: pd.Series, ys: pd.Series) -> pd.DataFrame:
        p = xs.to_numpy(dtype=np.float64) - xm
        q = ys.to_numpy(dtype=np.float64) - ym
        ax = cx[0] + cx[1] * p + cx[2] * q
        ay = cy[0] + cy[1] * p + cy[2] * q
        for r in range(len(gx)):
            d2 = (p - gx[r]) ** 2 + (q - gy[r]) ** 2
            with np.errstate(divide="ignore", invalid="ignore"):
                k = np.where(d2 > 0.0, d2 * np.log(d2), 0.0)
            ax = ax + cx[r + 3] * k
            ay = ay + cy[r + 3] * k
        return pd.DataFrame({"gx": ax, "gy": ay})

    s = _tps(F.col(x).cast("double"), F.col(y).cast("double"))
    return df.withColumn("_t", s).withColumn(out_x, F.col("_t.gx")).withColumn(
        out_y, F.col("_t.gy")
    ).drop("_t")


def tps_sql_expr(model: dict, x_sql: str, y_sql: str) -> tuple[str, str]:
    """(X_expr, Y_expr) SQL replaying apply_tps: same centering, same
    kernel, same left-to-right accumulation (term order pinned)."""
    p = f"({x_sql} - {model['x_mean']!r})"
    q = f"({y_sql} - {model['y_mean']!r})"

    def chain(c: list[float]) -> str:
        parts = [f"{c[0]!r} + {c[1]!r} * {p} + {c[2]!r} * {q}"]
        for r, (rx, ry) in enumerate(zip(model["gx"], model["gy"])):
            d2 = f"(({p} - {rx!r})*({p} - {rx!r}) + ({q} - {ry!r})*({q} - {ry!r}))"
            k = f"(CASE WHEN {d2} > 0.0 THEN {d2} * ln({d2}) ELSE 0.0 END)"
            parts.append(f"{c[r + 3]!r} * {k}")
        return "(" + " + ".join(parts) + ")"

    return chain(model["cx"]), chain(model["cy"])


def gcp_fixture(n: int = 12) -> list[tuple[float, float, float, float]]:
    """Deterministic GCP set on a 64x48 pixel grid: affine georef plus
    an LCG wiggle so TPS genuinely bends (integer-derived doubles,
    exactly representable — both engines see identical inputs)."""
    out = []
    for k in range(n):
        px = float((k * 37 + 5) % 64)
        py = float((k * 23 + 11) % 48)
        wob = ((k * 2654435761) % 1000) / 500.0 - 1.0  # [-1, 1)
        x = -100.0 + 0.5 * px + 0.02 * py + 0.25 * wob
        y = 40.0 - 0.4 * py + 0.01 * px - 0.2 * wob
        out.append((px, py, x, y))
    return out
