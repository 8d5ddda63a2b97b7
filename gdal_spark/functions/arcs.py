"""Arc linearization — curved geometry support (CircularString family).

The reference linearizes curve geometries by stepping arcs at a max
angular increment (OGRGeometryFactory::curveToLineString,
ogr/ogrgeometryfactory.cpp; default step 4 degrees via
OGR_ARC_STEPSIZE). Here:

- circumcircle(): the 3-point CircularString form -> (center, radius)
  (numpy, used driver-side / in tests);
- linearize_arc_cols(): the arc -> vertex-array expansion as pure JVM
  higher-order functions over (cx, cy, r, a0, a1) columns — the whole
  linearization is one codegen'd projection, no UDF.
"""
from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_STEP_DEG = 4.0


def circumcircle(p0, p1, p2) -> tuple[float, float, float]:
    """Center + radius of the circle through three points (the
    CircularString 3-point definition). Raises on collinear input."""
    ax, ay = p0
    bx, by = p1
    cx, cy = p2
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if d == 0.0:
        raise ValueError("collinear points do not define a circle")
    ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by) * (cy - ay)
          + (cx * cx + cy * cy) * (ay - by)) / d
    uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by) * (ax - cx)
          + (cx * cx + cy * cy) * (bx - ax)) / d
    r = math.hypot(ax - ux, ay - uy)
    return ux, uy, r


def arc_angles(center, p0, p1, p2) -> tuple[float, float]:
    """Start/end angles of the arc p0->p1->p2 around `center`, with the
    end angle adjusted so the sweep passes through p1 (the
    CircularString orientation rule)."""
    ux, uy, _ = (*center, None)
    a0 = math.atan2(p0[1] - uy, p0[0] - ux)
    am = math.atan2(p1[1] - uy, p1[0] - ux)
    a1 = math.atan2(p2[1] - uy, p2[0] - ux)
    # choose the sweep direction that passes through the middle point
    def norm(a):
        while a < 0:
            a += 2 * math.pi
        return a
    ccw_mid = norm(am - a0) <= norm(a1 - a0)
    if ccw_mid:
        if a1 < a0:
            a1 += 2 * math.pi
    else:
        if a1 > a0:
            a1 -= 2 * math.pi
    return a0, a1


COMPOUND_PART_SCHEMA = (
    "array<struct<kind:string, xs:array<double>, ys:array<double>, "
    "cx:double, cy:double, r:double, a0:double, a1:double>>"
)


def assemble_compound_cols(df: DataFrame, *, parts: str = "parts",
                           step_deg: float = DEFAULT_STEP_DEG) -> DataFrame:
    """CompoundCurve -> LineString assembly
    (OGRCompoundCurve::CurveToLine via curveToLineString,
    ogr/ogrcompoundcurve.cpp / ogrgeometryfactory.cpp): each component
    ('L' line with explicit vertices, 'A' arc by center/radius/angles)
    linearizes, and consecutive components chain with the shared
    junction vertex emitted once. Entirely JVM higher-order functions
    — one codegen'd projection, no UDF.

    `parts` column type: COMPOUND_PART_SCHEMA; adds (xs, ys)."""
    step = math.radians(step_deg)
    n = f"greatest(CAST(ceil(abs(p.a1 - p.a0) / {step!r}) AS INT), 1)"
    vx = (
        f"CASE WHEN p.kind = 'L' THEN p.xs ELSE "
        f"transform(sequence(0, {n}), k -> p.cx + p.r * cos(p.a0 + (p.a1 - p.a0) "
        f"* CAST(k AS DOUBLE) / CAST({n} AS DOUBLE))) END"
    )
    vy = (
        f"CASE WHEN p.kind = 'L' THEN p.ys ELSE "
        f"transform(sequence(0, {n}), k -> p.cy + p.r * sin(p.a0 + (p.a1 - p.a0) "
        f"* CAST(k AS DOUBLE) / CAST({n} AS DOUBLE))) END"
    )

    def chain(vexpr: str) -> str:
        return (
            f"flatten(transform({parts}, (p, i) -> "
            f"if(i = 0, {vexpr}, slice({vexpr}, 2, size({vexpr}) - 1))))"
        )

    return df.withColumn("xs", F.expr(chain(vx))) \
             .withColumn("ys", F.expr(chain(vy)))


def assemble_curvepolygon(df: DataFrame, *, rings: str = "rings",
                          id_col: str = "id",
                          step_deg: float = DEFAULT_STEP_DEG) -> DataFrame:
    """CurvePolygon -> Polygon assembly (OGRCurvePolygon::CurvePolyToPoly,
    ogr/ogrcurvepolygon.cpp): ring 0 is the exterior, subsequent rings
    are holes; each ring is a CLOSED CompoundCurve (array of
    COMPOUND_PART structs) linearized by assemble_compound_cols.
    Returns one row per ring: (id, ring_idx, xs, ys, ring_area,
    polygon_area) where polygon_area = exterior |area| minus the hole
    |area|s, repeated on every ring of the feature. Entirely JVM
    column math + one small window."""
    from pyspark.sql import Window

    ex = df.select(
        F.col(id_col), F.posexplode(F.col(rings)).alias("ring_idx", "parts")
    )
    asm = assemble_compound_cols(ex, parts="parts", step_deg=step_deg) \
        .drop("parts")
    shoelace = F.expr(
        "abs(aggregate(sequence(1, size(xs) - 1), 0D, (a, i) -> a + "
        "(element_at(xs, i) * element_at(ys, i + 1) "
        "- element_at(xs, i + 1) * element_at(ys, i)))) / 2"
    )
    asm = asm.withColumn("ring_area", shoelace)
    signed = F.when(F.col("ring_idx") == 0, F.col("ring_area")) \
        .otherwise(-F.col("ring_area"))
    w = Window.partitionBy(id_col)
    return asm.withColumn("polygon_area", F.sum(signed).over(w))


def linearize_arc_cols(df: DataFrame, *, step_deg: float = DEFAULT_STEP_DEG,
                       cx: str = "cx", cy: str = "cy", r: str = "r",
                       a0: str = "a0", a1: str = "a1") -> DataFrame:
    """Expand arc rows to vertex arrays (xs, ys): n = ceil(|a1-a0|/step)
    segments, vertices at uniform angle steps, endpoints exact.
    Pure JVM column math (transform over sequence)."""
    step = math.radians(step_deg)
    n = F.greatest(
        F.ceil(F.abs(F.col(a1) - F.col(a0)) / F.lit(step)).cast("int"), F.lit(1)
    )
    out = df.withColumn("_n", n)
    ang = (
        f"transform(sequence(0, _n), k -> {a0} + ({a1} - {a0}) * CAST(k AS DOUBLE) / CAST(_n AS DOUBLE))"
    )
    return (
        out.withColumn("_angs", F.expr(ang))
        .withColumn("xs", F.expr(f"transform(_angs, t -> {cx} + {r} * cos(t))"))
        .withColumn("ys", F.expr(f"transform(_angs, t -> {cy} + {r} * sin(t))"))
        .drop("_n", "_angs")
    )
