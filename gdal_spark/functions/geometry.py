"""Geometry analytics verbs: ST_ConvexHull, ST_Centroid, geodesic area.

Reference surface: OGRGeometry::ConvexHull (ogr/ogrgeometry.cpp:4188,
GEOS-backed), ::Centroid (:6108), and the SQLite dialect's geodesic
area (ogr/ogrsqlitesqlfunctions.cpp) — re-derived here as:

- convex hull: Andrew's monotone chain (exact orientation predicate on
  the input doubles; collinear points dropped), per-feature inside an
  Arrow-batched mapInPandas;
- centroid: the standard polygon area-weighted centroid as a PURE
  column expression (JVM fold over the vertex arrays, no Python);
- geodesic area: the Chamberlain-Duquette spherical-excess formula
  (NASA JPL publication 2007; the same approximation turf.js ships) as
  a column expression with the authalic radius — both engines fold the
  identical term sequence, so results agree to libm-sin ulp.
"""
from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

D2R = math.pi / 180.0
R_AUTH = 6371007.2  # WGS84 authalic radius (meters)


def convex_hull_np(xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Monotone chain; returns the hull ring CCW starting at the
    lexicographically smallest vertex, collinear points dropped."""
    pts = sorted(set(zip(xs.tolist(), ys.tolist())))
    if len(pts) <= 2:
        a = np.array([p[0] for p in pts]), np.array([p[1] for p in pts])
        return a

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0.0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0.0:
            upper.pop()
        upper.append(p)
    ring = lower[:-1] + upper[:-1]
    return (np.array([p[0] for p in ring], dtype=np.float64),
            np.array([p[1] for p in ring], dtype=np.float64))


def convex_hull_cols(df: DataFrame, xs: str = "xs", ys: str = "ys",
                     out_xs: str = "hull_xs", out_ys: str = "hull_ys") -> DataFrame:
    """Adds (out_xs, out_ys): the convex hull ring (open, CCW from the
    lexicographic minimum) of each feature's vertex arrays."""
    keep = list(df.columns)
    schema = ", ".join(f"{c} {dict(df.dtypes)[c]}" for c in keep) + \
        f", {out_xs} array<double>, {out_ys} array<double>"

    def run(batches):
        for pdf in batches:
            hxs, hys = [], []
            for vx, vy in zip(pdf[xs], pdf[ys]):
                hx, hy = convex_hull_np(np.asarray(vx, dtype=np.float64),
                                        np.asarray(vy, dtype=np.float64))
                hxs.append(hx.tolist())
                hys.append(hy.tolist())
            out = pdf[keep].copy()
            out[out_xs] = hxs
            out[out_ys] = hys
            yield out

    return df.mapInPandas(run, schema)


def shoelace_area_expr(xs: str = "xs", ys: str = "ys") -> Column:
    """|shoelace|/2 over an OPEN ring, sequential JVM fold."""
    return F.expr(
        f"abs(aggregate(sequence(1, size({xs})), 0D, (a, i) -> a + "
        f"(element_at({xs}, i) * element_at({ys}, 1 + i % size({xs})) "
        f"- element_at({xs}, 1 + i % size({xs})) * element_at({ys}, i)))) / 2"
    )


def centroid_exprs(xs: str = "xs", ys: str = "ys") -> tuple[Column, Column]:
    """Polygon area-weighted centroid (OGRGeometry::Centroid
    semantics) over an OPEN ring: Cx = sum((x_i + x_{i+1}) cross_i) /
    (3 sum(cross_i)) — pure column math."""
    cross = (
        f"(element_at({xs}, i) * element_at({ys}, 1 + i % size({xs})) "
        f"- element_at({xs}, 1 + i % size({xs})) * element_at({ys}, i))"
    )
    a2 = f"aggregate(sequence(1, size({xs})), 0D, (a, i) -> a + {cross})"
    cx = (
        f"aggregate(sequence(1, size({xs})), 0D, (a, i) -> a + "
        f"(element_at({xs}, i) + element_at({xs}, 1 + i % size({xs}))) * {cross})"
        f" / (3 * ({a2}))"
    )
    cy = (
        f"aggregate(sequence(1, size({xs})), 0D, (a, i) -> a + "
        f"(element_at({ys}, i) + element_at({ys}, 1 + i % size({xs}))) * {cross})"
        f" / (3 * ({a2}))"
    )
    return F.expr(cx), F.expr(cy)


def geodesic_area_expr(xs: str = "xs", ys: str = "ys") -> Column:
    """Spherical polygon area (Chamberlain-Duquette), authalic radius,
    over an OPEN (lon, lat)-degree ring; returns square meters. Term
    sequence: (lam2 - lam1) * (2 + sin(phi1) + sin(phi2)), folded in
    ring order — the DuckDB oracle replays the identical fold."""
    lam1 = f"element_at({xs}, i) * {D2R!r}"
    lam2 = f"element_at({xs}, 1 + i % size({xs})) * {D2R!r}"
    phi1 = f"element_at({ys}, i) * {D2R!r}"
    phi2 = f"element_at({ys}, 1 + i % size({xs})) * {D2R!r}"
    s = (
        f"aggregate(sequence(1, size({xs})), 0D, (a, i) -> a + "
        f"(({lam2}) - ({lam1})) * (2.0 + sin({phi1}) + sin({phi2})))"
    )
    return F.expr(f"abs({s}) * {R_AUTH * R_AUTH / 2.0!r}")


def wkt_polygon_expr(xs: str = "xs", ys: str = "ys") -> Column:
    """OGR_GEOM_WKT special field (ogr/ogr_p.h:167-174, SPF_OGR_GEOM_WKT)
    for a single-ring polygon stored as OPEN vertex arrays: emits
    'POLYGON ((x y,x y,...,x0 y0))' with the ring closed. Coordinates
    are rendered at %.6f — a pinned cross-engine decimal rendering
    (exact decimal ties are impossible for non-dyadic positions, so
    Java's and C's rounding agree); the reference's 15-significant-digit
    default is a documented deviation."""
    pt = (f"concat(format_string('%.6f', element_at({xs}, i)), ' ', "
          f"format_string('%.6f', element_at({ys}, i)))")
    pts = f"transform(sequence(1, size({xs})), i -> {pt})"
    first = (f"concat(format_string('%.6f', element_at({xs}, 1)), ' ', "
             f"format_string('%.6f', element_at({ys}, 1)))")
    return F.expr(
        f"concat('POLYGON ((', array_join(concat({pts}, array({first})), ','), '))')"
    )


def wkt_polygon_sql(xs_list: str, ys_list: str) -> str:
    """DuckDB twin of wkt_polygon_expr."""
    pt = f"printf('%.6f', {xs_list}[i]) || ' ' || printf('%.6f', {ys_list}[i])"
    first = (f"printf('%.6f', {xs_list}[1]) || ' ' || "
             f"printf('%.6f', {ys_list}[1])")
    return (
        f"'POLYGON ((' || array_to_string(list_concat("
        f"list_transform(range(1, len({xs_list}) + 1), i -> {pt}), "
        f"[{first}]), ',') || '))'"
    )


def ring_length_expr(xs: str = "xs", ys: str = "ys") -> Column:
    """OGRSimpleCurve::get_Length (ogr/ogrlinestring.cpp:2084) applied
    to an OPEN ring with the closing edge included — i.e. the polygon
    perimeter: sum of sqrt(dx^2 + dy^2) folded in ring order. +,*,sqrt
    are IEEE-exact so the DuckDB twin folding the same sequence is
    bit-identical."""
    dx = (f"(element_at({xs}, 1 + i % size({xs})) - element_at({xs}, i))")
    dy = (f"(element_at({ys}, 1 + i % size({xs})) - element_at({ys}, i))")
    return F.expr(
        f"aggregate(sequence(1, size({xs})), 0D, (a, i) -> a + "
        f"sqrt({dx} * {dx} + {dy} * {dy}))"
    )


def ring_length_sql(xs_list: str, ys_list: str) -> str:
    """DuckDB twin of ring_length_expr (1-based list fold)."""
    n = f"len({xs_list})"
    dx = f"({xs_list}[1 + i % {n}] - {xs_list}[i])"
    dy = f"({ys_list}[1 + i % {n}] - {ys_list}[i])"
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {n} + 1), i -> "
        f"sqrt({dx} * {dx} + {dy} * {dy}))), (a, b) -> a + b)"
    )


def geodesic_length_expr(xs: str = "xs", ys: str = "ys") -> Column:
    """Geodesic ring length on the authalic sphere: haversine
    great-circle distance summed over the closed ring, in meters.
    The reference's get_GeodesicLength (ogr/ogrlinestring.cpp:3160)
    uses Karney's ellipsoidal geod_geodesic; the spherical-authalic
    substitution here mirrors the documented geodesic-area deviation
    (same radius, agrees to ~0.3%); the ORACLE replays the identical
    spherical fold so the cross-engine check is exact to libm ulp."""
    lam1 = f"element_at({xs}, i) * {D2R!r}"
    lam2 = f"element_at({xs}, 1 + i % size({xs})) * {D2R!r}"
    phi1 = f"element_at({ys}, i) * {D2R!r}"
    phi2 = f"element_at({ys}, 1 + i % size({xs})) * {D2R!r}"
    hav = (
        f"sin((({phi2}) - ({phi1})) / 2) * sin((({phi2}) - ({phi1})) / 2) + "
        f"cos({phi1}) * cos({phi2}) * "
        f"sin((({lam2}) - ({lam1})) / 2) * sin((({lam2}) - ({lam1})) / 2)"
    )
    return F.expr(
        f"aggregate(sequence(1, size({xs})), 0D, (a, i) -> a + "
        f"2.0 * {R_AUTH!r} * asin(sqrt({hav})))"
    )


def geodesic_length_sql(xs_list: str, ys_list: str) -> str:
    """DuckDB twin of geodesic_length_expr."""
    n = f"len({xs_list})"
    lam1 = f"{xs_list}[i] * {D2R!r}"
    lam2 = f"{xs_list}[1 + i % {n}] * {D2R!r}"
    phi1 = f"{ys_list}[i] * {D2R!r}"
    phi2 = f"{ys_list}[1 + i % {n}] * {D2R!r}"
    hav = (
        f"sin((({phi2}) - ({phi1})) / 2) * sin((({phi2}) - ({phi1})) / 2) + "
        f"cos({phi1}) * cos({phi2}) * "
        f"sin((({lam2}) - ({lam1})) / 2) * sin((({lam2}) - ({lam1})) / 2)"
    )
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {n} + 1), i -> "
        f"2.0 * {R_AUTH!r} * asin(sqrt({hav})))), (a, b) -> a + b)"
    )


def geodesic_area_sql(xs_list: str, ys_list: str) -> str:
    """DuckDB twin of geodesic_area_expr over list columns (1-based)."""
    n = f"len({xs_list})"
    lam1 = f"{xs_list}[i] * {D2R!r}"
    lam2 = f"{xs_list}[1 + i % {n}] * {D2R!r}"
    phi1 = f"{ys_list}[i] * {D2R!r}"
    phi2 = f"{ys_list}[1 + i % {n}] * {D2R!r}"
    return (
        f"abs(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {n} + 1), i -> "
        f"(({lam2}) - ({lam1})) * (2.0 + sin({phi1}) + sin({phi2})))), "
        f"(a, b) -> a + b)) * {R_AUTH * R_AUTH / 2.0!r}"
    )


def point_on_surface_cols(df: DataFrame, xs: str = "xs", ys: str = "ys",
                          out_x: str = "pos_x", out_y: str = "pos_y") -> DataFrame:
    """ST_PointOnSurface / OGR_G_PointOnSurface for a single-ring
    polygon (OPEN vertex arrays) — GEOS InteriorPointArea semantics:

    1. safe bisector: c0 = (ymin + ymax)/2; loY = max{vy : vy <= c0}
       (init ymin), hiY = min{vy : vy > c0} (init ymax);
       Y = (loY + hiY)/2 — a horizontal line guaranteed to avoid every
       vertex ordinate, so no degenerate crossings;
    2. crossing xs of ring edges with the line y = Y (strict
       upper-inclusion parity rule), sorted ascending;
    3. consecutive crossing pairs are the interior intervals; the
       result is the midpoint of the WIDEST interval (ties: leftmost,
       the deterministic left-fold outcome).

    All higher-order-function column math — no Python, no shuffle.
    Intermediates are materialized one projection at a time so the
    crossing array is computed once (not re-inlined per use)."""
    n = f"size({xs})"
    c0 = f"((array_min({ys}) + array_max({ys})) / 2.0)"
    lo = f"array_max(filter({ys}, v -> v <= {c0}))"
    hi = f"coalesce(array_min(filter({ys}, v -> v > {c0})), array_max({ys}))"
    d = df.withColumn("_posY", F.expr(f"(({lo}) + ({hi})) / 2.0"))
    edges = (
        f"transform(sequence(1, {n}), i -> named_struct("
        f"'x0', element_at({xs}, i), 'y0', element_at({ys}, i), "
        f"'x1', element_at({xs}, 1 + i % {n}), "
        f"'y1', element_at({ys}, 1 + i % {n})))"
    )
    d = d.withColumn("_posC", F.expr(
        f"sort_array(transform(filter({edges}, "
        f"e -> (e.y0 > _posY) != (e.y1 > _posY)), "
        f"e -> e.x0 + (_posY - e.y0) / (e.y1 - e.y0) * (e.x1 - e.x0)))"))
    lo_i = "element_at(_posC, CAST(2*k+1 AS INT))"
    hi_i = "element_at(_posC, CAST(2*k+2 AS INT))"
    d = d.withColumn("_posB", F.expr(
        f"aggregate(sequence(0, size(_posC) div 2 - 1), "
        f"named_struct('w', CAST(-1.0 AS DOUBLE), 'm', CAST(0.0 AS DOUBLE)), "
        f"(acc, k) -> if({hi_i} - {lo_i} > acc.w, "
        f"named_struct('w', {hi_i} - {lo_i}, "
        f"'m', ({lo_i} + {hi_i}) / 2.0), acc))"))
    return (
        d.withColumn(out_x, F.col("_posB.m"))
        .withColumn(out_y, F.col("_posY"))
        .drop("_posY", "_posC", "_posB")
    )


def ogr_geometry_name_expr(code_expr: str) -> Column:
    """OGR_GEOMETRY special field (ogr/ogr_p.h SPF_OGR_GEOMETRY):
    OGRGeometry::getGeometryName() for the flat 2D wkb codes — the
    uppercase WKT keyword per type (ogrpoint/ogrlinestring/... .cpp)."""
    return F.expr(
        f"CASE {code_expr} WHEN 1 THEN 'POINT' WHEN 2 THEN 'LINESTRING' "
        f"WHEN 3 THEN 'POLYGON' WHEN 4 THEN 'MULTIPOINT' "
        f"WHEN 5 THEN 'MULTILINESTRING' WHEN 6 THEN 'MULTIPOLYGON' "
        f"WHEN 7 THEN 'GEOMETRYCOLLECTION' ELSE 'UNKNOWN' END")


def wkt_parse_polygon_exprs(wkt: str) -> tuple[Column, Column]:
    """ST_GeomFromText for single-ring 'POLYGON ((x y,x y,...))' text
    (ogr/ogrgeometryfactory.cpp createFromWkt -> importFromWkt): parse
    the ring back to OPEN (xs, ys) vertex arrays (the closing vertex is
    dropped, matching the engine's open-ring storage). Pure JVM string
    ops — regexp strip + split + cast, no Python."""
    body = (f"regexp_replace({wkt}, '^POLYGON \\\\(\\\\(|\\\\)\\\\)$', '')")
    pairs = f"split({body}, ',')"
    xs = (f"transform({pairs}, p -> "
          f"CAST(split(trim(p), ' ')[0] AS DOUBLE))")
    ys = (f"transform({pairs}, p -> "
          f"CAST(split(trim(p), ' ')[1] AS DOUBLE))")
    # drop the closing vertex (ring arrives closed in WKT)
    open_xs = f"slice({xs}, 1, size({xs}) - 1)"
    open_ys = f"slice({ys}, 1, size({ys}) - 1)"
    return F.expr(open_xs), F.expr(open_ys)


def st_distance_rings_expr(axs: str, ays: str, bxs: str, bys: str) -> Column:
    """OGRGeometry::Distance (ogr/ogrgeometry.cpp:3564, GEOS-backed)
    for two DISJOINT single-ring polygons stored as OPEN vertex
    arrays: min over all (edge-of-A, edge-of-B) pairs of the
    segment-to-segment distance. For non-crossing segments that is the
    least of the four point-to-segment distances (endpoint against the
    other segment), each the clamped-projection formula. Pure
    higher-order-function column math over the edge cross product —
    no Python, no shuffle. O(nA*nB) per pair, the right shape for
    analytics rings; crossing segments (distance 0) are out of
    contract (polygons disjoint)."""
    def seg(c, n, i):
        return (f"element_at({c}, {i})", f"element_at({c}, 1 + {i} % {n})")

    na, nb = f"size({axs})", f"size({bxs})"
    ax0, ax1 = seg(axs, na, "i"); ay0, ay1 = seg(ays, na, "i")
    bx0, bx1 = seg(bxs, nb, "j"); by0, by1 = seg(bys, nb, "j")

    def pt_seg(px, py, qx0, qy0, qx1, qy1):
        dx, dy = f"(({qx1}) - ({qx0}))", f"(({qy1}) - ({qy0}))"
        l2 = f"({dx}*{dx} + {dy}*{dy})"
        t = (f"greatest(0D, least(1D, "
             f"((({px}) - ({qx0})) * {dx} + (({py}) - ({qy0})) * {dy})"
             f" / nullif({l2}, 0D)))")
        t = f"coalesce({t}, 0D)"  # degenerate zero-length edge
        ex = f"(({px}) - (({qx0}) + {t} * {dx}))"
        ey = f"(({py}) - (({qy0}) + {t} * {dy}))"
        return f"sqrt({ex}*{ex} + {ey}*{ey})"

    dij = "least({}, {}, {}, {})".format(
        pt_seg(ax0, ay0, bx0, by0, bx1, by1),
        pt_seg(ax1, ay1, bx0, by0, bx1, by1),
        pt_seg(bx0, by0, ax0, ay0, ax1, ay1),
        pt_seg(bx1, by1, ax0, ay0, ax1, ay1),
    )
    return F.expr(
        f"array_min(flatten(transform(sequence(1, {na}), i -> "
        f"transform(sequence(1, {nb}), j -> {dij}))))"
    )


def line_locate_point_expr(xs: str, ys: str, px: str, py: str) -> Column:
    """ogrlineref --get-pos semantics (apps/ogrlineref.cpp; the
    GetPosition operation projects the point onto the line and reports
    the distance along it): measure m of the closest point of the
    polyline to (px, py) — per edge the clamped-projection foot (the
    same formula as st_distance_rings_expr), argmin over edges by
    (squared distance, edge index), measure = cumulative length before
    the edge + t * edge length. Pure HOF fold, no Python."""
    n = f"size({xs})"
    x0, y0 = f"element_at({xs}, i)", f"element_at({ys}, i)"
    x1, y1 = f"element_at({xs}, i + 1)", f"element_at({ys}, i + 1)"
    dx, dy = f"({x1} - {x0})", f"({y1} - {y0})"
    l2 = f"({dx}*{dx} + {dy}*{dy})"
    t = (f"coalesce(greatest(0D, least(1D, "
         f"((({px}) - {x0}) * {dx} + (({py}) - {y0}) * {dy})"
         f" / nullif({l2}, 0D))), 0D)")
    ex = f"(({px}) - ({x0} + {t} * {dx}))"
    ey = f"(({py}) - ({y0} + {t} * {dy}))"
    d2 = f"({ex}*{ex} + {ey}*{ey})"
    # prefix length before edge i. NB: Spark's sequence(1, 0) is
    # DESCENDING [1, 0], so the i = 1 case must short-circuit
    pre = (f"if(i = 1, 0D, aggregate(sequence(1, i - 1), 0D, (a, j) -> a + "
           f"sqrt((element_at({xs}, j + 1) - element_at({xs}, j)) * "
           f"(element_at({xs}, j + 1) - element_at({xs}, j)) + "
           f"(element_at({ys}, j + 1) - element_at({ys}, j)) * "
           f"(element_at({ys}, j + 1) - element_at({ys}, j)))))")
    m_at = f"({pre} + {t} * sqrt({l2}))"
    # argmin fold: acc = (best_d2, best_m); strict < keeps the FIRST
    # minimal edge (ogrlineref scans in order)
    return F.expr(
        f"aggregate(sequence(1, {n} - 1), "
        f"named_struct('d', CAST('Infinity' AS DOUBLE), 'm', 0D), "
        f"(acc, i) -> if({d2} < acc.d, named_struct('d', {d2}, 'm', {m_at}), acc)"
        f").m")


def line_substring_exprs(xs: str, ys: str, m0: str, m1: str):
    """ogrlineref --get-subline: the sub-polyline between measures
    m0 < m1 (clamped to [0, total length]) — interpolated endpoints
    plus every original vertex whose cumulative measure lies strictly
    between. Returns (sub_xs, sub_ys) array columns. Pure HOFs: one
    prefix-length fold, then a filter + transform per boundary."""
    n = f"size({xs})"
    # cums[k] = length of the first k edges, k = 0..n-1 (array built
    # by an array-accumulating fold — n is small analytics geometry)
    cums = (f"aggregate(sequence(1, {n} - 1), array(0D), (a, j) -> "
            f"array_append(a, element_at(a, -1) + "
            f"sqrt((element_at({xs}, j + 1) - element_at({xs}, j)) * "
            f"(element_at({xs}, j + 1) - element_at({xs}, j)) + "
            f"(element_at({ys}, j + 1) - element_at({ys}, j)) * "
            f"(element_at({ys}, j + 1) - element_at({ys}, j)))))")

    def interp(m: str, c: str) -> str:
        # point at measure m: find edge i with cums[i] <= m <= cums[i+1]
        # (last such i via fold), lerp inside it
        i = (f"aggregate(sequence(1, {n} - 1), 1, (a, j) -> "
             f"if(element_at(_lrc, j) <= ({m}), j, a))")
        den = f"nullif(element_at(_lrc, {i} + 1) - element_at(_lrc, {i}), 0D)"
        tt = f"coalesce((({m}) - element_at(_lrc, {i})) / {den}, 0D)"
        return (f"element_at({c}, {i}) + {tt} * "
                f"(element_at({c}, {i} + 1) - element_at({c}, {i}))")

    # same descending-sequence guard for 2-vertex lines (n - 1 < 2)
    mids = (f"filter(if({n} < 3, array(), sequence(2, {n} - 1)), j -> "
            f"element_at(_lrc, j) > ({m0}) AND element_at(_lrc, j) < ({m1}))")
    sub_x = (f"concat(array({interp(m0, xs)}), "
             f"transform({mids}, j -> element_at({xs}, j)), "
             f"array({interp(m1, xs)}))")
    sub_y = (f"concat(array({interp(m0, ys)}), "
             f"transform({mids}, j -> element_at({ys}, j)), "
             f"array({interp(m1, ys)}))")
    return F.expr(cums), F.expr(sub_x), F.expr(sub_y)


def line_substring_cols(df: DataFrame, m0: str, m1: str,
                        xs: str = "xs", ys: str = "ys",
                        out_xs: str = "sub_xs",
                        out_ys: str = "sub_ys") -> DataFrame:
    """DataFrame form: adds (out_xs, out_ys) sub-polyline arrays; the
    prefix-length array is materialized once in its own projection so
    the boundary interpolations don't re-inline the fold."""
    cums, sx, sy = line_substring_exprs(xs, ys, m0, m1)
    return (df.withColumn("_lrc", cums)
            .withColumn(out_xs, sx).withColumn(out_ys, sy).drop("_lrc"))


def line_points_at_step_cols(df: DataFrame, step: str,
                             xs: str = "xs", ys: str = "ys",
                             out: str = "marks") -> DataFrame:
    """ogrlineref --create: reference marks along the line every
    `step` units of measure (0, step, 2*step, ... <= total length).
    Adds `out` = array<struct<m, x, y>>. Same interp machinery as
    line_substring_cols; pure HOFs."""
    cums, _, _ = line_substring_exprs(xs, ys, "0D", "0D")
    d = df.withColumn("_lrc", cums)
    n = f"size({xs})"
    i_of = (f"aggregate(sequence(1, {n} - 1), 1, (a, j) -> "
            f"if(element_at(_lrc, j) <= m, j, a))")
    den = f"nullif(element_at(_lrc, {i_of} + 1) - element_at(_lrc, {i_of}), 0D)"
    tt = f"coalesce((m - element_at(_lrc, {i_of})) / {den}, 0D)"

    def at(c: str) -> str:
        return (f"element_at({c}, {i_of}) + {tt} * "
                f"(element_at({c}, {i_of} + 1) - element_at({c}, {i_of}))")

    marks = (
        f"transform(sequence(0, CAST(floor(element_at(_lrc, -1) / ({step})) AS INT)), "
        f"k -> (CAST(k AS DOUBLE) * ({step}))) ")
    d = d.withColumn(out, F.expr(
        f"transform({marks}, m -> named_struct('m', m, 'x', {at(xs)}, 'y', {at(ys)}))"))
    return d.drop("_lrc")
