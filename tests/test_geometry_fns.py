"""ConvexHull / Centroid / geodesic-area kernel pins."""
from __future__ import annotations

import math

import numpy as np

from gdal_spark.functions import geometry as G


def test_hull_square_with_interior_and_collinear():
    xs = np.array([0.0, 4.0, 4.0, 0.0, 2.0, 2.0, 1.0, 3.0])
    ys = np.array([0.0, 0.0, 4.0, 4.0, 2.0, 0.0, 1.0, 3.0])
    hx, hy = G.convex_hull_np(xs, ys)
    # (2,0) is collinear on the bottom edge -> dropped; interior dropped
    assert list(zip(hx, hy)) == [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]


def test_hull_duplicates_and_degenerate():
    hx, hy = G.convex_hull_np(np.array([1.0, 1.0]), np.array([2.0, 2.0]))
    assert list(hx) == [1.0] and list(hy) == [2.0]


def test_centroid_and_area_exprs(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 6.0, 6.0, 0.0], [0.0, 0.0, 4.0, 4.0])],
        "id bigint, xs array<double>, ys array<double>",
    )
    cx, cy = G.centroid_exprs()
    row = df.select(
        G.shoelace_area_expr().alias("a"), cx.alias("cx"), cy.alias("cy")
    ).collect()[0]
    assert row["a"] == 24.0 and row["cx"] == 3.0 and row["cy"] == 2.0


def test_geodesic_area_equator_patch(spark):
    # 1x1 degree patch at the equator: ~ (R*pi/180)^2 within 0.01%
    df = spark.createDataFrame(
        [(1, [0.0, 1.0, 1.0, 0.0], [-0.5, -0.5, 0.5, 0.5])],
        "id bigint, xs array<double>, ys array<double>",
    )
    a = df.select(G.geodesic_area_expr().alias("a")).collect()[0]["a"]
    expect = (G.R_AUTH * math.pi / 180.0) ** 2
    assert abs(a - expect) / expect < 1e-4


def test_ring_length_rectangle(spark):
    # 6x4 rectangle (open ring) -> perimeter 20 exactly
    df = spark.createDataFrame(
        [(1, [0.0, 6.0, 6.0, 0.0], [0.0, 0.0, 4.0, 4.0])],
        "id bigint, xs array<double>, ys array<double>",
    )
    row = df.select(G.ring_length_expr().alias("p")).collect()[0]
    assert row["p"] == 20.0


def test_geodesic_length_equator_degree(spark):
    # a 2-point "ring" spanning 1 degree of longitude on the equator:
    # out-and-back = 2 * R * pi/180
    df = spark.createDataFrame(
        [(1, [0.0, 1.0], [0.0, 0.0])],
        "id bigint, xs array<double>, ys array<double>",
    )
    row = df.select(G.geodesic_length_expr().alias("l")).collect()[0]
    expect = 2.0 * G.R_AUTH * math.pi / 180.0
    assert abs(row["l"] - expect) < 1e-6 * expect


def test_geodesic_length_meridian_quarter(spark):
    # pole-to-equator along a meridian, out-and-back: 2 * R * pi/2
    df = spark.createDataFrame(
        [(1, [10.0, 10.0], [0.0, 90.0])],
        "id bigint, xs array<double>, ys array<double>",
    )
    row = df.select(G.geodesic_length_expr().alias("l")).collect()[0]
    expect = 2.0 * G.R_AUTH * math.pi / 2.0
    assert abs(row["l"] - expect) < 1e-9 * expect


def test_point_on_surface_interior_where_centroid_is_not(spark):
    # deep-U: the area centroid lands in the void between the prongs;
    # GEOS InteriorPointArea must return a point INSIDE (here, the
    # wider left prong's midline)
    xs = [0.0, 10.0, 10.0, 9.0, 9.0, 3.0, 3.0, 0.0]
    ys = [0.0, 0.0, 8.0, 8.0, 1.0, 1.0, 8.0, 8.0]
    df = spark.createDataFrame(
        [(1, xs, ys)], "id bigint, xs array<double>, ys array<double>")
    r = G.point_on_surface_cols(df).collect()[0]
    # closed form: bisector Y = ((0+1) ... loY=1 (<=4), hiY=8 -> 4.5;
    # intervals [0,3] (w=3) and [9,10] (w=1) -> left midpoint
    assert r["pos_x"] == 1.5 and r["pos_y"] == 4.5
    from gdal_spark.kernels.pip import point_in_polygon
    ring = np.column_stack([xs + [xs[0]], ys + [ys[0]]])
    assert point_in_polygon(
        np.array([r["pos_x"]]), np.array([r["pos_y"]]), [ring])[0]
    # centroid is NOT interior (it sits in the void)
    cx, cy = G.centroid_exprs()
    c = df.select(cx.alias("cx"), cy.alias("cy")).collect()[0]
    assert not point_in_polygon(
        np.array([c["cx"]]), np.array([c["cy"]]), [ring])[0]


def test_wkt_parse_polygon_roundtrip(spark):
    xs = [0.125, -10.5, -10.5, 0.125]
    ys = [-3.25, -3.25, 7.75, 7.75]
    df = spark.createDataFrame(
        [(1, xs, ys)], "id bigint, xs array<double>, ys array<double>")
    d = df.withColumn("wkt", G.wkt_polygon_expr())
    px, py = G.wkt_parse_polygon_exprs("wkt")
    r = d.withColumn("pxs", px).withColumn("pys", py).collect()[0]
    # dyadic coords render exactly at %.6f, so the roundtrip is exact
    assert r["pxs"] == xs and r["pys"] == ys
    # direct literal parse too
    lit = spark.sql(
        "SELECT 'POLYGON ((1.5 2.5,3.5 2.5,3.5 4.5,1.5 2.5))' AS w")
    px2, py2 = G.wkt_parse_polygon_exprs("w")
    r2 = lit.withColumn("pxs", px2).withColumn("pys", py2).collect()[0]
    assert r2["pxs"] == [1.5, 3.5, 3.5] and r2["pys"] == [2.5, 2.5, 4.5]


def test_st_distance_rings_cases(spark):
    # edge-facing rectangles: distance = the horizontal gap (projection
    # interior, t in (0,1)); corner case covered by the gate oracle
    df = spark.createDataFrame([(1,
        [0.0, 2.0, 2.0, 0.0], [0.0, 0.0, 2.0, 2.0],
        [5.0, 7.0, 7.0, 5.0], [0.5, 0.5, 1.5, 1.5])],
        "id bigint, axs array<double>, ays array<double>, "
        "bxs array<double>, bys array<double>")
    r = df.select(G.st_distance_rings_expr(
        "axs", "ays", "bxs", "bys").alias("d")).collect()[0]
    assert r["d"] == 3.0
    # touching rectangles -> 0
    df2 = spark.createDataFrame([(1,
        [0.0, 2.0, 2.0, 0.0], [0.0, 0.0, 2.0, 2.0],
        [2.0, 4.0, 4.0, 2.0], [0.0, 0.0, 2.0, 2.0])],
        "id bigint, axs array<double>, ays array<double>, "
        "bxs array<double>, bys array<double>")
    r2 = df2.select(G.st_distance_rings_expr(
        "axs", "ays", "bxs", "bys").alias("d")).collect()[0]
    assert r2["d"] == 0.0


def test_line_locate_and_substring(spark):
    # L-shaped polyline: (0,0)->(10,0)->(10,5); total length 15
    df = spark.createDataFrame(
        [(1, [0.0, 10.0, 10.0], [0.0, 0.0, 5.0])],
        "id bigint, xs array<double>, ys array<double>")
    # point above the first edge at x=4 -> measure 4
    m = df.select(G.line_locate_point_expr(
        "xs", "ys", "4.0D", "2.0D").alias("m")).collect()[0]["m"]
    assert m == 4.0
    # point right of the second edge at y=3 -> measure 10 + 3
    m2 = df.select(G.line_locate_point_expr(
        "xs", "ys", "12.0D", "3.0D").alias("m")).collect()[0]["m"]
    assert m2 == 13.0
    # beyond the end -> clamps to the last vertex (measure 15)
    m3 = df.select(G.line_locate_point_expr(
        "xs", "ys", "20.0D", "20.0D").alias("m")).collect()[0]["m"]
    assert m3 == 15.0
    # substring m in [4, 13]: (4,0) .. corner (10,0) .. (10,3)
    r = G.line_substring_cols(df, "4.0D", "13.0D").collect()[0]
    assert r["sub_xs"] == [4.0, 10.0, 10.0]
    assert r["sub_ys"] == [0.0, 0.0, 3.0]
    # substring inside one edge: no interior vertices
    r2 = G.line_substring_cols(df, "1.0D", "2.5D").collect()[0]
    assert r2["sub_xs"] == [1.0, 2.5] and r2["sub_ys"] == [0.0, 0.0]


def test_line_points_at_step(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 10.0, 10.0], [0.0, 0.0, 5.0])],
        "id bigint, xs array<double>, ys array<double>")
    r = G.line_points_at_step_cols(df, "4.0D").collect()[0]["marks"]
    got = [(p["m"], p["x"], p["y"]) for p in r]
    # total length 15: marks at 0, 4, 8, 12 (12 -> 2 up the vertical)
    assert got == [(0.0, 0.0, 0.0), (4.0, 4.0, 0.0),
                   (8.0, 8.0, 0.0), (12.0, 10.0, 2.0)]
