"""ogr2ogr-style vector pipeline stage tests (segmentize, simplify,
clip, stage ordering)."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import vector_pipeline as VP


@pytest.fixture()
def square_df(spark):
    # unit square ring, one row
    return spark.createDataFrame(
        [(1, [0.0, 1.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 1.0, 0.0])],
        "gid bigint, xs array<double>, ys array<double>",
    )


def test_segmentize_adds_vertices(spark, square_df):
    out = VP.segmentize(square_df, max_length=0.5).collect()[0]
    # each unit edge splits into 2 pieces -> 4 edges * 2 + closing vertex
    assert len(out["xs"]) == 9
    # original vertices retained, midpoints inserted
    assert out["xs"][:3] == [0.0, 0.5, 1.0]
    assert out["ys"][:3] == [0.0, 0.0, 0.0]
    # closing vertex kept
    assert (out["xs"][-1], out["ys"][-1]) == (0.0, 0.0)


def test_segmentize_noop_when_short(spark, square_df):
    out = VP.segmentize(square_df, max_length=10.0).collect()[0]
    assert len(out["xs"]) == 5


def test_simplify_removes_collinear(spark):
    # square with redundant midpoints on every edge
    df = spark.createDataFrame(
        [(1,
          [0.0, 0.5, 1.0, 1.0, 1.0, 0.5, 0.0, 0.0, 0.0],
          [0.0, 0.0, 0.0, 0.5, 1.0, 1.0, 1.0, 0.5, 0.0])],
        "gid bigint, xs array<double>, ys array<double>",
    )
    out = VP.simplify(df, tolerance=1e-9).collect()[0]
    assert len(out["xs"]) <= 5  # collinear midpoints dropped


def test_segmentize_then_simplify_roundtrip(spark, square_df):
    seg = VP.segmentize(square_df, max_length=0.25)
    simp = VP.simplify(seg, tolerance=1e-9).collect()[0]
    # DP reduces the densified square back toward its corners
    assert len(simp["xs"]) <= 6


def test_clip_rect_inside_outside_partial(spark):
    df = spark.createDataFrame(
        [
            (1, [0.0, 1.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 1.0, 0.0]),     # fully inside
            (2, [5.0, 6.0, 6.0, 5.0, 5.0], [5.0, 5.0, 6.0, 6.0, 5.0]),     # fully outside
            (3, [-1.0, 1.0, 1.0, -1.0, -1.0], [-1.0, -1.0, 1.0, 1.0, -1.0]),  # straddles
        ],
        "gid bigint, xs array<double>, ys array<double>",
    )
    out = {r["gid"]: r for r in VP.clip_rect(df, 0.0, 0.0, 2.0, 2.0).collect()}
    assert set(out) == {1, 3}                       # outside geometry dropped
    xs3, ys3 = np.array(out[3]["xs"]), np.array(out[3]["ys"])
    assert xs3.min() >= 0.0 and ys3.min() >= 0.0    # clipped at the box
    # clipped quadrant of the 2x2 square: area == 1
    area = 0.5 * abs(np.sum(xs3[:-1] * ys3[1:] - xs3[1:] * ys3[:-1]))
    assert abs(area - 1.0) < 1e-12


def test_pipeline_stage_order_is_fixed(spark, square_df):
    # clip_src registered BEFORE segmentize in call order, but the build
    # applies segmentize first (ogr2ogr_lib.cpp:6902-7243 fixed chain):
    # clip of the densified square keeps the inserted midpoints on the
    # cut edge.
    p = (
        VP.VectorPipeline(square_df)
        .clip_src(0.0, 0.0, 0.75, 2.0)
        .segmentize(0.5)
        .build()
    )
    row = p.collect()[0]
    # midpoint (0.5, 0) survives -> proof segmentize ran before clip
    pts = set(zip(row["xs"], row["ys"]))
    assert (0.5, 0.0) in pts
    assert max(row["xs"]) == 0.75


def test_swap_xy(spark, square_df):
    out = VP.swap_xy(square_df).collect()[0]
    assert out["xs"] == [0.0, 0.0, 1.0, 1.0, 0.0]
    assert out["ys"] == [0.0, 1.0, 1.0, 0.0, 0.0]


def _ring_area_xy(xs, ys):
    import numpy as np
    x = np.asarray(xs + [xs[0]])
    y = np.asarray(ys + [ys[0]])
    return 0.5 * abs(float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])))


def test_buffer_reflex_area_converges(spark):
    """L-shape buffer: polygonal-arc area increases to the analytic
    round-join value  A + P*d + (5/4)*pi*d^2 - d^2*tan(beta/2)  as
    quadrant_segments grows (beta = pi/2 reflex => tan = 1)."""
    import math

    w, h, d = 8.0, 6.0, 1.0
    w1, h1 = w / 2, h / 2
    xs = [0.0, w, w, w1, w1, 0.0]
    ys = [0.0, 0.0, h1, h1, h, h]
    df = spark.createDataFrame(
        [(1, xs, ys)], "id bigint, xs array<double>, ys array<double>"
    )
    area_in = _ring_area_xy(xs, ys)
    perim = w + h1 + w1 + (h - h1) + w1 + h
    analytic = area_in + perim * d + 1.25 * math.pi * d * d - d * d
    errs = []
    for qs in (2, 4, 16):
        row = VP.buffer_reflex(df, d, quadrant_segments=qs).collect()[0]
        a = _ring_area_xy(list(row["xs"]), list(row["ys"]))
        assert a < analytic  # inscribed arcs underestimate
        errs.append(analytic - a)
    assert errs[0] > errs[1] > errs[2] > 0
    assert errs[2] / analytic < 1e-3


def test_buffer_reflex_matches_convex_on_convex_input(spark):
    """On a convex ring (no reflex vertices) buffer_reflex emits the
    identical vertex stream as buffer_convex."""
    df = spark.createDataFrame(
        [(1, [0.0, 4.0, 4.0, 0.0], [0.0, 0.0, 3.0, 3.0])],
        "id bigint, xs array<double>, ys array<double>",
    )
    a = VP.buffer_reflex(df, 1.5, quadrant_segments=8).collect()[0]
    b = VP.buffer_convex(df, 1.5, quadrant_segments=8).collect()[0]
    assert list(a["xs"]) == list(b["xs"]) and list(a["ys"]) == list(b["ys"])
