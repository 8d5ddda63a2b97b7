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


def _buffer_area_field(vx, vy, d, h=0.02):
    """Reference buffered-region area by dense pixel-center membership:
    center is in the buffer iff inside the polygon or within d of a
    boundary segment."""
    import numpy as np

    from gdal_spark.kernels.pip import point_in_ring

    vx = np.asarray(vx, dtype=np.float64)
    vy = np.asarray(vy, dtype=np.float64)
    gx = np.arange(vx.min() - d - 2 * h, vx.max() + d + 2 * h, h) + h / 2
    gy = np.arange(vy.min() - d - 2 * h, vy.max() + d + 2 * h, h) + h / 2
    X, Y = np.meshgrid(gx, gy)
    px, py = X.ravel(), Y.ravel()
    ring = np.column_stack([np.append(vx, vx[0]), np.append(vy, vy[0])])
    inside = point_in_ring(px, py, ring)
    d2min = np.full(px.shape, np.inf)
    n = len(vx)
    for i in range(n):
        ax, ay = vx[i], vy[i]
        bx, by = vx[(i + 1) % n], vy[(i + 1) % n]
        ex, ey = bx - ax, by - ay
        L2 = ex * ex + ey * ey
        t = np.clip(((px - ax) * ex + (py - ay) * ey) / L2, 0.0, 1.0)
        d2 = (px - (ax + t * ex)) ** 2 + (py - (ay + t * ey)) ** 2
        d2min = np.minimum(d2min, d2)
    member = inside | (d2min <= d * d)
    return float(member.sum()) * h * h


def _rings_signed_area(rows):
    from gdal_spark.kernels.clip_poly import ring_area
    import numpy as np

    tot = 0.0
    for r in rows:
        ring = np.column_stack([np.append(r["xs"], r["xs"][0]),
                                np.append(r["ys"], r["ys"][0])])
        tot += (-1.0 if r["is_hole"] else 1.0) * ring_area(ring)
    return tot


def test_buffer_union_square_closed_form(spark):
    # 2x2 square, d=0.75: area = A + P*d + inscribed-32-gon disc area
    import math

    df = spark.createDataFrame(
        [(1, [0.0, 2.0, 2.0, 0.0], [0.0, 0.0, 2.0, 2.0])],
        "id bigint, xs array<double>, ys array<double>",
    )
    rows = VP.buffer_union(df, 0.75, quadrant_segments=8).collect()
    assert len(rows) == 1 and not rows[0]["is_hole"]
    m, d = 32, 0.75
    expect = 4.0 + 8.0 * d + 0.5 * m * d * d * math.sin(2 * math.pi / m)
    assert abs(_rings_signed_area(rows) - expect) < 1e-3


def test_buffer_union_oversized_L(spark):
    # L-shape with d far above the local feature size (the notch is
    # 1 wide): buffer_reflex documents this as out of scope;
    # buffer_union must produce the true region (vs dense field)
    vx = [0.0, 4.0, 4.0, 1.0, 1.0, 0.0]
    vy = [0.0, 0.0, 1.0, 1.0, 3.0, 3.0]
    d = 2.0
    df = spark.createDataFrame(
        [(1, vx, vy)], "id bigint, xs array<double>, ys array<double>")
    rows = VP.buffer_union(df, d, quadrant_segments=8).collect()
    assert all(not r["is_hole"] for r in rows) and len(rows) == 1
    got = _rings_signed_area(rows)
    ref = _buffer_area_field(vx, vy, d)
    # field error ~ perimeter*h; inscribed-arc deficit ~ P*d*(step^2/24)
    assert abs(got - ref) < 0.15, (got, ref)


def test_buffer_union_seals_mouth_into_hole(spark):
    # C-shape (square annulus with a 0.2-wide mouth): d=0.5 closes the
    # mouth and the cavity survives as a HOLE
    vx = [0.0, 6.0, 6.0, 4.0, 4.0, 2.0, 2.0, 4.0, 4.0, 6.0, 6.0, 0.0]
    vy = [0.0, 0.0, 2.9, 2.9, 2.0, 2.0, 4.0, 4.0, 3.1, 3.1, 6.0, 6.0]
    d = 0.5
    df = spark.createDataFrame(
        [(1, vx, vy)], "id bigint, xs array<double>, ys array<double>")
    rows = VP.buffer_union(df, d, quadrant_segments=8).collect()
    assert sum(1 for r in rows if r["is_hole"]) == 1
    got = _rings_signed_area(rows)
    ref = _buffer_area_field(vx, vy, d, h=0.01)
    assert abs(got - ref) < 0.2, (got, ref)


def test_buffer_union_matches_reflex_small_distance(spark):
    # below the local feature size the union construction and the raw
    # offset curve agree (right angles -> identical arc vertices)
    vx = [0.0, 4.0, 4.0, 1.0, 1.0, 0.0]
    vy = [0.0, 0.0, 1.0, 1.0, 3.0, 3.0]
    df = spark.createDataFrame(
        [(1, vx, vy)], "id bigint, xs array<double>, ys array<double>")
    u = VP.buffer_union(df, 0.4, quadrant_segments=8).collect()
    r = VP.buffer_reflex(df, 0.4, quadrant_segments=8).collect()[0]
    import numpy as np
    from gdal_spark.kernels.clip_poly import ring_area
    rr = np.column_stack([np.append(r["xs"], r["xs"][0]),
                          np.append(r["ys"], r["ys"][0])])
    assert len(u) == 1
    assert abs(_rings_signed_area(u) - ring_area(rr)) < 1e-3


def test_wrapdateline_double_crossing_and_passthrough(spark):
    # line A: walks east >360deg raw -> crosses the dateline twice ->
    # 3 parts; line B: far from the dateline -> passes through whole.
    raw_a = [100.0, 170.0, -150.0, -80.0, -10.0, 60.0, 130.0, -160.0]
    ys_a = [float(i) for i in range(len(raw_a))]
    df = spark.createDataFrame(
        [(1, raw_a, ys_a), (2, [10.0, 20.0, 30.0], [0.0, 1.0, 2.0])],
        "id bigint, xs array<double>, ys array<double>")
    out = VP.wrapdateline(df).orderBy("id", "part_idx").collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r)
    assert len(by_id[2]) == 1 and by_id[2][0]["xs"] == [10.0, 20.0, 30.0]
    parts = by_id[1]
    assert len(parts) == 3
    # part 0 ends at +180, part 1 starts at -180 and ends at +180,
    # part 2 starts at -180; crossing latitudes are the linear
    # interpolation on the unwrapped segments
    assert parts[0]["xs"][-1] == 180.0 and parts[1]["xs"][0] == -180.0
    assert parts[1]["xs"][-1] == 180.0 and parts[2]["xs"][0] == -180.0
    t1 = (180.0 - 170.0) / ((-150.0 + 360.0) - 170.0)
    yb1 = 1.0 + t1 * (2.0 - 1.0)
    assert abs(parts[0]["ys"][-1] - yb1) < 1e-12
    assert abs(parts[1]["ys"][0] - yb1) < 1e-12
    t2 = (180.0 - 130.0) / ((-160.0 + 360.0) - 130.0)
    yb2 = 6.0 + t2 * (7.0 - 6.0)
    assert abs(parts[1]["ys"][-1] - yb2) < 1e-12
    # interior vertices preserved in order
    assert parts[1]["xs"][1:-1] == [-150.0, -80.0, -10.0, 60.0, 130.0]


def _self_crosses(xs, ys):
    from gdal_spark.operators.vector_pipeline import _proper_cross
    n = len(xs)
    return any(
        _proper_cross((xs[i], ys[i]), (xs[i + 1], ys[i + 1]),
                      (xs[j], ys[j]), (xs[j + 1], ys[j + 1]))
        for i in range(n - 1) for j in range(i + 2, n - 1))


def test_simplify_preserve_topology_keeps_simplicity(spark):
    # pinned fixture: plain DP at tol 2.46 produces a SELF-CROSSING
    # chain; the topology-preserving form must keep one extra vertex
    # and stay simple
    from gdal_spark.operators.vector_pipeline import _dp_simplify
    import numpy as np

    xs = [2.725, 2.244, 6.051, 8.872, 5.664, 6.441, 2.799]
    ys = [3.089, 4.99, 5.686, 5.463, 2.6, 1.46, 3.684]
    dx, dy = _dp_simplify(np.array(xs), np.array(ys), 2.46)
    assert _self_crosses(dx, dy)
    df = spark.createDataFrame(
        [(1, xs, ys)], "id bigint, xs array<double>, ys array<double>")
    out = VP.simplify_preserve_topology(df, 2.46).collect()[0]
    assert not _self_crosses(out["xs"], out["ys"])
    assert len(out["xs"]) == len(dx) + 1


def test_simplify_preserve_topology_bulk_properties(spark):
    import numpy as np
    from gdal_spark.operators.vector_pipeline import _dp_simplify

    rng = np.random.RandomState(3)
    rows = []
    metas = []
    while len(rows) < 150:
        n = int(rng.randint(5, 11))
        xs = rng.uniform(0, 10, n)
        ys = rng.uniform(0, 10, n)
        if _self_crosses(xs, ys):
            continue
        tol = float(rng.uniform(0.3, 2.5))
        rows.append((len(rows), xs.tolist(), ys.tolist(), tol))
        metas.append((xs, ys, tol))
    # one Spark run per distinct tolerance bucket would be wasteful;
    # run the kernel via the operator at a fixed tol on a subset and
    # the raw kernel for the rest
    df = spark.createDataFrame(
        [(i, x, y) for i, x, y, t in rows[:30]],
        "id bigint, xs array<double>, ys array<double>")
    out = {r["id"]: r for r in VP.simplify_preserve_topology(df, 1.0).collect()}
    for i in range(30):
        xs, ys, _ = metas[i]
        r = out[i]
        assert not _self_crosses(r["xs"], r["ys"]), i
        assert r["xs"][0] == xs[0] and r["xs"][-1] == xs[-1]
        assert set(r["xs"]) <= set(xs.tolist())
    from gdal_spark.operators.vector_pipeline import _tps_simplify
    for xs, ys, tol in metas:
        tx, ty = _tps_simplify(xs, ys, tol)
        assert not _self_crosses(tx, ty)
        dx, dy = _dp_simplify(xs, ys, tol)
        if not _self_crosses(dx, dy):
            # when DP is already simple TPS usually agrees; it may keep
            # MORE vertices (a flatten can cross a segment DP later
            # removed) but never fewer
            assert len(tx) >= len(dx)


def test_pipeline_simplify_coverage_step(spark):
    # the r4 simplify-coverage verb is reachable from the pipeline
    # builder like every other step
    from gdal_spark.operators.vector_pipeline import VectorPipeline

    d = spark.createDataFrame(
        [(0, [0.0, 1.0, 2.0, 2.0, 0.0], [0.0, 0.1, 0.0, 2.0, 2.0])],
        "poly_id bigint, xs array<double>, ys array<double>")
    out = VectorPipeline(d).simplify_coverage(0.5).build().collect()[0]
    assert len(out["xs"]) == 4  # the 0.1 midpoint bump collapses
