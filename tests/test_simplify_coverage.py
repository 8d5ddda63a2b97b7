"""simplify-coverage (apps/gdalalg_vector_simplify_coverage.cpp:30,
GEOS CoverageSimplifier contract): simplify a polygon coverage without
introducing gaps or overlaps — shared boundaries stay IDENTICAL
between neighbors, junctions survive, and --preserve-boundary keeps
the exterior verbatim."""
from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.operators.vector_pipeline import simplify_coverage

TOL = 0.5


def _densify_zigzag(p0, p1, n=7, amp=0.05):
    """Chain p0 -> p1 with n interior vertices zigzagging +-amp
    perpendicular (amp << TOL: DP must collapse to [p0, p1])."""
    t = np.linspace(0.0, 1.0, n + 2)
    x = p0[0] + (p1[0] - p0[0]) * t
    y = p0[1] + (p1[1] - p0[1]) * t
    dx, dy = p1[0] - p0[0], p1[1] - p0[1]
    L = float(np.hypot(dx, dy))
    nx, ny = -dy / L, dx / L
    sgn = np.where(np.arange(n + 2) % 2 == 0, 1.0, -1.0)
    sgn[0] = sgn[-1] = 0.0
    return x + nx * amp * sgn, y + ny * amp * sgn


def _rev(chain):
    cx, cy = chain
    return cx[::-1], cy[::-1]


def _rect_ring(i, notch=False, verticals=None):
    """Rectangle [2i, 2i+2] x [0, 2] with densified edges. The
    verticals are SHARED chains (passed in, bottom->top orientation):
    neighbors reuse the exact reversed vertex sequence — the identical-
    shared-boundary precondition a valid coverage (and GEOS
    CoverageSimplifier) requires. notch adds a > TOL spike on top."""
    pts_x, pts_y = [], []

    def add(chain):
        cx, cy = chain
        pts_x.extend(float(v) for v in cx[:-1])
        pts_y.extend(float(v) for v in cy[:-1])

    x0, x1 = 2.0 * i, 2.0 * i + 2.0
    add(_densify_zigzag((x0, 0.0), (x1, 0.0)))           # bottom
    add(verticals[i + 1])                                # right (shared, up)
    if notch:
        add(_densify_zigzag((x1, 2.0), (x0 + 1.0, 2.0)))
        pts_x.append(x0 + 1.0)
        pts_y.append(2.0)
        pts_x.append(x0 + 0.9)
        pts_y.append(3.5)                                 # spike > TOL
        add(_densify_zigzag((x0 + 0.8, 2.0), (x0, 2.0)))
    else:
        add(_densify_zigzag((x1, 2.0), (x0, 2.0)))       # top
    add(_rev(verticals[i]))                              # left (shared, down)
    return pts_x, pts_y


def _verticals(n):
    return {k: _densify_zigzag((2.0 * k, 0.0), (2.0 * k, 2.0))
            for k in range(n + 1)}


@pytest.fixture(scope="module")
def cov(spark):
    rows = []
    vert = _verticals(3)
    for i in range(3):
        xsv, ysv = _rect_ring(i, notch=(i == 1), verticals=vert)
        rows.append((i, xsv, ysv))
    return spark.createDataFrame(
        rows, "poly_id bigint, xs array<double>, ys array<double>")


def _edge_set(xsv, ysv, nd=9):
    n = len(xsv)
    out = set()
    for j in range(n):
        a = (round(xsv[j], nd), round(ysv[j], nd))
        b = (round(xsv[(j + 1) % n], nd), round(ysv[(j + 1) % n], nd))
        out.add((min(a, b), max(a, b)))
    return out


def test_shared_boundaries_stay_identical(spark, cov):
    out = {r["poly_id"]: r for r in
           simplify_coverage(cov, TOL).collect()}
    edges = {p: _edge_set(out[p]["xs"], out[p]["ys"]) for p in out}
    # the shared vertical between 0|1 and 1|2 must be the SAME segment
    # set on both sides (no gap/overlap possible)
    shared01 = edges[0] & edges[1]
    shared12 = edges[1] & edges[2]
    assert shared01 == {(((2.0, 0.0)), ((2.0, 2.0)))}
    assert shared12 == {(((4.0, 0.0)), ((4.0, 2.0)))}


def test_subtolerance_zigzags_collapse_and_notch_survives(spark, cov):
    out = {r["poly_id"]: r for r in simplify_coverage(cov, TOL).collect()}
    # plain rectangles collapse to their 4 corners
    for p in (0, 2):
        assert len(out[p]["xs"]) == 4, out[p]["xs"]
    # the notch polygon keeps its > TOL spike
    v1 = set(zip((round(v, 6) for v in out[1]["xs"]),
                 (round(v, 6) for v in out[1]["ys"])))
    assert (0.9 + 2.0, 3.5) in v1
    # junction corners (coverage nodes) survive exactly
    for p, corner in ((0, (2.0, 0.0)), (1, (2.0, 2.0)), (2, (4.0, 0.0))):
        assert corner in set(zip(out[p]["xs"], out[p]["ys"]))


def test_preserve_boundary_keeps_exterior_verbatim(spark, cov):
    out = {r["poly_id"]: r for r in
           simplify_coverage(cov, TOL, preserve_boundary=True).collect()}
    raw = {r["poly_id"]: r for r in cov.collect()}
    # polygon 0's bottom edge chain (exterior) must keep every zigzag
    # vertex; its right vertical (shared) still collapses
    v = set(zip(out[0]["xs"], out[0]["ys"]))
    raw_bottom = [(x, y) for x, y in zip(raw[0]["xs"], raw[0]["ys"])
                  if abs(y) < 0.2]
    for p in raw_bottom:
        assert p in v
    assert len(out[0]["xs"]) < len(raw[0]["xs"])  # shared side collapsed


def test_grid_coverage_edge_parity_property(spark):
    """5x4 grid of cells with densified shared boundaries: after
    simplification every interior segment must appear exactly twice
    (once per owner) — the no-gap/no-overlap invariant."""
    rows = []
    nxc, nyc = 5, 4
    H = {(gx, gy): _densify_zigzag((2.0 * gx, 2.0 * gy),
                                   (2.0 * gx + 2, 2.0 * gy), n=5, amp=0.03)
         for gx in range(nxc) for gy in range(nyc + 1)}
    V = {(gx, gy): _densify_zigzag((2.0 * gx, 2.0 * gy),
                                   (2.0 * gx, 2.0 * gy + 2), n=5, amp=0.03)
         for gx in range(nxc + 1) for gy in range(nyc)}
    for gy in range(nyc):
        for gx in range(nxc):
            pid = gy * nxc + gx
            px, py = [], []
            for cx, cy in (H[(gx, gy)], V[(gx + 1, gy)],
                           _rev(H[(gx, gy + 1)]), _rev(V[(gx, gy)])):
                px.extend(float(v) for v in cx[:-1])
                py.extend(float(v) for v in cy[:-1])
            rows.append((pid, px, py))
    cov = spark.createDataFrame(
        rows, "poly_id bigint, xs array<double>, ys array<double>")
    out = simplify_coverage(cov, TOL).collect()
    from collections import Counter

    cnt = Counter()
    for r in out:
        for e in _edge_set(r["xs"], r["ys"]):
            cnt[e] += 1
    assert cnt and max(cnt.values()) == 2
    for e, c in cnt.items():
        (x1, y1), (x2, y2) = e
        interior = (0 < x1 and x2 < 2.0 * nxc and 0 < y1 and y2 < 2.0 * nyc) \
            and not (y1 == y2 and y1 in (0.0, 2.0 * nyc)) \
            and not (x1 == x2 and x1 in (0.0, 2.0 * nxc))
        if x1 == x2 and 0 < x1 < 2.0 * nxc:
            assert c == 2, e  # interior vertical shared by 2 cells
        if y1 == y2 and 0 < y1 < 2.0 * nyc:
            assert c == 2, e  # interior horizontal shared by 2 cells
