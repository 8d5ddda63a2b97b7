"""Boundary-pinning tests for the ray-cast PIP kernel.

Expected values hand-derived from the reference crossing rule
(ogrlinearring.cpp:503-531): strict `0 < intersection`, straddle test
`(y1>0 and y2<=0) or (y2>0 and y1<=0)`.  The asymmetric edge behavior
(left/bottom edges inside, right/top outside, for a CCW unit square) is
a direct consequence of that rule and is asserted literally.
"""
from __future__ import annotations

import numpy as np

from gdal_spark.kernels.pip import point_in_polygon, point_in_ring

SQUARE = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]])


def test_interior_and_exterior():
    xs = np.array([0.5, 1.5, -0.5, 0.5, 0.5])
    ys = np.array([0.5, 0.5, 0.5, 1.5, -0.5])
    np.testing.assert_array_equal(
        point_in_ring(xs, ys, SQUARE), [True, False, False, False, False]
    )


def test_edge_and_corner_rule():
    # hand-derived from the crossing rule (see module docstring):
    cases = {
        (0.0, 0.5): True,   # left edge: crossing at x=1 counted, x=0 not (0<0 false)
        (1.0, 0.5): False,  # right edge: the x=0 intersection isn't strictly >0
        (0.5, 0.0): True,   # bottom edge
        (0.5, 1.0): False,  # top edge (horizontal edges never straddle)
        (0.0, 0.0): True,   # bottom-left corner
        (1.0, 1.0): False,  # top-right corner
        (1.0, 0.0): False,  # bottom-right corner
        (0.0, 1.0): False,  # top-left corner
    }
    xs = np.array([c[0] for c in cases])
    ys = np.array([c[1] for c in cases])
    np.testing.assert_array_equal(point_in_ring(xs, ys, SQUARE), list(cases.values()))


def test_unclosed_ring_is_closed_automatically():
    open_ring = SQUARE[:-1]
    assert point_in_ring(np.array([0.5]), np.array([0.5]), open_ring)[0]


def test_degenerate_rings_reject_all():
    assert not point_in_ring(np.array([0.0]), np.array([0.0]), SQUARE[:2]).any()


def test_orientation_invariance():
    cw = SQUARE[::-1].copy()
    xs = np.array([0.5, 2.0])
    ys = np.array([0.5, 2.0])
    np.testing.assert_array_equal(point_in_ring(xs, ys, cw), point_in_ring(xs, ys, SQUARE))


def test_concave_polygon():
    # U-shape: notch cut from the top
    u = np.array([[0, 0], [3, 0], [3, 3], [2, 3], [2, 1], [1, 1], [1, 3], [0, 3], [0, 0]],
                 dtype=float)
    xs = np.array([0.5, 1.5, 2.5, 1.5])
    ys = np.array([2.0, 2.0, 2.0, 0.5])
    np.testing.assert_array_equal(point_in_ring(xs, ys, u), [True, False, True, True])


def test_polygon_with_hole():
    outer = SQUARE * 4.0
    hole = SQUARE + np.array([1.0, 1.0])
    xs = np.array([0.5, 1.5, 3.0])
    ys = np.array([0.5, 1.5, 3.0])
    np.testing.assert_array_equal(
        point_in_polygon(xs, ys, [outer, hole]), [True, False, True]
    )


def test_envelope_pretest_shortcut_equals_full_eval():
    rng = np.random.default_rng(11)
    tri = np.array([[0, 0], [10, 0], [5, 8], [0, 0]], dtype=float)
    xs = rng.uniform(-5, 15, 500)
    ys = rng.uniform(-5, 15, 500)
    np.testing.assert_array_equal(
        point_in_ring(xs, ys, tri, test_envelope=True),
        point_in_ring(xs, ys, tri, test_envelope=False),
    )


def test_yband_index_matches_dense_kernel():
    """The y-band edge index (engaged at >=256 edges and >=256 points)
    must be bit-identical to the dense all-edges evaluation, including
    points sitting exactly on vertices and horizontal edges."""
    from gdal_spark.kernels.pip import _ray_crossings

    rng = np.random.default_rng(1234)
    for m, n in [(256, 256), (999, 4000), (4096, 2000), (513, 300)]:
        th = np.sort(rng.uniform(0, 2 * np.pi, m))
        r = 1 + 0.4 * np.sin(7 * th)
        ring = np.column_stack([r * np.cos(th), r * np.sin(th)])
        ring = np.vstack([ring, ring[:1]])
        xs = rng.uniform(-1.6, 1.6, n)
        ys = rng.uniform(-1.6, 1.6, n)
        k = min(n // 2, m)
        xs[:k], ys[:k] = ring[:k, 0], ring[:k, 1]  # on-vertex adversaries
        got = point_in_ring(xs, ys, ring)
        mask = (
            (xs >= ring[:, 0].min())
            & (xs <= ring[:, 0].max())
            & (ys >= ring[:, 1].min())
            & (ys <= ring[:, 1].max())
        )
        c = _ray_crossings(
            xs[mask], ys[mask],
            ring[1:, 0], ring[1:, 1], ring[:-1, 0], ring[:-1, 1],
        )
        exp = np.zeros(n, dtype=bool)
        exp[mask] = (c % 2).astype(bool)
        np.testing.assert_array_equal(got, exp)


def test_yband_horizontal_edges_on_boundary():
    # Rectangle inflated to 600 collinear vertices per side so the band
    # path engages; horizontal-edge boundary rule must be unchanged.
    t = np.linspace(0.0, 1.0, 150, endpoint=False)
    bottom = np.column_stack([10 * t, np.zeros_like(t)])
    right = np.column_stack([np.full_like(t, 10.0), 5 * t])
    top = np.column_stack([10 - 10 * t, np.full_like(t, 5.0)])
    left = np.column_stack([np.zeros_like(t), 5 - 5 * t])
    ring = np.vstack([bottom, right, top, left, [[0.0, 0.0]]])
    xs = np.repeat([5.0, 5.0, 0.0, 10.0, 5.0], 60).astype(float)
    ys = np.repeat([0.0, 5.0, 2.5, 2.5, 2.5], 60).astype(float)
    exp = np.repeat([True, False, True, False, True], 60)
    np.testing.assert_array_equal(point_in_ring(xs, ys, ring), exp)


def test_yband_engages_at_exact_threshold():
    """All 256 points drawn INSIDE the ring bbox so the banded path
    really engages at its activation boundary (the random-box variant
    above can drop below 256 after the envelope mask)."""
    rng = np.random.default_rng(5)
    m, n = 256, 256
    th = np.sort(rng.uniform(0, 2 * np.pi, m))
    r = 1 + 0.3 * np.sin(5 * th)
    ring = np.column_stack([r * np.cos(th), r * np.sin(th)])
    ring = np.vstack([ring, ring[:1]])
    xs = rng.uniform(ring[:, 0].min(), ring[:, 0].max(), n)
    ys = rng.uniform(ring[:, 1].min(), ring[:, 1].max(), n)
    got = point_in_ring(xs, ys, ring, test_envelope=False)
    from gdal_spark.kernels.pip import _ray_crossings
    c = _ray_crossings(xs, ys, ring[1:, 0], ring[1:, 1],
                       ring[:-1, 0], ring[:-1, 1])
    np.testing.assert_array_equal(got, (c % 2).astype(bool))


def test_yband_nonfinite_points_do_not_poison_bands():
    """A NaN/inf y (or x) must classify as outside WITHOUT zeroing the
    valid points that share its band (reachable via
    test_envelope=False only)."""
    rng = np.random.default_rng(11)
    m, n = 300, 300
    th = np.sort(rng.uniform(0, 2 * np.pi, m))
    ring = np.column_stack([np.cos(th), np.sin(th)])
    ring = np.vstack([ring, ring[:1]])
    xs = rng.uniform(-0.9, 0.9, n)
    ys = rng.uniform(-0.9, 0.9, n)
    dense = point_in_ring(xs, ys, ring, test_envelope=True)
    for bad_val, idx in ((np.nan, 0), (np.inf, 150), (-np.inf, n - 1)):
        ys2 = ys.copy()
        ys2[idx] = bad_val
        got = point_in_ring(xs, ys2, ring, test_envelope=False)
        exp = dense.copy()
        exp[idx] = False
        np.testing.assert_array_equal(got, exp, err_msg=f"y={bad_val}")
    xs2 = xs.copy()
    xs2[7] = np.nan
    got = point_in_ring(xs2, ys, ring, test_envelope=False)
    exp = dense.copy()
    exp[7] = False
    np.testing.assert_array_equal(got, exp)
