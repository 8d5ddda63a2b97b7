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
