"""Greiner-Hormann boolean geometry kernel: pinned cases + fuzz
against the independently-proven triangle-soup area path."""
import numpy as np
import pytest

from gdal_spark.kernels.clip_poly import (
    classify_rings, clip_pair, ring_area, rings_area,
)
from gdal_spark.kernels.triangulate import ear_clip
from gdal_spark.operators.spatial_join import _convex_clip

L = np.array([[0, 0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10]], float)
R = np.array([[2, 2], [8, 2], [8, 8], [2, 8]], float)


def test_l_rect_intersection_ring():
    rings = clip_pair(L, R, "intersection")
    assert len(rings) == 1
    assert ring_area(rings[0]) == pytest.approx(20.0)
    got = {tuple(v) for v in rings[0][:-1]}
    assert got == {(2, 2), (8, 2), (8, 4), (4, 4), (4, 8), (2, 8)}


def test_l_rect_union():
    rings = clip_pair(L, R, "union")
    # area(L) = 100 - 36 = 64; union = 64 + 36 - 20 = 80
    assert rings_area(rings) == pytest.approx(80.0)


def test_containment_and_disjoint():
    S = np.array([[3, 3], [4, 3], [4, 4], [3, 4]], float)
    assert ring_area(clip_pair(S, R, "intersection")[0]) == pytest.approx(1.0)
    assert ring_area(clip_pair(S, R, "union")[0]) == pytest.approx(36.0)
    D = np.array([[20, 20], [21, 20], [21, 21], [20, 21]], float)
    assert clip_pair(D, R, "intersection") == []
    u = clip_pair(D, R, "union")
    assert len(u) == 2 and rings_area(u) == pytest.approx(37.0)


def test_union_with_hole():
    # C-shape (square with a notch to its left edge) + a strip that
    # seals the notch mouth -> the union encloses a hole. All
    # boundary crossings are proper (GH's generic-position contract;
    # collinear-overlap inputs belong to the triangle-soup area path).
    C1 = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 8],
                   [8, 8], [8, 2], [0, 2]], float)
    C2 = np.array([[-1, 1], [2.5, 1], [2.5, 9], [-1, 9]], float)
    rings = clip_pair(C1, C2, "union")
    cls = classify_rings(rings)
    holes = [r for r, h in cls if h]
    assert len(holes) == 1
    # hole = (2.5, 8) x (2, 8)
    assert ring_area(holes[0]) == pytest.approx(33.0)
    assert rings_area(rings) == pytest.approx(75.0)
    assert rings_area(clip_pair(C1, C2, "intersection")) == pytest.approx(5.0)


def _soup_area(A, B):
    tot = 0.0
    for ta in ear_clip(A[:, 0].tolist(), A[:, 1].tolist()):
        for tb in ear_clip(B[:, 0].tolist(), B[:, 1].tolist()):
            xa = [p[0] for p in ta] + [ta[0][0]]
            ya = [p[1] for p in ta] + [ta[0][1]]
            xb = [p[0] for p in tb] + [tb[0][0]]
            yb = [p[1] for p in tb] + [tb[0][1]]
            rx, ry = _convex_clip(xa, ya, xb, yb)
            if len(rx) >= 4:
                tot += 0.5 * abs(float(np.sum(
                    np.array(rx[:-1]) * np.array(ry[1:])
                    - np.array(rx[1:]) * np.array(ry[:-1]))))
    return tot


def test_fuzz_vs_triangle_soup():
    rng = np.random.default_rng(11)
    for _ in range(120):
        def rand_l():
            w, h = 2 + rng.random() * 8, 2 + rng.random() * 8
            w1, h1 = w * (0.2 + 0.5 * rng.random()), h * (0.2 + 0.5 * rng.random())
            base = np.array([[0, 0], [w, 0], [w, h1], [w1, h1], [w1, h], [0, h]])
            th = rng.random() * 2 * np.pi
            rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
            return base @ rot.T + rng.random(2) * 10

        A, B = rand_l(), rand_l()
        sp = _soup_area(A, B)
        assert rings_area(clip_pair(A, B, "intersection")) == pytest.approx(sp, abs=1e-6)
        aa = ring_area(np.vstack([A, A[:1]]))
        ab = ring_area(np.vstack([B, B[:1]]))
        assert rings_area(clip_pair(A, B, "union")) == pytest.approx(
            aa + ab - sp, abs=1e-6)


# ------------------------------------------- snap-rounding (robust path)

from gdal_spark.kernels.clip_poly import (  # noqa: E402
    DegenerateGeometryError, clip_pair_robust)


def _rect(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)


def test_robust_shared_edge():
    A, B = _rect(0, 0, 6, 4), _rect(6, 0, 12, 4)
    ru = clip_pair_robust(A, B, "union")
    assert len(ru) == 1 and len(ru[0]) - 1 == 4
    assert rings_area(ru) == 48.0
    assert clip_pair_robust(A, B, "intersection") == []


def test_robust_t_vertex():
    A = _rect(0, 0, 6, 4)
    B = np.array([[6, 2], [9, 0], [9, 4], [6, 2]], float)
    ru = clip_pair_robust(A, B, "union")
    assert len(ru) == 1 and len(ru[0]) - 1 == 8
    assert rings_area(ru) == 24.0 + 6.0  # rect 24 + triangle 0.5*4*3
    assert clip_pair_robust(A, B, "intersection") == []


def test_robust_shared_corner():
    A, B = _rect(0, 0, 6, 4), _rect(6, 4, 10, 8)
    ru = clip_pair_robust(A, B, "union")
    assert len(ru) == 1 and len(ru[0]) - 1 == 8
    assert rings_area(ru) == 40.0
    assert clip_pair_robust(A, B, "intersection") == []


def test_robust_collinear_overlap():
    A, B = _rect(0, 0, 6, 4), _rect(3, 0, 9, 4)
    ri = clip_pair_robust(A, B, "intersection")
    assert rings_area(ri) == 12.0 and len(ri[0]) - 1 == 4
    ru = clip_pair_robust(A, B, "union")
    assert rings_area(ru) == 36.0 and len(ru[0]) - 1 == 4


def test_robust_identical_rings():
    A = _rect(0, 0, 6, 4)
    assert rings_area(clip_pair_robust(A, _rect(0, 0, 6, 4), "union")) == 24.0
    assert rings_area(clip_pair_robust(A, _rect(0, 0, 6, 4), "intersection")) == 24.0


def test_robust_matches_plain_on_generic_pairs():
    A, B = _rect(0, 0, 6, 4), _rect(3, 1, 9, 3)
    assert rings_area(clip_pair_robust(A, B, "intersection")) == 6.0
    assert rings_area(clip_pair_robust(A, B, "union")) == 30.0


def test_difference_hole_outer_witness_inside_hole():
    """Regression (hypothesis seed 258052): B strictly inside A ->
    difference is A with hole B. classify_rings must not mark the
    OUTER as a hole just because its interior witness (ear centroid)
    happens to land inside the hole ring — a hole can only nest in a
    strictly larger ring."""
    A = np.array([[0.2124848834222304, 8.815870794376943],
                  [1.9194390990179433, 0.4365267581243715],
                  [3.638176624407641, 0.36322793807257003],
                  [9.488324078914738, 1.7659185503698427],
                  [9.493969810185337, 9.929353715519646]])
    B = np.array([[2.071937951696483, 6.080140711433989],
                  [3.2461626776240324, 1.435948450895289],
                  [5.872207872253455, 0.9996550822908534],
                  [8.929128962888717, 5.952009833184217],
                  [9.240441085548515, 6.807281079498113],
                  [8.919723154887269, 9.268485065611843],
                  [3.2681215168075664, 7.22545926136946]])
    aa = ring_area(np.vstack([A, A[:1]]))
    ab = ring_area(np.vstack([B, B[:1]]))
    d = clip_pair(A, B, "difference")
    cls = classify_rings(d)
    assert sorted(h for _, h in cls) == [False, True]
    assert rings_area(d) == pytest.approx(aa - ab)
