"""Delaunay kernel + linear gridding: structural invariants and
non-planar interpolation properties the plane-oracle can't see."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.kernels import delaunay


def test_triangulation_structure():
    rng = np.random.default_rng(5)
    pts = rng.random((40, 2)) * 100
    tris = delaunay.triangulate(pts)
    # Euler: for n points with h on the hull, triangles = 2n - h - 2
    def hull_count(p):
        p2 = sorted(map(tuple, p))
        def half(pp):
            h = []
            for q in pp:
                while len(h) >= 2 and (h[-1][0]-h[-2][0])*(q[1]-h[-2][1]) - (h[-1][1]-h[-2][1])*(q[0]-h[-2][0]) <= 0:
                    h.pop()
                h.append(q)
            return h
        return len(half(p2)) + len(half(p2[::-1])) - 2
    h = hull_count(pts)
    assert len(tris) == 2 * 40 - h - 2
    # total triangle area == hull area
    def tri_area(i, j, k):
        (ax, ay), (bx, by), (cx, cy) = pts[i], pts[j], pts[k]
        return 0.5 * abs((bx-ax)*(cy-ay) - (by-ay)*(cx-ax))
    tot = sum(tri_area(*t) for t in tris)
    # hull area via shoelace of hull points
    p2 = sorted(map(tuple, pts))
    def half(pp):
        hh = []
        for q in pp:
            while len(hh) >= 2 and (hh[-1][0]-hh[-2][0])*(q[1]-hh[-2][1]) - (hh[-1][1]-hh[-2][1])*(q[0]-hh[-2][0]) <= 0:
                hh.pop()
            hh.append(q)
        return hh
    hull = half(p2)[:-1] + half(p2[::-1])[:-1]
    ha = 0.5 * abs(sum(hull[i][0]*hull[(i+1) % len(hull)][1] - hull[(i+1) % len(hull)][0]*hull[i][1]
                       for i in range(len(hull))))
    assert tot == pytest.approx(ha, rel=1e-9)
    # Delaunay property: no point strictly inside any circumcircle
    for (i, j, k) in tris:
        ux, uy, r2 = delaunay._circumcircle(*pts[i], *pts[j], *pts[k])
        d2 = (pts[:, 0] - ux) ** 2 + (pts[:, 1] - uy) ** 2
        inside = d2 < r2 * (1 - 1e-12)
        inside[[i, j, k]] = False
        assert not inside.any()


def test_grid_linear_interpolates_data_points(spark):
    """Nodes placed exactly AT data points recover the data values,
    planar or not."""
    from gdal_spark.operators import focal

    rng = np.random.default_rng(9)
    xy = rng.random((25, 2)) * 100
    v = np.sin(xy[:, 0] / 13.0) * 40 + xy[:, 1] ** 1.5 / 10  # non-planar
    xyv = [(float(x), float(y), float(val)) for (x, y), val in zip(xy, v)]
    nodes = spark.createDataFrame(
        [(i, 0, float(x), float(y)) for i, (x, y) in enumerate(xy)],
        "i bigint, j bigint, x double, y double",
    )
    out = {r["i"]: r["value"] for r in focal.grid_linear(spark, xyv, nodes).collect()}
    for i, (_, _, val) in enumerate(xyv):
        assert out[i] == pytest.approx(val, abs=1e-8)
