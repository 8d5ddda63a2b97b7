"""Delaunay triangulation — Bowyer-Watson, re-derived from the
published algorithm (the reference links qhull through alg/delaunay.c
GDALTriangulationCreateDelaunay for its GGA_Linear gridding).

Deterministic: points are processed in input order, ties in the
incircle test cannot occur for generic-position inputs (the hash
fixtures guarantee it). Returns triangles as index triples into the
input array.

Scale note (the Spark operators build on this): gridding inputs are
the SMALL side (scattered observations); the triangulation is built
once driver-side exactly like the reference's single-node
GDALTriangulation, then broadcast — the huge side (grid nodes /
pixels) only ever sees a projection + barycentric test.
"""
from __future__ import annotations

import numpy as np


def _circumcircle(ax, ay, bx, by, cx, cy):
    """(ux, uy, r2) of the circumcircle; degenerate -> r2 = inf."""
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if d == 0.0:
        return 0.0, 0.0, float("inf")
    a2 = ax * ax + ay * ay
    b2 = bx * bx + by * by
    c2 = cx * cx + cy * cy
    ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
    uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
    r2 = (ax - ux) ** 2 + (ay - uy) ** 2
    return ux, uy, r2


def triangulate(xy: np.ndarray) -> list[tuple[int, int, int]]:
    """Bowyer-Watson Delaunay of (n, 2) points -> list of index
    triples (CCW order not guaranteed)."""
    pts = np.asarray(xy, dtype=np.float64)
    n = pts.shape[0]
    if n < 3:
        return []
    # super-triangle comfortably containing everything
    minx, miny = pts.min(axis=0)
    maxx, maxy = pts.max(axis=0)
    dmax = max(maxx - minx, maxy - miny, 1.0)
    midx, midy = (minx + maxx) / 2.0, (miny + maxy) / 2.0
    # margin matters: a near super-triangle distorts hull-adjacent
    # circumcircles and loses hull triangles (measured at 20x on a
    # 40-point fixture); 1000x is safely far while keeping the
    # incircle arithmetic well inside double precision
    m = 1000.0
    sp = np.array([
        [midx - m * dmax, midy - (m / 2.0) * dmax],
        [midx, midy + m * dmax],
        [midx + m * dmax, midy - (m / 2.0) * dmax],
    ])
    allp = np.vstack([pts, sp])
    s0, s1, s2 = n, n + 1, n + 2
    # triangle store: (i, j, k, ux, uy, r2)
    tris = []

    def add_tri(i, j, k):
        ux, uy, r2 = _circumcircle(*allp[i], *allp[j], *allp[k])
        tris.append((i, j, k, ux, uy, r2))

    add_tri(s0, s1, s2)
    for p in range(n):
        px, py = allp[p]
        bad = []
        for t in tris:
            dx = px - t[3]
            dy = py - t[4]
            if dx * dx + dy * dy < t[5]:
                bad.append(t)
        # boundary of the cavity = edges appearing exactly once
        edge_count: dict = {}
        for t in bad:
            for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                key = (a, b) if a < b else (b, a)
                edge_count[key] = edge_count.get(key, 0) + 1
        for t in bad:
            tris.remove(t)
        for (a, b), c in edge_count.items():
            if c == 1:
                add_tri(a, b, p)
    return [
        (t[0], t[1], t[2]) for t in tris
        if t[0] < n and t[1] < n and t[2] < n
    ]


def barycentric(px, py, ax, ay, bx, by, cx, cy):
    """(l1, l2, l3) barycentric coords of (px, py); vectorized over
    points."""
    d = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
    l1 = ((by - cy) * (px - cx) + (cx - bx) * (py - cy)) / d
    l2 = ((cy - ay) * (px - cx) + (ax - cx) * (py - cy)) / d
    return l1, l2, 1.0 - l1 - l2
