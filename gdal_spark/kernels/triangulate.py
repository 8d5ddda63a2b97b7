"""Ear-clipping triangulation of simple polygons.

Purpose: generalize the layer-algebra boolean AREA operators to
NON-CONVEX polygons by decomposition — a simple polygon triangulates
into n-2 triangles (each convex), so intersection(A, B) area =
sum over triangle pairs of convex-convex clip areas (the SH kernel in
operators.spatial_join). This mirrors how the reference delegates
hard geometry to a robust kernel (GEOS) while the layer algebra only
orchestrates (ogrlayer.cpp:3290+); our "robust kernel" is
triangulation + convex clipping.

Standard ear-clipping (O(n^2), fine for per-feature vertex counts):
walk the ring, clip ears (convex vertex whose triangle contains no
other reflex vertex) until a triangle remains.
"""
from __future__ import annotations

import numpy as np


def _cross(o, a, b) -> float:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _point_in_tri(p, a, b, c) -> bool:
    d1 = _cross(a, b, p)
    d2 = _cross(b, c, p)
    d3 = _cross(c, a, p)
    has_neg = (d1 < 0) or (d2 < 0) or (d3 < 0)
    has_pos = (d1 > 0) or (d2 > 0) or (d3 > 0)
    return not (has_neg and has_pos)


def ear_clip(xs, ys) -> list[tuple[tuple[float, float], ...]]:
    """Triangulate a simple polygon ring (closed or open vertex list).
    Returns a list of ((x,y), (x,y), (x,y)) triangles whose areas sum
    to the polygon area. Raises ValueError on degenerate input."""
    pts = list(zip(map(float, xs), map(float, ys)))
    if len(pts) > 1 and pts[0] == pts[-1]:
        pts = pts[:-1]
    if len(pts) < 3:
        raise ValueError("not a polygon")
    # enforce CCW orientation
    area2 = sum(
        pts[i][0] * pts[(i + 1) % len(pts)][1]
        - pts[(i + 1) % len(pts)][0] * pts[i][1]
        for i in range(len(pts))
    )
    if area2 < 0:
        pts = pts[::-1]
    idx = list(range(len(pts)))
    tris = []
    guard = 0
    while len(idx) > 3 and guard < 10000:
        guard += 1
        n = len(idx)
        clipped = False
        for k in range(n):
            i0, i1, i2 = idx[(k - 1) % n], idx[k], idx[(k + 1) % n]
            a, b, c = pts[i0], pts[i1], pts[i2]
            if _cross(a, b, c) <= 0:  # reflex or collinear — not an ear
                continue
            # no other vertex inside the candidate ear
            if any(
                _point_in_tri(pts[j], a, b, c)
                for j in idx
                if j not in (i0, i1, i2)
            ):
                continue
            tris.append((a, b, c))
            idx.pop(k)
            clipped = True
            break
        if not clipped:
            raise ValueError("ear clipping failed (self-intersecting ring?)")
    tris.append((pts[idx[0]], pts[idx[1]], pts[idx[2]]))
    return tris


def triangle_area(tri) -> float:
    (ax, ay), (bx, by), (cx, cy) = tri
    return abs((bx - ax) * (cy - ay) - (cx - ax) * (by - ay)) / 2.0
