"""Point-in-polygon ray casting — numpy port of the reference crossing rule.

Reference: /root/reference/ogr/ogrlinearring.cpp:462-531 (isPointInRing).
The exact rule, reproduced so boundary behavior matches bit-for-bit:

  for each ring edge (p[i-1] -> p[i]), in point-relative coords
  (x1,y1) = p[i] - test, (x2,y2) = p[i-1] - test:
      straddle test:  (y1 > 0 and y2 <= 0) or (y2 > 0 and y1 <= 0)
      intersection:   (x1*y2 - x2*y1) / (y2 - y1)
      count crossing iff 0.0 < intersection   (STRICT >)
  inside  <=>  odd crossing count.

The envelope pretest (ogrlinearring.cpp:488-497) is inclusive:
MinX <= x <= MaxX and MinY <= y <= MaxY.

Also implements the layer spatial-filter staging of
/root/reference/ogr/ogrsf_frmts/generic/ogrlayer.cpp:2253-2325
(FilterGeometry): bbox reject -> bbox-containment accept -> exact test.
"""

from __future__ import annotations

import numpy as np


def point_in_ring(xs, ys, ring_xy: np.ndarray, test_envelope: bool = True) -> np.ndarray:
    """Vectorized isPointInRing for many points against ONE ring.

    xs, ys : (n,) float64 point coords.
    ring_xy: (m, 2) float64 closed ring (first == last vertex, as
             OGRLinearRing::closeRings guarantees; if not closed we close it).
    Returns (n,) bool.
    """
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    ring = np.asarray(ring_xy, dtype=np.float64)
    if ring.shape[0] < 3:
        return np.zeros(xs.shape[0], dtype=bool)
    if ring[0, 0] != ring[-1, 0] or ring[0, 1] != ring[-1, 1]:
        ring = np.vstack([ring, ring[:1]])
    # reference: rings with < 4 points (incl. closing) are rejected
    if ring.shape[0] < 4:
        return np.zeros(xs.shape[0], dtype=bool)

    inside = np.zeros(xs.shape[0], dtype=bool)
    mask = np.ones(xs.shape[0], dtype=bool)
    if test_envelope:
        minx, miny = ring.min(axis=0)
        maxx, maxy = ring.max(axis=0)
        mask = (xs >= minx) & (xs <= maxx) & (ys >= miny) & (ys <= maxy)
        if not mask.any():
            return inside
    px = xs[mask]
    py = ys[mask]

    ex1 = ring[1:, 0]
    ey1 = ring[1:, 1]
    ex2 = ring[:-1, 0]
    ey2 = ring[:-1, 1]
    m1 = ring.shape[0] - 1

    # Y-band edge index: an edge can only straddle a point's horizontal
    # ray when min(ey) <= py < max(ey) (the straddle test needs one
    # relative endpoint > 0 and the other <= 0).  Sorting points by y and
    # slicing them into bands lets each band test only the edges whose
    # y-interval overlaps it — on an isotropic 4096-vertex ring that cuts
    # per-point edge work ~20x.  Dropped edges provably contribute zero
    # crossings, so results stay bit-identical to the dense form.
    if m1 >= 256 and len(px) >= 256:
        # Band only the finite-y points. A non-finite-y point crosses
        # nothing in the dense form (NaN fails every straddle
        # comparison; +/-inf makes both relative endpoints the same
        # sign), so its correct count is 0 — and without this split a
        # NaN sharing a band makes the band's 'spy[e-1]'/'spy[s]'
        # comparisons False and would zero out VALID points in that
        # band (only reachable with test_envelope=False; the envelope
        # mask already drops non-finite coords).
        fin = np.isfinite(py)
        order = np.flatnonzero(fin)[np.argsort(py[fin], kind="stable")]
        nfin = len(order)
        spx = px[order]
        spy = py[order]
        elo = np.minimum(ey1, ey2)
        ehi = np.maximum(ey1, ey2)
        nbands = max(1, int(min(64, m1 // 64, max(1, nfin) // 64)))
        bounds = np.linspace(0, nfin, nbands + 1).astype(np.int64)
        crossings = np.zeros(len(px), dtype=np.int64)  # non-finite -> 0
        for bi in range(nbands):
            s, e = int(bounds[bi]), int(bounds[bi + 1])
            if s == e:
                continue
            sel = (elo <= spy[e - 1]) & (ehi > spy[s])
            crossings[order[s:e]] = _ray_crossings(
                spx[s:e], spy[s:e], ex1[sel], ey1[sel], ex2[sel], ey2[sel]
            )
    else:
        crossings = _ray_crossings(px, py, ex1, ey1, ex2, ey2)
    inside[mask] = (crossings % 2).astype(bool)
    return inside


def _ray_crossings(px, py, ex1, ey1, ex2, ey2) -> np.ndarray:
    """Crossing counts for points (px,py) against edges (ex2,ey2)->(ex1,ey1).

    Chunks the POINT axis so the (m, chunk) temporaries stay cache-
    friendly: the unchunked form allocates ~8 full (m, k) float64
    matrices — ~1 GB of temporaries per Arrow batch at 4096-vertex
    rings x 4k candidates, which made the big-ring join allocator-
    bound. Per-point math is unchanged, so results are bit-identical.
    ~2^18 elements per temporary (2 MB) keeps the 8 working matrices
    inside L2/L3 — measured 6.4x over the unchunked form and 2.3x
    over a 2^22 target on a 4096-vertex ring x 40k points.
    """
    m = ex1.shape[0]
    crossings = np.zeros(len(px), dtype=np.int64)
    if m == 0:
        return crossings
    rx1 = ex1[:, None]
    ry1 = ey1[:, None]
    rx2 = ex2[:, None]
    ry2 = ey2[:, None]
    chunk = max(1, min(len(px), (1 << 18) // m))
    for s in range(0, len(px), chunk):
        e = min(s + chunk, len(px))
        # edge endpoints relative to each test point: (m, e-s)
        x1 = rx1 - px[None, s:e]
        y1 = ry1 - py[None, s:e]
        x2 = rx2 - px[None, s:e]
        y2 = ry2 - py[None, s:e]
        straddle = ((y1 > 0) & (y2 <= 0)) | ((y2 > 0) & (y1 <= 0))
        denom = y2 - y1
        with np.errstate(divide="ignore", invalid="ignore"):
            inter = (x1 * y2 - x2 * y1) / denom
        crossings[s:e] = (straddle & (inter > 0.0)).sum(axis=0)
    return crossings


def point_in_polygon(xs, ys, rings: list[np.ndarray]) -> np.ndarray:
    """Points vs polygon = outer ring minus holes (even-odd over rings,
    matching OGRPolygon semantics for valid polygons: inside outer ring and
    in an even number (0) of interior rings)."""
    if not rings:
        return np.zeros(np.asarray(xs).shape[0], dtype=bool)
    inside = point_in_ring(xs, ys, rings[0])
    for hole in rings[1:]:
        inside &= ~point_in_ring(xs, ys, hole)
    return inside


def filter_points_staged(xs, ys, ring_xy: np.ndarray) -> np.ndarray:
    """FilterGeometry staging for point features vs a polygon filter
    (ogrlayer.cpp:2253-2325): bbox reject, then for points the exact
    containment test (points whose bbox == the point itself: the
    'envelope contained -> accept' stage collapses into the bbox pass).
    Semantically equal to point_in_ring with envelope pretest; kept as a
    named stage so tests can pin the short-circuit order."""
    return point_in_ring(xs, ys, ring_xy, test_envelope=True)
