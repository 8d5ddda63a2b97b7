"""Polygon-pair boolean RESULT GEOMETRY — Greiner-Hormann clipping.

The reference's layer algebra (OGRLayer::Intersection / Union,
ogr/ogrlayer.cpp:3345, :3763) emits merged feature geometries via GEOS.
This kernel re-derives the classic Greiner-Hormann (1998) clipping
algorithm from the published description for SIMPLE polygons in
generic position (no vertex-on-edge / collinear-overlap degeneracies —
the deterministic fixtures guarantee this; degenerate inputs should go
through the triangle-soup area path which is robust to them):

  1. insert all proper edge-edge intersection points into both vertex
     rings, linked as neighbour pairs, each tagged entry/exit by
     alternation from a point-in-polygon seed;
  2. trace: from an unvisited intersection, walk the subject ring
     forward on entry / backward on exit, switching rings at each
     intersection, until the start point closes the ring.

Supports Intersection and Union (the entry/exit roles flip). The
traced ring vertex set is exactly {A-vertices in B} + {B-vertices in
A} + {proper edge crossings} — the property the SQL oracle checks.

Containment/disjoint cases (no crossings) resolve by PIP: A-in-B ->
A (intersection) / B (union), etc.
"""
from __future__ import annotations

import numpy as np

from .pip import point_in_ring


class DegenerateGeometryError(ValueError):
    """Input pair violates the generic-position contract (vertex-on-
    edge / collinear overlap / shared vertex). Callers route such
    pairs through clip_pair_robust (snap-rounding) or the
    triangle-soup area path."""


class _V:
    __slots__ = ("x", "y", "nxt", "prv", "neighbour", "inter", "entry",
                 "visited", "alpha")

    def __init__(self, x: float, y: float, inter: bool = False,
                 alpha: float = 0.0):
        self.x = x
        self.y = y
        self.nxt = None
        self.prv = None
        self.neighbour = None
        self.inter = inter
        self.entry = True
        self.visited = False
        self.alpha = alpha


def _ring(points) -> _V:
    """Build a circular doubly-linked list; returns the head vertex.
    `points` is an (n, 2) open ring (no repeated closing vertex)."""
    head = None
    prev = None
    for x, y in points:
        v = _V(float(x), float(y))
        if head is None:
            head = v
            v.nxt = v
            v.prv = v
        else:
            v.prv = prev
            v.nxt = head
            prev.nxt = v
            head.prv = v
        prev = v
    return head


def _iter(head: _V):
    v = head
    while True:
        yield v
        v = v.nxt
        if v is head:
            break


def _seg_intersect(p1, p2, q1, q2):
    """Proper segment intersection: returns (t, u, x, y) with
    0 < t < 1 and 0 < u < 1, else None. Fixed op order (shared with
    the SQL oracle): d1 = p2-p1, d2 = q2-q1, denom = cross(d1, d2),
    t = cross(q1-p1, d2)/denom, u = cross(q1-p1, d1)/denom."""
    d1x, d1y = p2[0] - p1[0], p2[1] - p1[1]
    d2x, d2y = q2[0] - q1[0], q2[1] - q1[1]
    denom = d1x * d2y - d1y * d2x
    if denom == 0.0:
        return None
    ex, ey = q1[0] - p1[0], q1[1] - p1[1]
    t = (ex * d2y - ey * d2x) / denom
    u = (ex * d1y - ey * d1x) / denom
    if 0.0 < t < 1.0 and 0.0 < u < 1.0:
        return (t, u, p1[0] + t * d1x, p1[1] + t * d1y)
    return None


def _insert_sorted(edge_start: _V, v: _V):
    """Insert intersection vertex after edge_start, keeping alpha
    order among consecutive intersections on the same edge."""
    pos = edge_start
    while pos.nxt.inter and pos.nxt.alpha < v.alpha:
        pos = pos.nxt
    v.nxt = pos.nxt
    v.prv = pos
    pos.nxt.prv = v
    pos.nxt = v


def _close(ring_pts: list) -> np.ndarray:
    arr = np.asarray(ring_pts, dtype=np.float64)
    return np.vstack([arr, arr[:1]])


def clip_pair(subject: np.ndarray, clip: np.ndarray, op: str = "intersection"):
    """Greiner-Hormann boolean of two simple rings (open or closed
    input; closed rings are opened). Returns list of CLOSED (m, 2)
    rings. op in {'intersection', 'union'}."""
    A = np.asarray(subject, dtype=np.float64)
    B = np.asarray(clip, dtype=np.float64)
    if (A[0] == A[-1]).all():
        A = A[:-1]
    if (B[0] == B[-1]).all():
        B = B[:-1]

    sh = _ring(A)
    ch = _ring(B)

    # phase 1: intersections
    found = False
    sv = sh
    while True:
        sn = sv.nxt
        while sn.inter:
            sn = sn.nxt
        cv = ch
        while True:
            cn = cv.nxt
            while cn.inter:
                cn = cn.nxt
            hit = _seg_intersect((sv.x, sv.y), (sn.x, sn.y),
                                 (cv.x, cv.y), (cn.x, cn.y))
            if hit is not None:
                found = True
                t, u, x, y = hit
                i1 = _V(x, y, inter=True, alpha=t)
                i2 = _V(x, y, inter=True, alpha=u)
                i1.neighbour = i2
                i2.neighbour = i1
                _insert_sorted(sv, i1)
                _insert_sorted(cv, i2)
            cv = cn
            if cv is ch:
                break
        sv = sn
        if sv is sh:
            break

    closedA = _close(A)
    closedB = _close(B)
    if not found:
        a_in_b = bool(point_in_ring(A[:1, 0], A[:1, 1], closedB)[0])
        b_in_a = bool(point_in_ring(B[:1, 0], B[:1, 1], closedA)[0])
        if op == "intersection":
            if a_in_b:
                return [closedA]
            if b_in_a:
                return [closedB]
            return []
        if op == "difference":  # A \ B
            if a_in_b:
                return []
            if b_in_a:
                return [closedA, closedB]  # B becomes a hole of A
            return [closedA]
        # union
        if a_in_b:
            return [closedB]
        if b_in_a:
            return [closedA]
        return [closedA, closedB]  # disjoint: two parts

    # phase 2: entry/exit tagging by alternation from a PIP seed.
    # For union the roles flip on BOTH rings (trace the outside arcs);
    # for difference (A \ B) only the subject flips.
    def tag(head: _V, other_closed: np.ndarray, flip: bool):
        first = head
        status = bool(point_in_ring(np.array([first.x]), np.array([first.y]),
                                    other_closed)[0])
        # next intersection toggles to the opposite state: entering if
        # currently outside
        entry = not status
        if flip:
            entry = not entry
        for v in _iter(head):
            if v.inter:
                v.entry = entry
                entry = not entry

    tag(sh, closedB, flip=op in ("union", "difference"))
    tag(ch, closedA, flip=op == "union")

    # phase 3: trace
    rings = []
    while True:
        start = None
        for v in _iter(sh):
            if v.inter and not v.visited:
                start = v
                break
        if start is None:
            break
        ring = []
        cur = start
        while True:
            cur.visited = True
            if cur.neighbour is not None:
                cur.neighbour.visited = True
            if cur.entry:
                while True:
                    ring.append((cur.x, cur.y))
                    cur = cur.nxt
                    if cur.inter:
                        break
            else:
                while True:
                    ring.append((cur.x, cur.y))
                    cur = cur.prv
                    if cur.inter:
                        break
            cur = cur.neighbour
            if cur is start or cur.neighbour is start:
                break
            if cur.visited and cur is not start:
                # re-entering a visited intersection before closing the
                # ring can only happen when the generic-position
                # contract is violated; emitting the partial ring would
                # silently corrupt downstream areas/vertex sets
                raise DegenerateGeometryError(
                    "clip_pair: trace re-entered a visited intersection "
                    "— input violates generic position; use "
                    "clip_pair_robust or the area path"
                )
        if len(ring) >= 3:
            rings.append(_close(ring))
    return rings


def ring_area(ring: np.ndarray) -> float:
    """|shoelace|/2 of a closed ring."""
    r = np.asarray(ring, dtype=np.float64)
    return 0.5 * abs(float(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1])))


def _interior_witness(ring: np.ndarray) -> tuple[float, float]:
    """A point strictly inside a simple closed ring: first ear centroid
    that passes the ring's own PIP test (exists for any simple ring)."""
    r = np.asarray(ring, dtype=np.float64)[:-1]
    n = r.shape[0]
    closed = np.vstack([r, r[:1]])
    for i in range(n):
        c = (r[i - 1] + r[i] + r[(i + 1) % n]) / 3.0
        if bool(point_in_ring(np.array([c[0]]), np.array([c[1]]), closed)[0]):
            return float(c[0]), float(c[1])
    # fallback: vertex mean (convex rings)
    m = r.mean(axis=0)
    return float(m[0]), float(m[1])


def classify_rings(rings: list) -> list:
    """[(ring, is_hole)]: a traced ring is a HOLE iff its interior lies
    inside another, STRICTLY LARGER traced ring (union of two simple
    polygons nests at most one level, and a hole is always smaller
    than its container). The area guard matters: an outer ring's
    interior witness can legitimately land inside its own hole (e.g.
    difference A\\B with B strictly inside A — the ear centroid of A
    may fall in B), and without it the outer would be misclassified as
    a hole of its hole. Traversal orientation is not trusted — GH hole
    rings can come out either winding."""
    areas = [ring_area(r) for r in rings]
    out = []
    for i, r in enumerate(rings):
        wx, wy = _interior_witness(r)
        hole = False
        for j, other in enumerate(rings):
            if i == j or areas[j] <= areas[i]:
                continue
            if bool(point_in_ring(np.array([wx]), np.array([wy]), other)[0]):
                hole = True
                break
        out.append((r, hole))
    return out


def rings_area(rings: list) -> float:
    """Total area of a traced ring set: outers minus holes."""
    return sum((-1.0 if hole else 1.0) * ring_area(r)
               for r, hole in classify_rings(rings))


# ------------------------------------------------ snap-rounding (robust)

def _snap(arr: np.ndarray, grid: float) -> np.ndarray:
    return np.round(np.asarray(arr, dtype=np.float64) / grid) * grid


def canon_ring(ring: np.ndarray, grid: float) -> np.ndarray | None:
    """Canonicalize a traced ring on the snap grid: quantize vertices,
    drop consecutive duplicates, drop vertices that lie BETWEEN their
    collinear neighbours (crossing points that snapped onto an edge
    interior), drop rings that collapse (<3 vertices or zero area).
    Returns a CLOSED (m, 2) ndarray or None. All comparisons are exact:
    snapped coordinates are grid multiples."""
    q = _snap(np.asarray(ring, dtype=np.float64)[:-1], grid)
    pts = []
    for p in q:
        if not pts or p[0] != pts[-1][0] or p[1] != pts[-1][1]:
            pts.append((float(p[0]), float(p[1])))
    while len(pts) > 1 and pts[0] == pts[-1]:
        pts.pop()
    changed = True
    while changed and len(pts) >= 3:
        changed = False
        keep = []
        n = len(pts)
        for i in range(n):
            a, b, c = pts[i - 1], pts[i], pts[(i + 1) % n]
            cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
            between = (min(a[0], c[0]) <= b[0] <= max(a[0], c[0])
                       and min(a[1], c[1]) <= b[1] <= max(a[1], c[1]))
            if cross == 0.0 and between:
                changed = True
            else:
                keep.append(b)
        pts = keep
    if len(pts) < 3:
        return None
    closed = _close(pts)
    if ring_area(closed) == 0.0:
        return None
    return closed


def clip_pair_robust(subject: np.ndarray, clip: np.ndarray,
                     op: str = "intersection", grid: float = 1.0):
    """Fixed-precision (snap-rounding) boolean for pairs that may
    violate generic position — shared edges, T-vertices, shared
    corners, collinear overlaps.

    Model (the fixed-precision semantics GEOS exposes via
    GEOSGeom_setPrecision, which the reference reaches through
    ogrgeometry.cpp:3924 MakeValid / SetPrecision): input coordinates
    are quantized to `grid`; the result is the REGULARIZED boolean of
    the closed regions, exact on that grid.

    Mechanism: quantize both rings; restore generic position by
    dilating the clip ring about its centroid by a sub-grid relative
    epsilon (touching configurations become properly overlapping —
    matching closed-region semantics: a shared edge merges under
    union, a tangent point contributes no area); run the exact
    Greiner-Hormann trace; snap traced vertices back to the grid and
    canonicalize (canon_ring). Epsilon retries with a different
    magnitude if the perturbed pair still trips the generic-position
    guard; raises DegenerateGeometryError after the retry budget."""
    A = _snap(np.asarray(subject, dtype=np.float64), grid)
    B = _snap(np.asarray(clip, dtype=np.float64), grid)
    Bo = B[:-1] if (B[0] == B[-1]).all() else B
    cen = Bo.mean(axis=0)
    # max vertex displacement is R*eps; keep it well under grid/2 so
    # snapping the traced vertices recovers the exact grid result
    R = float(np.max(np.abs(Bo - cen))) or 1.0
    last_err: Exception | None = None
    for attempt in range(4):
        eps = grid / (64.0 * R) * (3.0 ** (-attempt))
        # dilation alone slides a vertex PARALLEL to an edge through the
        # centroid-to-vertex direction (e.g. a disc vertex sitting on an
        # axis-aligned edge of the subject moves along that edge and
        # stays degenerate); compose a quarter-magnitude rotation so the
        # perturbation is never edge-parallel while the radial overlap
        # margin (R*eps) still dominates the tangential shift (R*eps/4)
        rot = eps / 4.0
        Bd = (B - cen) * (1.0 + eps)
        Bp = cen + np.column_stack(
            [Bd[:, 0] - Bd[:, 1] * rot, Bd[:, 0] * rot + Bd[:, 1]]
        )
        try:
            rings = clip_pair(A, Bp, op=op)
        except DegenerateGeometryError as ex:  # still non-generic: retry
            last_err = ex
            continue
        out = []
        for r in rings:
            c = canon_ring(r, grid)
            if c is not None:
                out.append(c)
        return out
    raise DegenerateGeometryError(
        f"clip_pair_robust: no epsilon in the retry budget restored "
        f"generic position ({last_err})"
    )


def union_pieces(pieces: list, grid: float = 1.0) -> list:
    """Regularized union of a CONNECTED sequence of simple rings (each
    piece overlaps or touches the union of its predecessors) — the
    global self-intersection cleanup GEOS's buffer builder performs on
    raw offset pieces (noded union), re-expressed as a deterministic
    left fold of snap-rounded pairwise unions.

    Returns [(closed_ring, is_hole)]: exactly one outer ring plus any
    holes (pockets sealed by later pieces). A piece overlapping an
    existing hole shrinks it via snap-rounded difference; a piece
    disjoint from the accumulated outer ring raises
    DegenerateGeometryError (connectivity contract)."""
    outer = canon_ring(np.asarray(pieces[0], dtype=np.float64), grid)
    if outer is None:
        raise DegenerateGeometryError("union_pieces: degenerate first piece")
    holes: list = []
    for p in pieces[1:]:
        rings = clip_pair_robust(outer, p, op="union", grid=grid)
        cls = classify_rings(rings)
        outers = [r for r, h in cls if not h]
        if len(outers) != 1:
            raise DegenerateGeometryError(
                "union_pieces: piece disjoint from the accumulated union"
            )
        outer = outers[0]
        new_holes = [r for r, h in cls if h]
        kept: list = []
        for hring in holes:
            try:
                dr = clip_pair_robust(hring, p, op="difference", grid=grid)
            except DegenerateGeometryError:
                dr = [hring]  # touching only: hole unchanged on the grid
            for r, h in classify_rings(dr):
                if not h and ring_area(r) > 0.0:
                    kept.append(r)
        holes = kept + new_holes
    return [(outer, False)] + [(h, True) for h in holes]
