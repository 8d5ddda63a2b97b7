"""Property-based tests (hypothesis) for the pure kernels."""
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.kernels import tmerc, wkb
from gdal_spark.kernels.clip_poly import clip_pair, ring_area, rings_area

finite = st.floats(allow_nan=False, allow_infinity=False,
                   min_value=-1e15, max_value=1e15)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(finite, finite), min_size=1, max_size=50))
def test_wkb_point_roundtrip_any_floats(pts):
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    bufs = wkb.encode_points(xs, ys)
    x2, y2 = wkb.decode_points_batch(bufs)
    assert (x2 == xs).all() and (y2 == ys).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.floats(min_value=-5, max_value=5),
                          st.floats(min_value=-5, max_value=5)),
                min_size=3, max_size=12))
def test_wkb_polygon_roundtrip(ring):
    arr = np.array(ring + [ring[0]], dtype=np.float64)
    buf = wkb.encode_polygon([arr])
    g = wkb.decode(buf)
    assert g["type"] == wkb.POLYGON
    assert (g["rings"][0] == arr).all()


@settings(max_examples=150, deadline=None)
@given(st.floats(min_value=0.01, max_value=5.99),
       st.floats(min_value=-79.9, max_value=83.9))
def test_tmerc_roundtrip_property(lon, lat):
    e, n = tmerc.utm_forward(np.array([lon]), np.array([lat]), 31)
    lon2, lat2 = tmerc.utm_inverse(e, n, 31)
    assert abs(lon2[0] - lon) < 1e-9
    assert abs(lat2[0] - lat) < 1e-9


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_clip_pair_identities(seed):
    """Inclusion-exclusion across the three boolean ops on random
    convex-hull pairs (generic position by randomness)."""
    rng = np.random.default_rng(seed)

    def hull():
        p = rng.random((10, 2)) * 10
        p2 = sorted(map(tuple, p))

        def half(pp):
            h = []
            for q in pp:
                while len(h) >= 2 and (h[-1][0] - h[-2][0]) * (q[1] - h[-2][1]) \
                        - (h[-1][1] - h[-2][1]) * (q[0] - h[-2][0]) <= 0:
                    h.pop()
                h.append(q)
            return h
        return np.array(half(p2)[:-1] + half(p2[::-1])[:-1], float)

    A, B = hull(), hull()
    if len(A) < 3 or len(B) < 3:
        return
    aa = ring_area(np.vstack([A, A[:1]]))
    ab = ring_area(np.vstack([B, B[:1]]))
    ai = rings_area(clip_pair(A, B, "intersection"))
    au = rings_area(clip_pair(A, B, "union"))
    ad = rings_area(clip_pair(A, B, "difference"))
    assert abs(au - (aa + ab - ai)) < 1e-8 * max(1.0, aa + ab)
    assert abs(ad - (aa - ai)) < 1e-8 * max(1.0, aa)
    assert -1e-12 <= ai <= min(aa, ab) + 1e-8


# ------------------------------------------------- r5 kernels

@settings(max_examples=150, deadline=None)
@given(st.floats(min_value=-79.95, max_value=-70.05),
       st.floats(min_value=38.05, max_value=45.95))
def test_gridshift_roundtrip_property(lon, lat):
    from gdal_spark.kernels import gridshift as GS
    g = GS.gridshift_fixture()
    flon, flat = GS.gridshift_forward(g, np.array([lon]), np.array([lat]))
    assert not np.isnan(flon[0])
    ilon, ilat = GS.gridshift_inverse(g, flon, flat)
    assert abs(ilon[0] - lon) < 1e-10 and abs(ilat[0] - lat) < 1e-10


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=1, max_value=40),
       st.integers(min_value=1, max_value=40),
       st.integers(min_value=0, max_value=2**31),
       st.integers(min_value=1, max_value=100))
def test_jpeg_any_dims_parse_and_bound(w, h, seed, quality):
    from gdal_spark.kernels import jpeg as J
    rng = np.random.RandomState(seed % 2**31)
    img = rng.randint(0, 256, (h, w), dtype=np.int64).astype(np.uint8)
    back = J.decode(J.encode(img, quality=quality))
    assert back.shape == img.shape
    # decoded pixels are clamped uint8; error bounded by the largest
    # possible quantized-DCT excursion, not unbounded garbage
    assert back.dtype == np.uint8


@settings(max_examples=100, deadline=None)
@given(st.floats(min_value=2.215, max_value=2.385),
       st.floats(min_value=48.785, max_value=48.915),
       st.floats(min_value=-50.0, max_value=300.0))
def test_rpc_dem_roundtrip_property(lon, lat, user_h):
    from gdal_spark.operators import rpc_warp as R
    rpc = R.rpc_fixture()
    dem = R.dem_fixture()
    fp, fl = R.rpc_forward_dem(rpc, dem, np.array([lon]), np.array([lat]),
                               user_height=user_h)
    assert not np.isnan(fp[0])
    lo, la = R.rpc_inverse_dem(rpc, dem, fp, fl, user_height=user_h)
    bx, by = R.rpc_forward_dem(rpc, dem, lo, la, user_height=user_h)
    assert max(abs(bx[0] - fp[0]), abs(by[0] - fl[0])) \
        < R.DEFAULT_PIX_ERR_THRESHOLD


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_clip_pair_robust_nonconvex_identities(seed):
    """Inclusion-exclusion across the robust (snap-rounded) booleans
    on random SIMPLE star polygons — multi-component intersections and
    union holes included. Areas via classify_rings (outers minus
    holes), identity tolerance = grid-quantization slack."""
    from gdal_spark.kernels.clip_poly import (_seg_intersect, _snap,
                                              classify_rings,
                                              clip_pair_robust)

    rng = np.random.default_rng(seed)

    def star(cx, cy):
        n = int(rng.integers(6, 12))
        th = np.sort(rng.random(n) * 2 * np.pi)
        if np.max(np.diff(np.append(th, th[0] + 2 * np.pi))) > 2.8:
            return None
        r = 1.0 + rng.random(n) * 4.0
        return np.column_stack([cx + r * np.cos(th), cy + r * np.sin(th)])

    def simple(P):
        n = len(P)
        for i in range(n):
            for j in range(i + 1, n):
                if (j + 1) % n == i or (i + 1) % n == j:
                    continue
                if _seg_intersect(tuple(P[i]), tuple(P[(i + 1) % n]),
                                  tuple(P[j]),
                                  tuple(P[(j + 1) % n])) is not None:
                    return False
        return True

    A = star(5.0, 5.0)
    B = star(5.0 + rng.random() * 3 - 1.5, 5.0 + rng.random() * 3 - 1.5)
    if A is None or B is None or not simple(A) or not simple(B):
        return

    def area(rings):
        return sum((-1.0 if h else 1.0) * ring_area(r)
                   for r, h in classify_rings(rings))

    g = 1e-6
    Aq, Bq = _snap(A, g), _snap(B, g)
    aa = ring_area(np.vstack([Aq, Aq[:1]]))
    ab = ring_area(np.vstack([Bq, Bq[:1]]))
    ai = area(clip_pair_robust(A, B, "intersection", grid=g))
    au = area(clip_pair_robust(A, B, "union", grid=g))
    ad = area(clip_pair_robust(A, B, "difference", grid=g))
    tol = 5e-5 * max(1.0, aa + ab)
    assert abs(au - (aa + ab - ai)) < tol
    assert abs(ad - (aa - ai)) < tol
    assert -tol <= ai <= min(aa, ab) + tol


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1),
       st.integers(min_value=260, max_value=900),
       st.integers(min_value=260, max_value=800),
       st.booleans())
def test_yband_pip_matches_dense_any_ring(seed, m, n, envelope):
    """Banded ray-cast == dense ray-cast bit-exactly on random star
    rings with duplicated/horizontal-ish edges and adversarial points
    (on-vertex, mid-edge y-levels, NaN when the envelope is off)."""
    from gdal_spark.kernels.pip import _ray_crossings, point_in_ring

    rng = np.random.default_rng(seed)
    th = np.sort(rng.uniform(0, 2 * np.pi, m))
    r = 1 + 0.5 * np.sin(rng.integers(2, 9) * th)
    ring = np.column_stack([r * np.cos(th), r * np.sin(th)])
    # inject exact-duplicate y runs (degenerate horizontal edges)
    k = m // 10
    ring[1:1 + k, 1] = ring[0, 1]
    ring = np.vstack([ring, ring[:1]])
    xs = rng.uniform(-1.7, 1.7, n)
    ys = rng.uniform(-1.7, 1.7, n)
    xs[: n // 4] = ring[: n // 4, 0]          # on-vertex
    ys[: n // 4] = ring[: n // 4, 1]
    ys[n // 4: n // 2] = rng.choice(ring[:, 1], n // 2 - n // 4)  # edge y-levels
    if not envelope:
        ys[n - 1] = np.nan
        xs[n - 2] = np.inf
    got = point_in_ring(xs, ys, ring, test_envelope=envelope)
    mask = (
        (xs >= ring[:, 0].min()) & (xs <= ring[:, 0].max())
        & (ys >= ring[:, 1].min()) & (ys <= ring[:, 1].max())
    ) if envelope else np.ones(n, dtype=bool)
    exp = np.zeros(n, dtype=bool)
    fin = mask & np.isfinite(xs) & np.isfinite(ys)
    c = _ray_crossings(xs[fin], ys[fin], ring[1:, 0], ring[1:, 1],
                       ring[:-1, 0], ring[:-1, 1])
    exp[fin] = (c % 2).astype(bool)
    np.testing.assert_array_equal(got, exp)
