"""WKB codec: round trips, both byte orders, PIP-with-holes semantics."""
import struct

import numpy as np

from gdal_spark.kernels import wkb
from gdal_spark.kernels.pip import point_in_polygon
from gdal_spark.sources import polygons as P


def test_point_roundtrip_batch():
    rng = np.random.default_rng(1)
    xs = rng.random(1000) * 360 - 180
    ys = rng.random(1000) * 170 - 85
    bufs = wkb.encode_points(xs, ys)
    assert all(len(b) == 21 for b in bufs)
    x2, y2 = wkb.decode_points_batch(bufs)
    assert (x2 == xs).all() and (y2 == ys).all()  # bit-exact

    one = wkb.decode(bufs[0])
    assert one["type"] == wkb.POINT
    assert one["xy"][0, 0] == xs[0] and one["xy"][0, 1] == ys[0]


def test_big_endian_point_decode():
    # XDR flag 0 (ogr_core.h:614-618): same geometry, swapped bytes
    x, y = 12.25, -7.5
    buf = struct.pack(">BIdd", 0, wkb.POINT, x, y)
    xs, ys = wkb.decode_points_batch([buf])
    assert xs[0] == x and ys[0] == y


def test_polygon_holes_roundtrip():
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], float)
    buf = wkb.encode_polygon([outer, hole])
    g = wkb.decode(buf)
    assert g["type"] == wkb.POLYGON
    assert len(g["rings"]) == 2
    assert (g["rings"][0] == outer).all() and (g["rings"][1] == hole).all()
    # plain polygon promotes to 1-part multipolygon
    assert len(wkb.decode_multipolygon(buf)) == 1


def test_multipolygon_roundtrip_and_pip():
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    hole = np.array([[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]], float)
    island = np.array([[4.5, 4.5], [5.5, 4.5], [5.5, 5.5], [4.5, 5.5], [4.5, 4.5]], float)
    buf = wkb.encode_multipolygon([[outer, hole], [island]])
    polys = wkb.decode_multipolygon(buf)
    assert len(polys) == 2 and len(polys[0]) == 2 and len(polys[1]) == 1

    xs = np.array([1.0, 5.0, 4.0, 3.5])   # shell, island, in-hole, in-hole
    ys = np.array([1.0, 5.0, 6.5, 5.0])
    hit = np.zeros(4, dtype=bool)
    for rings in polys:
        hit |= point_in_polygon(xs, ys, rings)
    assert hit.tolist() == [True, True, False, False]


def test_countries64_mp_fixture_shape():
    pdf = P.countries64_mp_pdf()
    assert len(pdf) == 64
    polys = wkb.decode_multipolygon(pdf.iloc[5]["wkb"])
    assert len(polys) == 2          # main part + island
    assert len(polys[0]) == 2       # outer + hole
    outer, hole = polys[0]
    island = polys[1][0]
    # hole strictly inside outer bbox; island strictly inside hole bbox
    assert outer[:, 0].min() < hole[:, 0].min() < island[:, 0].min()
    assert island[:, 0].max() < hole[:, 0].max() < outer[:, 0].max()
    # center of the island is inside (island part), center of hole ring
    # offset is outside the island but inside the hole -> not contained
    import gdal_spark.sources.derive as derive
    prm = derive.polygon_params_np([5])
    cx, cy = float(prm["cx"][0]), float(prm["cy"][0])
    hit = np.zeros(1, dtype=bool)
    for rings in polys:
        hit |= point_in_polygon(np.array([cx]), np.array([cy]), rings)
    assert hit[0]  # center = island interior


def test_z_and_m_variants():
    # ISO +1000 Z point
    b_iso = wkb.encode_point_z(1.5, -2.25, 7.0, iso=True)
    g = wkb.decode(b_iso)
    assert g["type"] == wkb.POINT and g["dims"] == 3
    assert g["xy"][0].tolist() == [1.5, -2.25, 7.0]
    # legacy 0x80000000-flag Z point
    b_old = wkb.encode_point_z(3.0, 4.0, 5.0, iso=False)
    g2 = wkb.decode(b_old)
    assert g2["type"] == wkb.POINT and g2["dims"] == 3
    assert g2["xy"][0].tolist() == [3.0, 4.0, 5.0]
    # ZM polygon ring decodes with 4 coords, XY recovered for planar ops
    ring = np.array([[0, 0, 1, 9], [4, 0, 1, 9], [4, 4, 1, 9], [0, 0, 1, 9]], float)
    buf = (struct.pack("<BII", 1, wkb.POLYGON + 3000, 1)
           + struct.pack("<I", 4) + ring.tobytes())
    g3 = wkb.decode(buf)
    assert g3["dims"] == 4 and g3["rings"][0].shape == (4, 4)
    polys = wkb.decode_multipolygon(buf)
    assert polys[0][0].shape == (4, 2)
    assert (polys[0][0] == ring[:, :2]).all()
