"""Base-tile pipeline invariants (the oracle cross-check is the value
gate; these pin the fixture's shape and the geo_query port)."""
import numpy as np

from gdal_spark.operators import base_tiles as BT


def test_geo_query_interior_tile():
    # a query fully inside the raster: no shifts, full windows
    ulx, uly, xres = BT.src_geotransform()
    q_ulx = ulx + 4 * xres
    q_lrx = ulx + 20 * xres
    q_uly = uly - 4 * xres
    q_lry = uly - 20 * xres
    (rx, ry, rxs, rys), (wx, wy, wxs, wys) = BT.geo_query(
        ulx, uly, xres, -xres, BT.SRC_W, BT.SRC_H,
        q_ulx, q_uly, q_lrx, q_lry, querysize=16,
    )
    assert (rx, ry) == (4, 4)
    assert (rxs, rys) == (16, 16)
    assert (wx, wy, wxs, wys) == (0, 0, 16, 16)


def test_geo_query_border_shift():
    # query starting left of the raster: wx shifts, sizes shrink
    ulx, uly, xres = BT.src_geotransform()
    q_ulx = ulx - 8 * xres
    q_lrx = ulx + 8 * xres
    (rx, ry, rxs, rys), (wx, wy, wxs, wys) = BT.geo_query(
        ulx, uly, xres, -xres, BT.SRC_W, BT.SRC_H,
        q_ulx, uly - 4 * xres, q_lrx, uly - 12 * xres, querysize=16,
    )
    assert rx == 0
    # int((-8*xres)/xres + 0.001) truncates toward zero -> -7 (the
    # reference's int() rule), so the shift is 7, not 8
    assert wx == 7
    assert wxs == 9
    assert rxs == 9


def test_tile_details_fixture_shape():
    details = BT.tile_details(tz=2, tile_size=16)
    # the 37x29 source at offset (11.3, 5.7)/128 spans a 2x2 tile block
    assert len(details) == 4
    keys = {(d["tx"], d["ty"]) for d in details}
    assert keys == {(0, 2), (0, 3), (1, 2), (1, 3)}
    for d in details:
        assert 0 <= d["rx"] and d["rx"] + d["rxsize"] <= BT.SRC_W
        assert 0 <= d["ry"] and d["ry"] + d["rysize"] <= BT.SRC_H
        assert 0 <= d["wx"] and d["wx"] + d["wxsize"] <= 16
        assert 0 <= d["wy"] and d["wy"] + d["wysize"] <= 16


def test_base_tiles_pixels(spark):
    base = BT.base_tiles(spark, tz=2, tile_size=16).collect()
    assert len(base) > 0
    # every emitted pixel belongs to one of the 4 fixture tiles
    tiles = {(r["tx"], r["ty"]) for r in base}
    assert tiles <= {(0, 2), (0, 3), (1, 2), (1, 3)}
    # values are valid LCG band values
    assert all(0 <= r["value"] < 2**31 for r in base)
    ov = BT.overview_tiles(
        spark.createDataFrame(base), tz=2, tile_size=16
    ).collect()
    assert {(r["tz"], r["tx"], r["ty"]) for r in ov} <= {(1, 0, 1)}


def test_antialias_u8_matches_dense_numpy_reference(spark):
    # independent check of the join-based fixed-point shrink: build the
    # dense qs x qs query image per tile (absent -> 0, the zero-init MEM
    # buffer), apply the Resample.c 8bpc passes directly in numpy
    # (horizontal then vertical, clip8 after each), compare every pixel.
    ts, qs = 16, 64
    src = BT.src_pixels(spark, salt=BT.SALT_SRC, byte_range=True)
    qpx = BT.base_tiles(spark, tz=2, tile_size=ts, resampling="query",
                        query_factor=4, src=src)
    got = BT.antialias_shrink_u8(qpx, tile_size=ts, qs=qs).toPandas()
    raw = qpx.toPandas()

    taps = BT.pil_u8_taps(qs, ts)
    bias = 1 << (BT.PIL_PRECISION_BITS - 1)
    hi = 1 << (BT.PIL_PRECISION_BITS + 8)

    def clip8(s):
        out = s >> BT.PIL_PRECISION_BITS
        out[s <= 0] = 0
        out[s >= hi] = 255
        return out

    for (tz, tx, ty), g in raw.groupby(["tz", "tx", "ty"]):
        img = np.zeros((qs, qs), dtype=np.int64)
        img[g["py"].to_numpy(), g["px"].to_numpy()] = g["value"].to_numpy()
        h = np.zeros((qs, ts), dtype=np.int64)
        for d, xmin, kk in taps:
            h[:, d] = clip8(bias + img[:, xmin:xmin + len(kk)]
                            @ np.asarray(kk, dtype=np.int64))
        v = np.zeros((ts, ts), dtype=np.int64)
        for d, xmin, kk in taps:
            v[d, :] = clip8(bias + np.asarray(kk, dtype=np.int64)
                            @ h[xmin:xmin + len(kk), :])
        sub = got[(got["tz"] == tz) & (got["tx"] == tx) & (got["ty"] == ty)]
        expect = {int(r.pos): int(r.value) for r in sub.itertuples()}
        dense = {dy * ts + dx: int(v[dy, dx])
                 for dy in range(ts) for dx in range(ts)}
        # the engine emits only positions with at least one source tap
        # row; positions it omits must be 0 in the dense reference
        for pos, val in dense.items():
            assert expect.get(pos, 0) == val, (tz, tx, ty, pos)
