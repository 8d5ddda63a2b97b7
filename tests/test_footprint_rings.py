"""Footprint ring-outline tracer: rectangles, L-shapes, holes,
degree-2 (diagonal-touch) vertices."""
import numpy as np

from gdal_spark.operators import focal


def _mask_df(spark, grid):
    w = grid.shape[1]
    rows = [(x, y, int(grid[y, x]))
            for y in range(grid.shape[0]) for x in range(w)]
    return spark.createDataFrame(rows, "px bigint, py bigint, value bigint"), w


def test_block_donut_and_diagonal(spark):
    W = 12
    g = np.zeros((W, W), dtype=int)
    g[1:4, 1:4] = 1                       # 3x3 block
    g[6:11, 6:11] = 1
    g[7:10, 7:10] = 0                     # donut with 3x3 hole
    g[6, 1] = 1
    g[7, 2] = 1                           # diagonal touch: 2 components
    px, w = _mask_df(spark, g)
    out = focal.footprint_rings(px, width=w, valid=1, tile=6).collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r["label"], []).append(r)

    areas = sorted(
        tuple(sorted(rr["area"] for rr in rings)) for rings in by_label.values()
    )
    # block 9; two diagonal singles 1, 1; donut outer 25 + hole 9
    assert areas == [(1.0,), (1.0,), (9.0,), (9.0, 25.0)]
    donut = next(v for v in by_label.values() if len(v) == 2)
    assert {rr["nv"] for rr in donut} == {4}


def test_l_tromino_single_ring(spark):
    g = np.zeros((4, 4), dtype=int)
    g[0, 0] = g[1, 0] = g[1, 1] = 1
    px, w = _mask_df(spark, g)
    out = focal.footprint_rings(px, width=w, valid=1, tile=4).collect()
    assert len(out) == 1
    r = out[0]
    assert r["nv"] == 6 and r["area"] == 3.0
    # closed ring, first == last
    assert (r["xs"][0], r["ys"][0]) == (r["xs"][-1], r["ys"][-1])
