"""Proximity and footprint operator tests vs brute-force numpy."""
from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gdal_spark.operators import focal


def test_proximity_small_grid(spark):
    # 8x8, single target pixel at (3, 2)
    rows = [(x, y, 1 if (x, y) == (3, 2) else 0) for y in range(8) for x in range(8)]
    band = spark.createDataFrame(rows, "gx bigint, gy bigint, value bigint")
    out = {(r["gx"], r["gy"]): r["d2"] for r in
           focal.proximity(band, target=1, max_dist=3).collect()}
    assert out[(3, 2)] == 0
    assert out[(4, 2)] == 1
    assert out[(5, 4)] == 8
    assert (0, 6) not in out          # distance 5 > max_dist 3
    # circle cutoff: d2 <= 9 strictly
    assert max(out.values()) <= 9


def test_proximity_multiple_targets_min_wins(spark):
    rows = [(x, 0, 1 if x in (0, 7) else 0) for x in range(8)]
    band = spark.createDataFrame(rows, "gx bigint, gy bigint, value bigint")
    out = {r["gx"]: r["d2"] for r in
           focal.proximity(band, target=1, max_dist=4).collect()}
    assert out[3] == 9   # nearest is x=0
    assert out[5] == 4   # nearest is x=7


def test_footprint_bounding_boxes(spark):
    # two separate 2x2 valid patches
    valid = {(0, 0), (1, 0), (0, 1), (1, 1), (5, 5), (6, 5), (5, 6), (6, 6)}
    rows = [(x, y, 1 if (x, y) in valid else 0) for y in range(8) for x in range(8)]
    px = spark.createDataFrame(rows, "px bigint, py bigint, value bigint")
    out = sorted(
        focal.footprint(px, width=8, valid=1, tile=8).collect(),
        key=lambda r: r["label"],
    )
    assert len(out) == 2
    a, b = out
    assert (a["minx"], a["miny"], a["maxx"], a["maxy"], a["n_pixels"]) == (0, 0, 1, 1, 4)
    assert (b["minx"], b["miny"], b["maxx"], b["maxy"], b["n_pixels"]) == (5, 5, 6, 6, 4)


def test_proximity_values_list_and_fixed_buf(spark):
    from gdal_spark.operators import focal

    rows = [(x, y, (7 if (x, y) == (2, 2) else (9 if (x, y) == (8, 8) else 0)))
            for y in range(12) for x in range(12)]
    band = spark.createDataFrame(rows, "gx bigint, gy bigint, value bigint")
    # VALUES=7,9: nearest of EITHER target
    out = {(r["gx"], r["gy"]): r["d2"] for r in focal.proximity(
        band, targets=[7, 9], max_dist=3).collect()}
    assert out[(2, 2)] == 0 and out[(8, 8)] == 0
    assert out[(4, 2)] == 4      # served by (2,2)
    assert out[(8, 6)] == 4      # served by (8,8)
    assert (6, 2) not in out     # distance 4 > max_dist 3
    # FIXED_BUF_VAL: every in-range pixel reports the constant
    buf = {(r["gx"], r["gy"]): r["d2"] for r in focal.proximity(
        band, targets=[7, 9], max_dist=3, fixed_buf_val=255).collect()}
    assert set(buf.keys()) == set(out.keys())
    assert set(buf.values()) == {255}
