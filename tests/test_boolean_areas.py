"""Non-convex boolean-area layer algebra: ear clipping + triangle-pair
clip decomposition."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_spark.kernels.triangulate import ear_clip, triangle_area
from gdal_spark.operators.spatial_join import boolean_areas_general

L_SHAPE = ([0.0, 4.0, 4.0, 2.0, 2.0, 0.0], [0.0, 0.0, 2.0, 2.0, 6.0, 6.0])
# L-shape area: 4x2 + 2x4 = 16


def test_ear_clip_l_shape():
    tris = ear_clip(*L_SHAPE)
    assert len(tris) == 4  # n-2 triangles for n=6
    assert sum(triangle_area(t) for t in tris) == pytest.approx(16.0, abs=1e-12)


def test_ear_clip_convex_and_errors():
    sq = ([0.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0])
    tris = ear_clip(*sq)
    assert sum(triangle_area(t) for t in tris) == pytest.approx(1.0)
    with pytest.raises(ValueError):
        ear_clip([0.0, 1.0], [0.0, 1.0])


def _layer(spark, rows):
    recs = [{"poly_id": pid, "xs": xs, "ys": ys} for pid, xs, ys in rows]
    return spark.createDataFrame(
        pd.DataFrame(recs), "poly_id bigint, xs array<double>, ys array<double>"
    )


def test_boolean_areas_l_shape_vs_rect(spark):
    a = _layer(spark, [(1, *L_SHAPE)])
    # rect covering the notch region and part of the L
    b = _layer(spark, [(2, [1.0, 5.0, 5.0, 1.0, 1.0], [1.0, 1.0, 5.0, 5.0, 1.0])])
    out = boolean_areas_general(a, b, res=4).collect()
    assert len(out) == 1
    r = out[0]
    # overlap of rect [1,5]x[1,5] with the L: bottom bar part
    # [1,4]x[1,2] = 3; left bar part [1,2]x[2,5] = 3 -> aI = 6
    assert r["area_i"] == pytest.approx(6.0, abs=1e-9)
    assert r["area_u"] == pytest.approx(16.0 + 16.0 - 6.0, abs=1e-9)
    assert r["area_sd"] == pytest.approx(16.0 + 16.0 - 12.0, abs=1e-9)


def test_boolean_areas_disjoint_and_nested(spark):
    a = _layer(spark, [(1, *L_SHAPE)])
    far = _layer(spark, [(9, [50.0, 51.0, 51.0, 50.0], [50.0, 50.0, 51.0, 51.0])])
    assert boolean_areas_general(a, far, res=4).count() == 0
    inner = _layer(spark, [(3, [0.5, 1.5, 1.5, 0.5], [0.5, 0.5, 1.5, 1.5])])
    out = boolean_areas_general(a, inner, res=4).collect()[0]
    assert out["area_i"] == pytest.approx(1.0, abs=1e-9)   # fully inside
    assert out["area_u"] == pytest.approx(16.0, abs=1e-9)


def test_boolean_areas_nonconvex_vs_nonconvex(spark):
    # two interlocking L shapes
    l2 = ([1.0, 5.0, 5.0, 3.0, 3.0, 1.0], [1.0, 1.0, 3.0, 3.0, 7.0, 7.0])
    a = _layer(spark, [(1, *L_SHAPE)])
    b = _layer(spark, [(2, *l2)])
    out = boolean_areas_general(a, b, res=4).collect()[0]
    # manual: L1 = [0,4]x[0,2] U [0,2]x[2,6]; L2 = [1,5]x[1,3] U [1,3]x[3,7]
    # overlap: ([1,4]x[1,2])=3 + ([1,2]x[2,3])=1 + ([1,2]x[3,6])=3 -> 7
    assert out["area_i"] == pytest.approx(7.0, abs=1e-9)
