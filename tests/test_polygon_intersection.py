"""Polygon-layer Intersection tests: exact rectangles + grid-sampled
area cross-check for the convex countries64 polygons."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_spark.kernels import cells
from gdal_spark.kernels.pip import point_in_ring
from gdal_spark.operators.spatial_join import polygon_intersection
from gdal_spark.sources import polygons

RES = 4


def _layer(spark, rows):
    """rows: (id, ring ndarray). Build (poly_id, xs, ys, env, cell)."""
    recs = []
    for pid, ring in rows:
        for c in cells.polygon_cover(ring, RES):
            recs.append({
                "poly_id": pid, "cell": int(c),
                "xs": ring[:, 0].tolist(), "ys": ring[:, 1].tolist(),
                "minx": float(ring[:, 0].min()), "miny": float(ring[:, 1].min()),
                "maxx": float(ring[:, 0].max()), "maxy": float(ring[:, 1].max()),
            })
    return spark.createDataFrame(
        pd.DataFrame(recs),
        "poly_id bigint, cell bigint, xs array<double>, ys array<double>, "
        "minx double, miny double, maxx double, maxy double",
    )


def _rect(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float)


def test_rect_rect_intersection_exact(spark):
    a = _layer(spark, [(1, _rect(0, 0, 10, 10))])
    b = _layer(spark, [(2, _rect(5, 5, 20, 15))])
    out = polygon_intersection(a, b, res=RES).collect()
    assert len(out) == 1
    assert out[0]["area"] == pytest.approx(25.0, abs=1e-9)


def test_disjoint_rects_empty(spark):
    a = _layer(spark, [(1, _rect(0, 0, 5, 5))])
    b = _layer(spark, [(2, _rect(50, 50, 60, 60))])
    assert polygon_intersection(a, b, res=RES).count() == 0


def test_countries_vs_rect_grid_sampled_area(spark):
    # intersect 4 countries64 polygons with a big rectangle; verify each
    # intersection area against a dense PIP grid sample (independent of
    # the clip implementation)
    polys = [(p, np.column_stack([
        np.asarray(polygons.countries64_pdf().iloc[p]["xs"]),
        np.asarray(polygons.countries64_pdf().iloc[p]["ys"]),
    ])) for p in (9, 10, 17, 18)]
    a = _layer(spark, polys)
    rect = _rect(-150.0, -70.0, -100.0, -30.0)
    b = _layer(spark, [(99, rect)])
    out = {r["id_a"]: r for r in polygon_intersection(a, b, res=RES).collect()}

    for pid, ring in polys:
        # grid-sample the true intersection area
        gx, gy = np.meshgrid(np.linspace(-150, -100, 400), np.linspace(-70, -30, 400))
        inside = point_in_ring(gx.ravel(), gy.ravel(), ring)
        cell_area = (50.0 / 400) * (40.0 / 400)
        approx = inside.sum() * cell_area
        got = out[pid]["area"] if pid in out else 0.0
        assert got == pytest.approx(approx, rel=0.02, abs=0.5), pid
        if pid in out:
            # intersection ring must lie inside both envelopes
            xs = np.array(out[pid]["xs"])
            assert xs.min() >= -150.0 - 1e-9 and xs.max() <= -100.0 + 1e-9


def test_intersection_commutes_on_area(spark):
    a = _layer(spark, [(1, _rect(0, 0, 10, 7))])
    b = _layer(spark, [(2, _rect(3, 2, 8, 20))])
    ab = polygon_intersection(a, b, res=RES).collect()[0]["area"]
    ba = polygon_intersection(b, a, res=RES).collect()[0]["area"]
    assert ab == pytest.approx(ba, abs=1e-9)
    assert ab == pytest.approx(5 * 5, abs=1e-9)
