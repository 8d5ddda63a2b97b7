"""kNN ring-expansion join vs brute-force numpy oracle."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.kernels import mercator
from gdal_spark.operators.knn import knn_join
from gdal_spark.sources import derive


def _mk_points(spark, n, lon_salt, lat_salt, id_name):
    i = F.col("id")
    from gdal_spark.sources.docs import hash01_col

    return spark.range(n).select(
        i.alias(id_name),
        (F.lit(-180.0) + F.lit(360.0) * hash01_col(i, lon_salt)).alias("lon"),
        (F.lit(-85.05) + F.lit(170.1) * hash01_col(i, lat_salt)).alias("lat"),
    )


def _oracle(n_pts, n_q, k):
    ip = np.arange(n_pts)
    iq = np.arange(n_q)
    pmx, pmy = mercator.lat_lon_to_meters(
        -85.05 + 170.1 * derive.hash01_np(ip, 2), -180 + 360 * derive.hash01_np(ip, 1)
    )
    qmx, qmy = mercator.lat_lon_to_meters(
        -85.05 + 170.1 * derive.hash01_np(iq, 4), -180 + 360 * derive.hash01_np(iq, 3)
    )
    out = set()
    for q in iq:
        d2 = (pmx - qmx[q]) ** 2 + (pmy - qmy[q]) ** 2
        order = np.lexsort((ip, d2))
        for r, p in enumerate(order[:k], start=1):
            out.add((int(q), int(p), r))
    return out


@pytest.mark.parametrize("res", [3, 5, 7])
def test_knn_matches_bruteforce(spark, res):
    n_pts, n_q, k = 2000, 40, 5
    pts = _mk_points(spark, n_pts, 1, 2, "point_id")
    qs = _mk_points(spark, n_q, 3, 4, "query_id")
    got = knn_join(pts, qs, k=k, res=res, point_id="point_id", query_id="query_id")
    got_set = {(r["query_id"], r["point_id"], r["rank"]) for r in got.collect()}
    assert got_set == _oracle(n_pts, n_q, k)


def test_knn_k_larger_than_points(spark):
    pts = _mk_points(spark, 3, 1, 2, "point_id")
    qs = _mk_points(spark, 2, 3, 4, "query_id")
    got = knn_join(pts, qs, k=10, res=4, point_id="point_id", query_id="query_id")
    rows = got.collect()
    # every query returns all 3 points, ranked
    assert len(rows) == 6
    assert {r["rank"] for r in rows} == {1, 2, 3}
