"""Bulk randomized invariants for the r3 vector kernels — one Spark
run over hundreds of deterministic pseudo-random fixtures per test
(the Spark-friendly form of property testing)."""
from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gdal_spark.functions import geometry as G
from gdal_spark.operators import vector_pipeline as VP


def test_wrapdateline_invariants_bulk(spark):
    rng = np.random.RandomState(42)
    rows = []
    for i in range(300):
        n = rng.randint(2, 9)
        x = float(rng.uniform(-180, 180))
        raw = [x]
        for _ in range(n - 1):
            raw.append(raw[-1] + float(rng.uniform(-170, 170)))
        lon = [((v + 180.0) % 360.0) - 180.0 for v in raw]
        lat = [float(rng.uniform(-80, 80)) for _ in range(n)]
        rows.append((i, lon, lat))
    df = spark.createDataFrame(
        rows, "id bigint, xs array<double>, ys array<double>")
    out = VP.wrapdateline(df).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r)
    for i, (lon, lat) in enumerate((r[1], r[2]) for r in rows):
        crossings = sum(
            1 for a, b in zip(lon, lon[1:]) if abs(b - a) > 180.0)
        parts = sorted(by_id[i], key=lambda r: r["part_idx"])
        # one more part than crossings, contiguous part ids
        assert [p["part_idx"] for p in parts] == list(range(crossings + 1))
        all_x = [v for p in parts for v in p["xs"]]
        # every vertex wrapped; original count + 2 per crossing
        assert all(-180.0 <= v <= 180.0 for v in all_x)
        assert len(all_x) == len(lon) + 2 * crossings
        # splits end/start exactly on the antimeridian with equal |lon|
        for p, q in zip(parts, parts[1:]):
            assert abs(p["xs"][-1]) == 180.0
            assert abs(q["xs"][0]) == 180.0
            assert p["xs"][-1] == -q["xs"][0]
            # shared crossing latitude
            assert p["ys"][-1] == q["ys"][0]
        # original vertex sequence preserved in order across parts
        kept = [v for p in parts for v in p["xs"]]
        orig_iter = iter(kept)
        assert all(any(o == k for k in orig_iter) for o in lon)


def test_point_on_surface_interior_bulk(spark):
    # random x-monotone rectilinear "histogram" polygons: always
    # simple; interiority of the returned point is the contract
    rng = np.random.RandomState(7)
    rows = []
    for i in range(300):
        k = rng.randint(2, 8)
        h = rng.randint(1, 11, size=k).astype(float)
        xs = [0.0, float(k)]
        ys = [0.0, 0.0]
        for j in range(k - 1, -1, -1):
            xs += [float(j + 1), float(j)]
            ys += [float(h[j]), float(h[j])]
        rows.append((i, xs[:-1] if (xs[-1] == 0.0 and ys[-1] == 0.0)
                     else xs, ys[:-1] if (xs[-1] == 0.0 and ys[-1] == 0.0)
                     else ys))
    df = spark.createDataFrame(
        rows, "id bigint, xs array<double>, ys array<double>")
    out = G.point_on_surface_cols(df).collect()
    from gdal_spark.kernels.pip import point_in_polygon
    for r in out:
        i = r["id"]
        xs, ys = rows[i][1], rows[i][2]
        ring = np.column_stack([xs + [xs[0]], ys + [ys[0]]])
        assert point_in_polygon(
            np.array([r["pos_x"]]), np.array([r["pos_y"]]), [ring])[0], i
