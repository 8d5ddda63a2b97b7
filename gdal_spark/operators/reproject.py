"""Coordinate reprojection — the ogr2ogr/warp transform stage.

The reference transforms coordinates in batch through PROJ
(OGRCoordinateTransformation::Transform over arrays, ogrct.cpp:2254).
Here:

- EPSG:4326 <-> EPSG:3857 (the tiling CRS pair) is implemented as
  exact closed-form column math (gdal2tiles.py:422-443 formulas) —
  whole-stage codegen, no UDF at all.
- Arbitrary CRS pairs go through pyproj (same PROJ underneath as the
  reference) inside an Arrow-batched pandas UDF, gated on the wheel
  being present (it is not in this container — the 4326<->3857 path
  carries all tests).
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import tiles as TF

try:  # optional, mirrors the reference's PROJ dependency
    import pyproj  # noqa: F401

    HAVE_PYPROJ = True
except ImportError:
    HAVE_PYPROJ = False


def to_mercator(df: DataFrame, lon: str = "lon", lat: str = "lat") -> DataFrame:
    """EPSG:4326 -> EPSG:3857 columns (mx, my)."""
    return df.withColumn("mx", TF.merc_mx(F.col(lon))).withColumn(
        "my", TF.merc_my(F.col(lat))
    )


def from_mercator(df: DataFrame, mx: str = "mx", my: str = "my") -> DataFrame:
    """EPSG:3857 -> EPSG:4326 columns (lon2, lat2)
    (gdal2tiles.py:432-443 MetersToLatLon)."""
    os_ = TF.ORIGIN_SHIFT
    return df.withColumn("lon2", F.col(mx) / F.lit(os_) * F.lit(180.0)).withColumn(
        "lat2",
        F.lit(180.0 / np.pi)
        * (F.lit(2.0) * F.atan(F.exp(F.col(my) / F.lit(os_) * F.lit(np.pi)))
           - F.lit(np.pi / 2.0)),
    )


def roundtrip_error(df: DataFrame, lon: str = "lon", lat: str = "lat") -> DataFrame:
    """4326 -> 3857 -> 4326 with per-row |error| in degrees — the warp
    round-trip check pattern (test_gdalwarp_lib.py:31-113)."""
    out = from_mercator(to_mercator(df, lon, lat))
    return out.withColumn(
        "err",
        F.greatest(
            F.abs(F.col("lon2") - F.col(lon)), F.abs(F.col("lat2") - F.col(lat))
        ),
    )


def reproject_udf(df: DataFrame, src_epsg: int, dst_epsg: int,
                  lon: str = "lon", lat: str = "lat") -> DataFrame:
    """General CRS pair via pyproj in a pandas UDF (batch transform,
    the 1:1 mapping of the reference's array Transform API)."""
    if not HAVE_PYPROJ:
        raise NotImplementedError(
            "pyproj not available in this environment; only the closed-form "
            "4326<->3857 path is active (to_mercator/from_mercator)"
        )
    import pandas as pd
    from pyspark.sql import types as T

    @F.pandas_udf(T.StructType([
        T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())
    ]))
    def _tx(xs: pd.Series, ys: pd.Series) -> pd.DataFrame:
        tr = pyproj.Transformer.from_crs(src_epsg, dst_epsg, always_xy=True)
        ox, oy = tr.transform(xs.to_numpy(), ys.to_numpy())
        return pd.DataFrame({"x": ox, "y": oy})

    res = df.withColumn("_xy", _tx(F.col(lon), F.col(lat)))
    return res.withColumn("x_dst", F.col("_xy.x")).withColumn(
        "y_dst", F.col("_xy.y")
    ).drop("_xy")
