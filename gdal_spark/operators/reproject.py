"""Coordinate reprojection — the ogr2ogr/warp transform stage.

The reference transforms coordinates in batch through PROJ
(OGRCoordinateTransformation::Transform over arrays, ogrct.cpp:2254).
Here:

- EPSG:4326 <-> EPSG:3857 (the tiling CRS pair) is implemented as
  exact closed-form column math (gdal2tiles.py:422-443 formulas) —
  whole-stage codegen, no UDF at all.
- EPSG:4326 <-> UTM (326xx) is the closed-form 6th-order Krüger
  series (kernels.tmerc — the same algorithm as PROJ's etmerc) inside
  an Arrow-batched pandas UDF: utm_forward_cols / utm_inverse_cols.
  This covers the reference's own ogr2ogr benchmark CRS pair
  (32631 -> 4326) without any external wheel.
- Other arbitrary CRS pairs go through pyproj (same PROJ underneath
  as the reference) inside an Arrow-batched pandas UDF, gated on the
  wheel being present (it is not in this container).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
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


def approx_transform_line(xs: "np.ndarray", fn, *, tol: float,
                          _depth: int = 0) -> "np.ndarray":
    """Error-bounded approximation of an expensive 1-D transform over a
    MONOTONE coordinate line (the GDALApproxTransformer technique,
    alg/gdaltransformer.cpp:58-61, 2571; gdalwarp default tolerance
    0.125 px, apps/gdalwarp_lib.cpp:1576).

    Evaluate the exact `fn` at the span endpoints + midpoint; if the
    midpoint's linear interpolation error <= tol, lerp the whole span,
    else recurse on both halves. Returns fn(xs) to within tol using
    O(k log n) exact evaluations for smooth fn (k = spans needed).

    Used inside warp UDF batches where fn is a real PROJ pipeline; the
    closed-form mercator paths don't need it (already column math), so
    this ships as the kernel + contract test, wired for the pyproj UDF.
    """
    import numpy as np

    xs = np.asarray(xs, dtype=np.float64)
    n = xs.shape[0]
    if n <= 3 or _depth > 40:
        return fn(xs)
    mid = n // 2
    e0, em, e1 = fn(xs[:1])[0], fn(xs[mid:mid + 1])[0], fn(xs[-1:])[0]
    # lerp estimate of the midpoint from the endpoints
    t = (xs[mid] - xs[0]) / (xs[-1] - xs[0]) if xs[-1] != xs[0] else 0.5
    est = e0 + t * (e1 - e0)
    if abs(est - em) <= tol:
        tt = (xs - xs[0]) / (xs[-1] - xs[0]) if xs[-1] != xs[0] else np.zeros(n)
        out = e0 + tt * (e1 - e0)
        out[mid] = em  # exact where we paid for it
        return out
    left = approx_transform_line(xs[: mid + 1], fn, tol=tol, _depth=_depth + 1)
    right = approx_transform_line(xs[mid:], fn, tol=tol, _depth=_depth + 1)
    return np.concatenate([left, right[1:]])


def utm_forward_cols(df: DataFrame, zone: int, lon: str = "lon",
                     lat: str = "lat") -> DataFrame:
    """Geographic -> UTM (EPSG:326xx) as an Arrow-batched pandas UDF
    over the closed-form Krüger series (kernels.tmerc) — the engine's
    native path for the reference's single most common ogr2ogr case
    (32631<->4326, autotest/benchmark/test_ogr2ogr.py:61-66;
    batch Transform API ogrct.cpp:2254). Adds (easting, northing)."""
    from ..kernels import tmerc

    @F.pandas_udf("struct<easting:double, northing:double>")
    def _fwd(lon_s: pd.Series, lat_s: pd.Series) -> pd.DataFrame:
        e, n = tmerc.utm_forward(lon_s.to_numpy(), lat_s.to_numpy(), zone)
        return pd.DataFrame({"easting": e, "northing": n})

    res = df.withColumn("_en", _fwd(F.col(lon), F.col(lat)))
    return res.withColumn("easting", F.col("_en.easting")).withColumn(
        "northing", F.col("_en.northing")
    ).drop("_en")


def utm_inverse_cols(df: DataFrame, zone: int, easting: str = "easting",
                     northing: str = "northing") -> DataFrame:
    """UTM -> geographic (inverse Krüger series + unrolled Newton);
    adds (lon_inv, lat_inv)."""
    from ..kernels import tmerc

    @F.pandas_udf("struct<lon:double, lat:double>")
    def _inv(e_s: pd.Series, n_s: pd.Series) -> pd.DataFrame:
        lo, la = tmerc.utm_inverse(e_s.to_numpy(), n_s.to_numpy(), zone)
        return pd.DataFrame({"lon": lo, "lat": la})

    res = df.withColumn("_ll", _inv(F.col(easting), F.col(northing)))
    return res.withColumn("lon_inv", F.col("_ll.lon")).withColumn(
        "lat_inv", F.col("_ll.lat")
    ).drop("_ll")


def _closed_form(epsg: int):
    """Closed-form kernel for a projected EPSG code, or None.
    Covers the three most common projected families: UTM
    (kernels.tmerc), Lambert Conformal Conic 2SP and Polar
    Stereographic B (kernels.conic)."""
    from ..kernels import conic

    if 32601 <= epsg <= 32660 or 32701 <= epsg <= 32760:
        zone = epsg % 100
        return ("utm", zone)
    if epsg == 2154:
        return ("lcc", conic.LAMBERT93)
    if epsg == 3413:
        return ("ps", conic.NSIDC_NORTH)
    return None


def reproject_udf(df: DataFrame, src_epsg: int, dst_epsg: int,
                  lon: str = "lon", lat: str = "lat") -> DataFrame:
    """General CRS pair as a batch pandas UDF (the 1:1 mapping of the
    reference's array Transform API, ogrct.cpp:2254). Dispatch order:
    1. closed-form kernels for 4326 <-> {326xx/327xx UTM, 2154
       Lambert-93, 3413 polar stereographic north} — no dependency;
    2. pyproj for anything else (gated on the wheel being present).
    Output columns: (x_dst, y_dst)."""
    from ..kernels import conic

    cf = None
    fwd = None
    if src_epsg == 4326:
        cf, fwd = _closed_form(dst_epsg), True
    elif dst_epsg == 4326:
        cf, fwd = _closed_form(src_epsg), False
    if cf is not None:
        kind, prm = cf

        @F.pandas_udf("struct<x:double, y:double>")
        def _cftx(xs: pd.Series, ys: pd.Series) -> pd.DataFrame:
            from ..kernels import conic as C
            from ..kernels import tmerc as TM

            xv, yv = xs.to_numpy(), ys.to_numpy()
            if kind == "utm":
                f = TM.utm_forward if fwd else TM.utm_inverse
                ox, oy = f(xv, yv, prm)
            elif kind == "lcc":
                f = C.lcc_forward if fwd else C.lcc_inverse
                ox, oy = f(xv, yv, prm)
            else:
                f = C.ps_forward if fwd else C.ps_inverse
                ox, oy = f(xv, yv, prm)
            return pd.DataFrame({"x": ox, "y": oy})

        res = df.withColumn("_xy", _cftx(F.col(lon), F.col(lat)))
        return res.withColumn("x_dst", F.col("_xy.x")).withColumn(
            "y_dst", F.col("_xy.y")
        ).drop("_xy")

    if not HAVE_PYPROJ:
        raise NotImplementedError(
            "pyproj not available in this environment; closed-form paths "
            "cover 4326<->{3857, 326xx/327xx, 2154, 3413}"
        )
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
