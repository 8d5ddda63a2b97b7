"""gdal2tiles base-tile generation + overview pyramid, end to end.

The reference's tiling job (swig/python/gdal-utils/osgeo_utils/
gdal2tiles.py) computes, per base tile at max zoom:
  1. the tile's mercator bounds (TileBounds),
  2. geo_query (gdal2tiles.py:2962-3004): the source-raster read
     window (rx, ry, rxsize, rysize) and the tile-buffer write window
     (wx, wy, wxsize, wysize), with the exact 0.001/0.5 int()
     truncations and border-shift arithmetic,
  3. ReadRaster(rx.., wxsize..) with nearest-neighbour scaling
     (gcore/rasterio.cpp:774-890: src = int(clamp(0.5*inc + off + 1e-10
     + i*inc, 0, size-1))), written into the tile at (wx, wy)
     (create_base_tile, gdal2tiles.py:1283-1438),
then builds overview tiles by merging each tile's 4 children.

Spark-native shape: the per-tile window params are tiny driver-side
metadata (the reference ALSO precomputes them single-threaded —
get_tile_details); the heavy work — mapping every destination pixel to
its source pixel and carrying the payload — is a broadcast of the
param table against the source pixel table, i.e. one equi-join on
(sx, sy), then a groupBy per tile. Pixels the source does not cover
stay absent (transparent; they contribute 0 to checksums, matching
the reference's alpha=0 regions).

Every arithmetic step is integer or pinned-order IEEE double, so the
DuckDB oracle (sql twin below) reproduces checksums bit-for-bit —
the autotest checksum-grid pattern (autotest/pyscripts/
test_gdal2tiles.py:121-124).
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels import mercator
from ..sources import derive

CHECKSUM_P = 1000000007
SALT_SRC = 307

# fixture source raster: NOT aligned to the tile grid (border windows
# exercised), resolution an exact power-of-two fraction of the world
# (the nearest-neighbour increment stays IEEE-exact)
SRC_W, SRC_H = 37, 29
WORLD_PX = 128  # source resolution = world / 128
SRC_OFF_X = 11.3  # source ul corner, in source pixels from world UL
SRC_OFF_Y = 5.7


def src_geotransform():
    os_ = mercator.ORIGIN_SHIFT
    xres = 2.0 * os_ / WORLD_PX
    ulx = -os_ + SRC_OFF_X * xres
    uly = os_ - SRC_OFF_Y * xres
    return ulx, uly, xres


def geo_query(ulx_src, uly_src, xres, yres, w, h,
              ulx, uly, lrx, lry, querysize):
    """Straight port of gdal2tiles.py:2962-3004 (int() = C truncation
    toward zero; all float ops in the reference's order)."""
    rx = int((ulx - ulx_src) / xres + 0.001)
    ry = int((uly - uly_src) / yres + 0.001)
    rxsize = max(1, int((lrx - ulx) / xres + 0.5))
    rysize = max(1, int((lry - uly) / yres + 0.5))
    wxsize, wysize = querysize, querysize
    wx = 0
    if rx < 0:
        rxshift = abs(rx)
        wx = int(wxsize * (float(rxshift) / rxsize))
        wxsize = wxsize - wx
        rxsize = rxsize - int(rxsize * (float(rxshift) / rxsize))
        rx = 0
    if rx + rxsize > w:
        wxsize = int(wxsize * (float(w - rx) / rxsize))
        rxsize = w - rx
    wy = 0
    if ry < 0:
        ryshift = abs(ry)
        wy = int(wysize * (float(ryshift) / rysize))
        wysize = wysize - wy
        rysize = rysize - int(rysize * (float(ryshift) / rysize))
        ry = 0
    if ry + rysize > h:
        wysize = int(wysize * (float(h - ry) / rysize))
        rysize = h - ry
    return (rx, ry, rxsize, rysize), (wx, wy, wxsize, wysize)


def tile_details(tz: int, tile_size: int, querysize: int | None = None):
    """Per-base-tile read/write windows for the fixture source — the
    get_tile_details analog. querysize defaults to tile_size (the
    'near' path); the average path passes 4*tile_size
    (gdal2tiles.py:2210). Returns list of dicts."""
    ulx, uly, xres = src_geotransform()
    lrx = ulx + SRC_W * xres
    lry = uly - SRC_H * xres
    tminx, tminy, tmaxx, tmaxy = mercator.tile_range_for_extent(
        ulx, lry, lrx, uly, tz, tile_size
    )
    out = []
    for ty in range(tminy, tmaxy + 1):
        for tx in range(tminx, tmaxx + 1):
            b = mercator.tile_bounds(tx, ty, tz, tile_size)
            (rx, ry, rxs, rys), (wx, wy, wxs, wys) = geo_query(
                ulx, uly, xres, -xres, SRC_W, SRC_H,
                float(b[0]), float(b[3]), float(b[2]), float(b[1]),
                querysize=querysize or tile_size,
            )
            if rxs <= 0 or rys <= 0 or wxs <= 0 or wys <= 0:
                continue
            out.append(dict(tz=tz, tx=tx, ty=ty, rx=rx, ry=ry,
                            rxsize=rxs, rysize=rys,
                            wx=wx, wy=wy, wxsize=wxs, wysize=wys))
    return out


def geodetic_src_geotransform():
    """EPSG:4326 source fixture: same 37x29 off-grid raster, in
    degrees (world = 360 wide, source res = world/256 — an exact
    power-of-two fraction so the nearest increments stay IEEE-exact)."""
    xres = 360.0 / 256.0
    ulx = -180.0 + SRC_OFF_X * xres
    uly = 90.0 - SRC_OFF_Y * xres
    return ulx, uly, xres


def geodetic_tile_details(tz: int, tile_size: int,
                          querysize: int | None = None):
    """Per-tile windows in the GlobalGeodetic (tmscompatible 2:1)
    profile (gdal2tiles.py:534-629): res = (180/ts)/2^z, TileBounds
    (tx*ts*res - 180, ty*ts*res - 90, ...), ceil-1 LonLatToTile for
    the tminmax. geo_query itself is profile-agnostic."""
    ulx, uly, xres = geodetic_src_geotransform()
    lrx = ulx + SRC_W * xres
    lry = uly - SRC_H * xres
    res = (180.0 / tile_size) / float(2**tz)
    nx, ny = 2 * 2**tz, 2**tz

    def tile_of(lon, lat):
        px = (180.0 + lon) / res
        py = (90.0 + lat) / res
        tx = int(np.ceil(px / float(tile_size)) - 1)
        ty = int(np.ceil(py / float(tile_size)) - 1)
        return tx, ty

    tminx, tminy = tile_of(ulx, lry)
    tmaxx, tmaxy = tile_of(lrx, uly)
    tminx, tmaxx = max(tminx, 0), min(tmaxx, nx - 1)
    tminy, tmaxy = max(tminy, 0), min(tmaxy, ny - 1)
    out = []
    for ty in range(tminy, tmaxy + 1):
        for tx in range(tminx, tmaxx + 1):
            b = (tx * tile_size * res - 180.0, ty * tile_size * res - 90.0,
                 (tx + 1) * tile_size * res - 180.0,
                 (ty + 1) * tile_size * res - 90.0)
            (rx, ry, rxs, rys), (wx, wy, wxs, wys) = geo_query(
                ulx, uly, xres, -xres, SRC_W, SRC_H,
                b[0], b[3], b[2], b[1], querysize=querysize or tile_size,
            )
            if rxs <= 0 or rys <= 0 or wxs <= 0 or wys <= 0:
                continue
            out.append(dict(tz=tz, tx=tx, ty=ty, rx=rx, ry=ry,
                            rxsize=rxs, rysize=rys,
                            wx=wx, wy=wy, wxsize=wxs, wysize=wys))
    return out


def src_pixels(spark: SparkSession, salt: int = SALT_SRC,
               byte_range: bool = False) -> DataFrame:
    """Deterministic source band (sx, sy, value) — LCG of the source
    pixel id, twin of the SQL band CTE. `salt` selects the band (the
    RGBA fixture uses salt + 101*b per band); byte_range reduces
    values mod 256 (the uint8 image fixture)."""
    M31, A = derive.M31, derive.A
    pid = F.col("id")
    h1 = (pid % M31) * A + F.lit(salt)
    val = ((h1 % M31) * A + F.lit(salt * 7 + 13)) % M31
    if byte_range:
        val = val % 256
    return spark.range(SRC_W * SRC_H).select(
        (F.col("id") % SRC_W).alias("sx"),
        (F.col("id") / SRC_W).cast("bigint").alias("sy"),
        val.alias("value"),
    )


def src_alpha(spark: SparkSession) -> DataFrame:
    """Constant-255 alpha band over the source footprint (the
    reference's fully-opaque source; transparency appears only where
    tiles extend past the source, as absent rows)."""
    return spark.range(SRC_W * SRC_H).select(
        (F.col("id") % SRC_W).alias("sx"),
        (F.col("id") / SRC_W).cast("bigint").alias("sy"),
        F.lit(255).cast("bigint").alias("value"),
    )


def base_tiles(spark: SparkSession, *, tz: int = 2, tile_size: int = 16,
               resampling: str = "near", profile: str = "mercator",
               src: DataFrame | None = None, query_factor: int = 1) -> DataFrame:
    """Base tiles at `tz` as (tz, tx, ty, pos, value) pixel rows:
    dest-pixel -> source-pixel nearest map (exact closed form), then
    ONE equi-join against the source pixel table.

    resampling='near': query grid == tile grid (gdal2tiles near path).
    resampling='average': the DEFAULT gdal2tiles path — nearest
    ReadRaster into a 4x-supersampled query grid (querysize = 4 *
    tile_size, gdal2tiles.py:2210), then scale_query_to_tile's
    average shrink; value = sum(16 subpixels)/16.0 with unwritten
    subpixels contributing 0 (the MEM buffer's zero init). The /16 is
    a power-of-two division, so values stay engine-exact."""
    if resampling == "near":
        qs_factor = 1
    elif resampling == "query":
        # return the RAW query-grid pixel rows (px, py kept) for a
        # caller-side shrink (the antialias path)
        qs_factor = query_factor
    elif resampling == "bilinear":
        # gdal2tiles bilinear: querysize = 2 * tile_size
        # (gdal2tiles.py:2225); the exact factor-2 bilinear shrink has
        # all sample weights 0.25 — the 2x2 block mean
        qs_factor = 2
    elif resampling == "average":
        qs_factor = 4
    else:
        raise ValueError(f"unsupported resampling: {resampling}")
    qs = tile_size * qs_factor
    if profile == "mercator":
        params = tile_details(tz, tile_size, querysize=qs)
    elif profile == "geodetic":
        params = geodetic_tile_details(tz, tile_size, querysize=qs)
    else:
        raise ValueError(f"unknown profile: {profile}")
    pdf = spark.createDataFrame(
        [(d["tz"], d["tx"], d["ty"], d["rx"], d["ry"], d["rxsize"], d["rysize"],
          d["wx"], d["wy"], d["wxsize"], d["wysize"]) for d in params],
        "tz int, tx bigint, ty bigint, rx bigint, ry bigint, rxsize bigint, "
        "rysize bigint, wx bigint, wy bigint, wxsize bigint, wysize bigint",
    )
    dest = (
        pdf.crossJoin(F.broadcast(
            spark.range(qs * qs).select(F.col("id").alias("pos"))
        ))
        .withColumn("px", F.col("pos") % qs)
        .withColumn("py", (F.col("pos") / qs).cast("bigint"))
        .filter(
            (F.col("px") >= F.col("wx")) & (F.col("px") < F.col("wx") + F.col("wxsize"))
            & (F.col("py") >= F.col("wy")) & (F.col("py") < F.col("wy") + F.col("wysize"))
        )
    )
    # nearest rule, rasterio.cpp:774/878: start = 0.5*inc + off + EPS,
    # then += inc per buffer pixel; clamp, truncate. The op ORDER below
    # — ((0.5*inc + off) + EPS) + i*inc — matches the SQL twin exactly.
    incx = F.col("rxsize").cast("double") / F.col("wxsize").cast("double")
    incy = F.col("rysize").cast("double") / F.col("wysize").cast("double")
    sxf = ((F.lit(0.5) * incx + F.col("rx")) + F.lit(1e-10)) \
        + (F.col("px") - F.col("wx")).cast("double") * incx
    syf = ((F.lit(0.5) * incy + F.col("ry")) + F.lit(1e-10)) \
        + (F.col("py") - F.col("wy")).cast("double") * incy
    dest = dest.withColumn(
        "sx", F.floor(F.least(F.greatest(sxf, F.lit(0.0)), F.lit(float(SRC_W - 1)))).cast("bigint")
    ).withColumn(
        "sy", F.floor(F.least(F.greatest(syf, F.lit(0.0)), F.lit(float(SRC_H - 1)))).cast("bigint")
    )
    src = src_pixels(spark) if src is None else src
    qpx = dest.join(src, ["sx", "sy"]).select("tz", "tx", "ty", "pos", "px", "py", "value")
    if resampling == "query":
        return qpx
    if resampling == "near":
        return qpx.select("tz", "tx", "ty", "pos", "value")
    # average/bilinear: f x f query subpixels -> one dest pixel,
    # sum/f^2 (missing subpixels were zero-initialized in the
    # reference's MEM buffer)
    f = qs_factor
    return (
        qpx.select(
            "tz", "tx", "ty", "value",
            (((F.col("py") / f).cast("bigint")) * tile_size
             + (F.col("px") / f).cast("bigint")).alias("pos"),
        )
        .groupBy("tz", "tx", "ty", "pos")
        .agg((F.sum("value") / F.lit(float(f * f))).alias("value"))
    )


def tile_checksums(tiles: DataFrame, tile_size: int) -> DataFrame:
    """Per-tile checksum: sum((1 + pos) * value) mod P over present
    pixels (absent = transparent = 0 contribution) — the
    test_gdal2tiles checksum-grid pattern."""
    return tiles.groupBy("tz", "tx", "ty").agg(
        (F.sum((F.lit(1) + F.col("pos")) * F.col("value")) % CHECKSUM_P)
        .alias("checksum"),
        F.count("*").alias("n_px"),
    )


def overview_tiles(base: DataFrame, *, tz: int, tile_size: int) -> DataFrame:
    """One overview level from base-tile pixel rows (gdal2tiles
    create_overview_tile: merge 4 children, shrink 2x). Values are the
    2x2 child SUMS (= 4*average, exact integers — the oracle-stable
    formulation of the average shrink)."""
    ts = tile_size
    g = base.select(
        "value",
        (F.col("tx") * ts + F.col("pos") % ts).alias("gx"),
        ((F.lit(2**tz - 1) - F.col("ty")) * ts
         + (F.col("pos") / ts).cast("bigint")).alias("gy_img"),
    ).select(
        "value",
        (F.col("gx") / 2).cast("bigint").alias("gx2"),
        (F.col("gy_img") / 2).cast("bigint").alias("gy2"),
    )
    zo = tz - 1
    return g.select(
        F.lit(zo).alias("tz"),
        (F.col("gx2") / ts).cast("bigint").alias("tx"),
        (F.lit(2**zo - 1) - (F.col("gy2") / ts).cast("bigint")).alias("ty"),
        ((F.col("gy2") % ts) * ts + F.col("gx2") % ts).alias("pos"),
        "value",
    ).groupBy("tz", "tx", "ty", "pos").agg(F.sum("value").alias("value"))


# ------------------------------------------------- antialias (PIL) shrink

def pil_lanczos_taps(qs: int, ts: int) -> list[tuple[int, int, list[float]]]:
    """PIL Image.resize ANTIALIAS tap table for a qs -> ts downscale
    (gdal2tiles.py scale_query_to_tile 'antialias' flavor; PIL
    Resample.c precompute): per dest index d —
      scale = qs/ts; support = 3*scale; center = (d + 0.5)*scale;
      xmin = max(0, int(center - support + 0.5));
      xmax = min(qs, int(center + support + 0.5));
      w_j = lanczos3((j - center + 0.5)/scale), normalized to sum 1.
    Computed ONCE in Python; both engines consume the identical float
    literals, so the separable convolution is bit-exact cross-engine
    (only * and + remain). Returns [(d, xmin, [w...])]."""
    import math

    scale = qs / float(ts)
    support = 3.0 * scale
    out = []
    for d in range(ts):
        center = (d + 0.5) * scale
        xmin = max(0, int(center - support + 0.5))
        xmax = min(qs, int(center + support + 0.5))
        ws = []
        for j in range(xmin, xmax):
            x = (j - center + 0.5) / scale
            if x == 0.0:
                w = 1.0
            elif abs(x) < 3.0:
                px_ = math.pi * x
                w = (math.sin(px_) / px_) * (math.sin(px_ / 3.0) / (px_ / 3.0))
            else:
                w = 0.0
            ws.append(w)
        tot = sum(ws)
        out.append((d, xmin, [w / tot for w in ws]))
    return out


def antialias_shrink(qpx: DataFrame, *, tile_size: int, qs: int) -> DataFrame:
    """Separable PIL-ANTIALIAS shrink of raw query-grid pixel rows
    (tz, tx, ty, px, py, value) to (tz, tx, ty, pos, value): horizontal
    tap fold then vertical tap fold, each an ORDERED aggregate-fold
    (sort_array + sequential sum) so the double accumulation order is
    pinned — the DuckDB twin folds the same literals in the same
    order. Absent query pixels contribute 0 (the reference's
    zero-initialized MEM buffer -> PIL input)."""
    spark = qpx.sparkSession
    ts = tile_size
    taps = pil_lanczos_taps(qs, ts)
    rows = [(d, xmin + k, w) for d, xmin, ws in taps for k, w in enumerate(ws)]
    tap_df = spark.createDataFrame(rows, "d bigint, j bigint, w double")

    def fold(df: DataFrame, axis: str, keep: list[str]) -> DataFrame:
        j = df.join(F.broadcast(tap_df), df[axis] == tap_df["j"])
        g = j.groupBy(*keep, "d").agg(
            F.sort_array(F.collect_list(F.struct(
                F.col(axis).alias("_o"), (F.col("w") * F.col("value")).alias("wv")
            ))).alias("_terms")
        )
        return g.withColumn(
            "value", F.expr("aggregate(_terms, 0D, (a, s) -> a + s.wv)")
        ).drop("_terms")

    h = fold(qpx, "px", ["tz", "tx", "ty", "py"]) \
        .select("tz", "tx", "ty", F.col("d").alias("hx"), "py", "value")
    v = fold(h, "py", ["tz", "tx", "ty", "hx"])
    return v.select(
        "tz", "tx", "ty",
        (F.col("d") * ts + F.col("hx")).alias("pos"),
        "value",
    )


PIL_PRECISION_BITS = 32 - 8 - 2  # Pillow Resample.c 8bpc fixed point


def pil_u8_taps(qs: int, ts: int) -> list[tuple[int, int, list[int]]]:
    """INT32-quantized tap table for PIL's uint8 image path (Pillow
    Resample.c normalize_coeffs_8bpc): k = (int)(w * 2^22 +/- 0.5),
    rounded half away from zero, C-cast truncation toward zero."""
    S = 1 << PIL_PRECISION_BITS
    out = []
    for d, xmin, ws in pil_lanczos_taps(qs, ts):
        kk = [int(w * S + 0.5) if w >= 0.0 else int(w * S - 0.5) for w in ws]
        out.append((d, xmin, kk))
    return out


def _clip8_expr(s: str) -> str:
    """Pillow Resample.c clip8: <=0 -> 0, >= 1<<30 -> 255, else >>22.
    The shift branch only sees positive sums, so integral `div`
    (truncation) == the C right shift."""
    hi = 1 << (PIL_PRECISION_BITS + 8)
    return (f"CASE WHEN {s} <= 0 THEN 0 WHEN {s} >= {hi} THEN 255 "
            f"ELSE {s} div {1 << PIL_PRECISION_BITS} END")


def antialias_shrink_u8(qpx: DataFrame, *, tile_size: int, qs: int) -> DataFrame:
    """PIL ANTIALIAS shrink, uint8 fixed-point semantics — the path
    Pillow actually takes for the 8-bit tile buffers gdal2tiles feeds
    it (gdal2tiles.py scale_query_to_tile -> Image.resize on mode-L/
    RGBA images; Resample.c ImagingResampleHorizontal_8bpc):
    per-pass INT32 coefficients (x 2^22, half-away rounding), integer
    accumulate seeded with 2^21, clip8 after EACH pass (horizontal
    first, then vertical over the clipped uint8 intermediate).
    Integer addition is associative, so unlike the float twin no
    ordered fold is needed: both passes are plain whole-stage-codegen
    joins + sums, and the result is bit-exact on any engine."""
    spark = qpx.sparkSession
    ts = tile_size
    taps = pil_u8_taps(qs, ts)
    rows = [(d, xmin + k, c) for d, xmin, cs in taps for k, c in enumerate(cs)]
    tap_df = spark.createDataFrame(rows, "d bigint, j bigint, k bigint")
    bias = 1 << (PIL_PRECISION_BITS - 1)

    def fold(df: DataFrame, axis: str, keep: list[str]) -> DataFrame:
        j = df.join(F.broadcast(tap_df), df[axis] == tap_df["j"])
        g = j.groupBy(*keep, "d").agg(
            (F.lit(bias) + F.sum(F.col("k") * F.col("value").cast("long")))
            .alias("_s")
        )
        return g.withColumn("value", F.expr(_clip8_expr("_s"))).drop("_s")

    h = fold(qpx, "px", ["tz", "tx", "ty", "py"]) \
        .select("tz", "tx", "ty", F.col("d").alias("hx"), "py", "value")
    v = fold(h, "py", ["tz", "tx", "ty", "hx"])
    return v.select(
        "tz", "tx", "ty",
        (F.col("d") * ts + F.col("hx")).alias("pos"),
        F.col("value").cast("long").alias("value"),
    )


def antialias_u8_sql(tz: int, tile_size: int, *, salt: int = SALT_SRC,
                     src_val_sql: str | None = None) -> str:
    """DuckDB twin of antialias_shrink_u8: identical INT32 tap
    literals, integer sums (order-free), clip8 per pass. `//` is floor
    division, equal to the C shift on the positive-only branch."""
    ts = tile_size
    qs = 4 * ts
    taps = pil_u8_taps(qs, ts)
    tap_rows = ", ".join(
        f"({d}, {xmin + k}, {c})"
        for d, xmin, cs in taps for k, c in enumerate(cs)
    )
    bias = 1 << (PIL_PRECISION_BITS - 1)
    hi = 1 << (PIL_PRECISION_BITS + 8)
    shift = 1 << PIL_PRECISION_BITS

    def clip8(s: str) -> str:
        return (f"CASE WHEN {s} <= 0 THEN 0 WHEN {s} >= {hi} THEN 255 "
                f"ELSE {s} // {shift} END")

    ctes = sql_ctes(tz=tz, tile_size=ts, querysize=qs, salt=salt,
                    src_val_sql=src_val_sql).strip()
    return f"""
WITH {ctes},
taps(d, j, k) AS (VALUES {tap_rows}),
hf AS (
  SELECT tz, tx, ty, py, t.d AS hx,
         {clip8(f"({bias} + sum(t.k * CAST(b.value AS BIGINT)))")} AS value
  FROM base b JOIN taps t ON t.j = b.px
  GROUP BY 1, 2, 3, 4, 5
),
vf AS (
  SELECT tz, tx, ty, hx, t.d AS vy,
         {clip8(f"({bias} + sum(t.k * h.value))")} AS value
  FROM hf h JOIN taps t ON t.j = h.py
  GROUP BY 1, 2, 3, 4, 5
)
SELECT tz, tx, ty, vy * {ts} + hx AS pos, CAST(value AS BIGINT) AS value FROM vf
"""


def antialias_sql(tz: int, tile_size: int, *, salt: int = SALT_SRC,
                  src_val_sql: str | None = None) -> str:
    """DuckDB twin of base_tiles(query, 4x) + antialias_shrink: the
    same tap literals, the same ordered folds. Emits the final SELECT
    (tz, tx, ty, pos, value rounded 9)."""
    ts = tile_size
    qs = 4 * ts
    taps = pil_lanczos_taps(qs, ts)
    tap_rows = ", ".join(
        f"({d}, {xmin + k}, {w!r})"
        for d, xmin, ws in taps for k, w in enumerate(ws)
    )
    ctes = sql_ctes(tz=tz, tile_size=ts, querysize=qs, salt=salt,
                    src_val_sql=src_val_sql).strip()
    return f"""
WITH {ctes},
taps(d, j, w) AS (VALUES {tap_rows}),
hf AS (
  SELECT tz, tx, ty, py, t.d AS hx,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(t.w * b.value ORDER BY b.px)), (a, b) -> a + b) AS value
  FROM base b JOIN taps t ON t.j = b.px
  GROUP BY 1, 2, 3, 4, 5
),
vf AS (
  SELECT tz, tx, ty, hx, t.d AS vy,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(t.w * h.value ORDER BY h.py)), (a, b) -> a + b) AS value
  FROM hf h JOIN taps t ON t.j = h.py
  GROUP BY 1, 2, 3, 4, 5
)
SELECT tz, tx, ty, vy * {ts} + hx AS pos, round(value, 9) AS value FROM vf
"""


# --------------------------------------------------------------- SQL twin

def sql_ctes(tz: int = 2, tile_size: int = 16, querysize: int | None = None,
             profile: str = "mercator", salt: int = SALT_SRC,
             src_val_sql: str | None = None) -> str:
    """DuckDB replication: tminmax + geo_query + nearest map, all in
    closed form (trunc() = the C int() truncation; floor for the
    clamped non-negative sample coords). `base` rows are in QUERY-grid
    positions (pos over querysize^2; == tile positions for near)."""
    ts = tile_size
    qs = querysize or tile_size
    w, h = SRC_W, SRC_H
    M31, A = derive.M31, derive.A
    # every geotransform constant is computed ONCE in Python and
    # embedded as a float literal — the engine's tile_details consumes
    # the identical doubles, so the int() truncations cannot diverge
    if profile == "mercator":
        ulx_f, uly_f, xres_f = src_geotransform()
        res = repr(float(mercator.resolution(tz, ts)))
        ox = repr(float(mercator.ORIGIN_SHIFT))   # tile-x origin offset
        oy = repr(float(mercator.ORIGIN_SHIFT))   # tile-y origin offset
        nx, ny = 2**tz, 2**tz
    else:  # geodetic 2:1 profile
        ulx_f, uly_f, xres_f = geodetic_src_geotransform()
        res = repr(float((180.0 / ts) / float(2**tz)))
        ox, oy = "180.0", "90.0"
        nx, ny = 2 * 2**tz, 2**tz
    xres = repr(float(xres_f))
    ulx = repr(float(ulx_f))
    uly = repr(float(uly_f))
    lrx = repr(float(ulx_f + SRC_W * xres_f))
    lry = repr(float(uly_f - SRC_H * xres_f))

    def m2t(mexpr: str, o: str, lim: int) -> str:
        # coords -> pixels -> PixelsToTile(ceil - 1), then clamp
        px = f"(({mexpr}) + {o}) / {res}"
        t = f"CAST(ceil(({px}) / CAST({ts} AS DOUBLE)) - 1 AS BIGINT)"
        return f"least(greatest({t}, 0), {lim})"

    val = (
        f"((((sy * {w} + sx) % {M31}) * {A} + {salt}) % {M31} * {A} "
        f"+ {salt * 7 + 13}) % {M31}"
    )
    if src_val_sql is not None:
        val = src_val_sql
    return f"""
src AS (
  SELECT r.range % {w} AS sx, r.range // {w} AS sy,
         {val} AS value
  FROM range({w * h}) r
),
tminmax AS (
  SELECT {m2t(ulx, ox, nx - 1)} AS tminx, {m2t(lry, oy, ny - 1)} AS tminy,
         {m2t(lrx, ox, nx - 1)} AS tmaxx, {m2t(uly, oy, ny - 1)} AS tmaxy
),
tiles0 AS (
  SELECT CAST(a.range AS BIGINT) AS tx, CAST(b.range AS BIGINT) AS ty
  FROM range({nx}) a CROSS JOIN range({ny}) b, tminmax
  WHERE a.range BETWEEN tminx AND tmaxx AND b.range BETWEEN tminy AND tmaxy
),
gq0 AS (
  SELECT tx, ty,
         CAST(trunc(((tx * {ts} * {res} - {ox}) - {ulx}) / {xres} + 0.001) AS BIGINT) AS rx0,
         CAST(trunc((((ty + 1) * {ts} * {res} - {oy}) - {uly}) / (-{xres}) + 0.001) AS BIGINT) AS ry0,
         greatest(1, CAST(trunc((((tx + 1) * {ts} * {res} - {ox}) - (tx * {ts} * {res} - {ox})) / {xres} + 0.5) AS BIGINT)) AS rxs0,
         greatest(1, CAST(trunc(((ty * {ts} * {res} - {oy}) - ((ty + 1) * {ts} * {res} - {oy})) / (-{xres}) + 0.5) AS BIGINT)) AS rys0
  FROM tiles0
),
gqx AS (
  SELECT tx, ty, ry0, rys0,
         CASE WHEN rx0 < 0 THEN 0 ELSE rx0 END AS rx,
         CASE WHEN rx0 < 0
              THEN rxs0 - CAST(trunc(rxs0 * (CAST(abs(rx0) AS DOUBLE) / rxs0)) AS BIGINT)
              ELSE rxs0 END AS rxs1,
         CASE WHEN rx0 < 0
              THEN CAST(trunc({qs} * (CAST(abs(rx0) AS DOUBLE) / rxs0)) AS BIGINT)
              ELSE 0 END AS wx,
         CASE WHEN rx0 < 0
              THEN {qs} - CAST(trunc({qs} * (CAST(abs(rx0) AS DOUBLE) / rxs0)) AS BIGINT)
              ELSE {qs} END AS wxs1
  FROM gq0
),
gqx2 AS (
  SELECT tx, ty, ry0, rys0, rx, wx,
         CASE WHEN rx + rxs1 > {w}
              THEN CAST(trunc(wxs1 * (CAST({w} - rx AS DOUBLE) / rxs1)) AS BIGINT)
              ELSE wxs1 END AS wxsize,
         CASE WHEN rx + rxs1 > {w} THEN {w} - rx ELSE rxs1 END AS rxsize
  FROM gqx
),
gqy AS (
  SELECT tx, ty, rx, wx, wxsize, rxsize,
         CASE WHEN ry0 < 0 THEN 0 ELSE ry0 END AS ry,
         CASE WHEN ry0 < 0
              THEN rys0 - CAST(trunc(rys0 * (CAST(abs(ry0) AS DOUBLE) / rys0)) AS BIGINT)
              ELSE rys0 END AS rys1,
         CASE WHEN ry0 < 0
              THEN CAST(trunc({qs} * (CAST(abs(ry0) AS DOUBLE) / rys0)) AS BIGINT)
              ELSE 0 END AS wy,
         CASE WHEN ry0 < 0
              THEN {qs} - CAST(trunc({qs} * (CAST(abs(ry0) AS DOUBLE) / rys0)) AS BIGINT)
              ELSE {qs} END AS wys1
  FROM gqx2
),
gq AS (
  SELECT tx, ty, rx, ry, wx, wy, wxsize, rxsize,
         CASE WHEN ry + rys1 > {h}
              THEN CAST(trunc(wys1 * (CAST({h} - ry AS DOUBLE) / rys1)) AS BIGINT)
              ELSE wys1 END AS wysize,
         CASE WHEN ry + rys1 > {h} THEN {h} - ry ELSE rys1 END AS rysize
  FROM gqy
),
dest AS (
  SELECT g.*, p.range % {qs} AS px, p.range // {qs} AS py,
         p.range AS pos
  FROM gq g CROSS JOIN range({qs * qs}) p
  WHERE g.rxsize > 0 AND g.rysize > 0 AND g.wxsize > 0 AND g.wysize > 0
    AND p.range % {qs} >= g.wx AND p.range % {qs} < g.wx + g.wxsize
    AND p.range // {qs} >= g.wy AND p.range // {qs} < g.wy + g.wysize
),
mapped AS (
  SELECT tx, ty, pos, px, py,
    CAST(floor(least(greatest(
      ((0.5 * (CAST(rxsize AS DOUBLE) / CAST(wxsize AS DOUBLE)) + rx) + 1e-10)
        + CAST(px - wx AS DOUBLE) * (CAST(rxsize AS DOUBLE) / CAST(wxsize AS DOUBLE)),
      0.0), CAST({w - 1} AS DOUBLE))) AS BIGINT) AS sx,
    CAST(floor(least(greatest(
      ((0.5 * (CAST(rysize AS DOUBLE) / CAST(wysize AS DOUBLE)) + ry) + 1e-10)
        + CAST(py - wy AS DOUBLE) * (CAST(rysize AS DOUBLE) / CAST(wysize AS DOUBLE)),
      0.0), CAST({h - 1} AS DOUBLE))) AS BIGINT) AS sy
  FROM dest
),
base AS (
  SELECT {tz} AS tz, m.tx, m.ty, m.pos, m.px, m.py, s.value
  FROM mapped m JOIN src s ON s.sx = m.sx AND s.sy = m.sy
)"""
