"""Query registry: every implemented operator as a (spark, oracle-SQL)
pair over the driver's parquet tables.

Each Spark query is the engine's real operator pipeline; each oracle is
ANSI SQL that DuckDB evaluates to the bit-identical result (integer
math everywhere results must be exact; double math only where both
engines perform the identical IEEE op sequence — see sources.derive).

Geometry anchors: points are derived from integer table keys via the
cross-engine LCG (derive.hash01), polygons are the closed-form
countries64 layer — so the oracle needs no geometry extension, just
arithmetic (the reference's own test strategy: deterministic fixtures
+ literal expected values, autotest/ogr/ogr_sql_test.py).
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import tiles as TF
from .operators import dedup, knn, multimodal, raster, relational, similarity, text, tiling
from .operators.spatial_join import spatial_join_points_in_polygons
from .sources import derive, docs, polygons

M31 = derive.M31
A = derive.A
OS = "20037508.342789244"

# ---------------------------------------------------------------- helpers

SALT_QLON, SALT_QLAT = 5, 6


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point layer anchored on orders keys (scales with sf)."""
    o = _read(spark, sf_dir, "orders")
    i = F.col("o_orderkey")
    return o.select(
        i.alias("id"),
        docs.lon_col(i).alias("lon"),
        docs.lat_col(i).alias("lat"),
    )


def _qpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN query layer anchored on supplier keys (distinct salts)."""
    s = _read(spark, sf_dir, "supplier")
    i = F.col("s_suppkey")
    return s.select(
        i.alias("qid"),
        (F.lit(-180.0) + F.lit(360.0) * docs.hash01_col(i, SALT_QLON)).alias("lon"),
        (F.lit(-85.05) + F.lit(170.1) * docs.hash01_col(i, SALT_QLAT)).alias("lat"),
    )


def _pts_cte() -> str:
    return (
        f"SELECT o_orderkey AS id, {derive.lon_sql('o_orderkey')} AS x, "
        f"{derive.lat_sql('o_orderkey')} AS y FROM orders"
    )


def _qpts_cte() -> str:
    lon = f"CAST(-180 AS DOUBLE)+CAST(360 AS DOUBLE)*({derive.hash01_sql('s_suppkey', SALT_QLON)})"
    lat = f"CAST(-85.05 AS DOUBLE)+CAST(170.1 AS DOUBLE)*({derive.hash01_sql('s_suppkey', SALT_QLAT)})"
    return f"SELECT s_suppkey AS qid, {lon} AS x, {lat} AS y FROM supplier"


def _tile_cte(zoom: int) -> str:
    """pts -> clamped TMS tiles at `zoom` (from the pts CTE cols x,y)."""
    lim = 2**zoom - 1
    tx = derive.clamp_sql(derive.tile_sql(derive.mercator_mx_sql("x"), zoom), 0, lim)
    ty = derive.clamp_sql(derive.tile_sql(derive.mercator_my_sql("y"), zoom), 0, lim)
    return f"SELECT id, {tx} AS tx, {ty} AS ty_tms FROM pts"


_TOKS = "list_filter(string_split(text, ' '), t -> t != '')"
_WHASH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split(w, ''), c -> CAST(ascii(c) AS BIGINT))), "
    f"(h, c) -> (h * 31 + c) % {M31})"
)


def _count_token_sql(token: str) -> str:
    """Token-equality count (twin of text._count_token)."""
    return f"len(list_filter(string_split(text, ' '), t -> t = '{token}'))"


# ================================================================ queries

def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile assignment at z=12: the gdal2tiles base-tile math as one
    codegen projection (SURVEY §2.11)."""
    pts = _points(spark, sf_dir)
    t = tiling.assign_tiles(pts, zoom=12)
    return t.select("id", "tx", "ty_xyz", "quadkey")


def sql_tile_assign() -> str:
    qk = derive.quadkey_sql("tx", "ty_tms", 12)
    return f"""
WITH pts AS ({_pts_cte()}), t AS ({_tile_cte(12)})
SELECT id, tx, {derive.xyz_ty_sql('ty_tms', 12)} AS ty_xyz, {qk} AS quadkey FROM t
"""


def q_base_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdal2tiles base-tile pipeline END TO END: source raster (not
    tile-aligned) -> geo_query windows -> nearest-resampled base tile
    payloads at z2 -> one overview level (2x2 child sums) at z1; output
    is the per-tile checksum grid (test_gdal2tiles.py:121-124
    pattern). Exercises the border-tile window shifts and the
    rasterio.cpp nearest rule."""
    from .operators import base_tiles as BT

    base = BT.base_tiles(spark, tz=2, tile_size=16)
    chk2 = BT.tile_checksums(base, 16)
    ov = BT.overview_tiles(base, tz=2, tile_size=16)
    chk1 = BT.tile_checksums(ov, 16)
    return chk2.unionByName(chk1)


def sql_base_tiles() -> str:
    from .operators import base_tiles as BT

    ctes = BT.sql_ctes(tz=2, tile_size=16).strip()
    P = BT.CHECKSUM_P
    return f"""
WITH {ctes},
chk2 AS (
  SELECT tz, tx, ty, CAST(sum((1 + pos) * value) % {P} AS BIGINT) AS checksum,
         count(*) AS n_px
  FROM base GROUP BY 1, 2, 3
),
ovg AS (
  SELECT (tx * 16 + pos % 16) // 2 AS gx2,
         ((3 - ty) * 16 + pos // 16) // 2 AS gy2,
         value
  FROM base
),
ov AS (
  SELECT 1 AS tz, gx2 // 16 AS tx, 1 - (gy2 // 16) AS ty,
         (gy2 % 16) * 16 + gx2 % 16 AS pos,
         CAST(sum(value) AS BIGINT) AS value
  FROM ovg GROUP BY 1, 2, 3, 4
),
chk1 AS (
  SELECT tz, tx, ty, CAST(sum((1 + pos) * value) % {P} AS BIGINT) AS checksum,
         count(*) AS n_px
  FROM ov GROUP BY 1, 2, 3
)
SELECT * FROM chk2 UNION ALL SELECT * FROM chk1
"""


def q_base_tiles_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdal2tiles DEFAULT (average) base-tile path: 4x-supersampled
    nearest query grid (querysize = 4*tile_size, gdal2tiles.py:2210)
    shrunk by exact 4x4 block average (scale_query_to_tile). Checksums
    over value*16 (the exact integer subpixel sums)."""
    from .operators import base_tiles as BT

    base = BT.base_tiles(spark, tz=2, tile_size=16, resampling="average")
    qsum = F.round(F.col("value") * 16).cast("bigint")
    return base.groupBy("tz", "tx", "ty").agg(
        (F.sum((F.lit(1) + F.col("pos")) * qsum) % BT.CHECKSUM_P)
        .alias("checksum"),
        F.count("*").alias("n_px"),
    )


def sql_base_tiles_avg() -> str:
    from .operators import base_tiles as BT

    ctes = BT.sql_ctes(tz=2, tile_size=16, querysize=64).strip()
    P = BT.CHECKSUM_P
    return f"""
WITH {ctes},
avg0 AS (
  SELECT tz, tx, ty, (py // 4) * 16 + (px // 4) AS pos,
         CAST(sum(value) AS BIGINT) AS qsum
  FROM base GROUP BY 1, 2, 3, 4
)
SELECT tz, tx, ty,
       CAST(sum((1 + pos) * qsum) % {P} AS BIGINT) AS checksum,
       count(*) AS n_px
FROM avg0 GROUP BY 1, 2, 3
"""


def q_base_tiles_bilinear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdal2tiles BILINEAR base-tile path (querysize = 2*tile_size,
    gdal2tiles.py:2225; the exact factor-2 shrink has uniform 0.25
    weights = the 2x2 block mean). Checksums over value*4 (exact
    integer subpixel sums)."""
    from .operators import base_tiles as BT

    base = BT.base_tiles(spark, tz=2, tile_size=16, resampling="bilinear")
    qsum = F.round(F.col("value") * 4).cast("bigint")
    return base.groupBy("tz", "tx", "ty").agg(
        (F.sum((F.lit(1) + F.col("pos")) * qsum) % BT.CHECKSUM_P)
        .alias("checksum"),
        F.count("*").alias("n_px"),
    )


def sql_base_tiles_bilinear() -> str:
    from .operators import base_tiles as BT

    ctes = BT.sql_ctes(tz=2, tile_size=16, querysize=32).strip()
    P = BT.CHECKSUM_P
    return f"""
WITH {ctes},
avg0 AS (
  SELECT tz, tx, ty, (py // 2) * 16 + (px // 2) AS pos,
         CAST(sum(value) AS BIGINT) AS qsum
  FROM base GROUP BY 1, 2, 3, 4
)
SELECT tz, tx, ty,
       CAST(sum((1 + pos) * qsum) % {P} AS BIGINT) AS checksum,
       count(*) AS n_px
FROM avg0 GROUP BY 1, 2, 3
"""


def q_base_tiles_geodetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base tiles in the GEODETIC (EPSG:4326 2:1) profile — the second
    of gdal2tiles' two global profiles, end to end: degree-space
    TileBounds/tminmax, same geo_query + nearest machinery, checksum
    grid."""
    from .operators import base_tiles as BT

    base = BT.base_tiles(spark, tz=2, tile_size=16, profile="geodetic")
    return BT.tile_checksums(base, 16)


def sql_base_tiles_geodetic() -> str:
    from .operators import base_tiles as BT

    ctes = BT.sql_ctes(tz=2, tile_size=16, profile="geodetic").strip()
    P = BT.CHECKSUM_P
    return f"""
WITH {ctes}
SELECT tz, tx, ty, CAST(sum((1 + pos) * value) % {P} AS BIGINT) AS checksum,
       count(*) AS n_px
FROM base GROUP BY 1, 2, 3
"""


_RGBA_SALTS = [307, 408, 509]  # R, G, B band salts; alpha is constant 255


def _band_src_sql(salt: int, byte_range: bool = False) -> str:
    from .operators import base_tiles as BT

    w = BT.SRC_W
    v = (f"((((sy * {w} + sx) % {M31}) * {A} + {salt}) % {M31} * {A} "
         f"+ {salt * 7 + 13}) % {M31}")
    return f"({v}) % 256" if byte_range else v


def q_base_tiles_rgba(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-band (RGBA) base-tile checksum grid — the exact
    test_gdal2tiles.py:121-124 expected_cs pattern (per-tile list of
    per-BAND checksums): three uint8 hash bands + a constant-255 alpha
    band over the source footprint, each through the full geo_query +
    nearest pipeline; transparency (tiles past the source) = absent
    rows = 0 contribution, matching the reference's alpha=0 regions."""
    from .operators import base_tiles as BT

    out = None
    for b, salt in enumerate(_RGBA_SALTS):
        src = BT.src_pixels(spark, salt=salt, byte_range=True)
        chk = BT.tile_checksums(
            BT.base_tiles(spark, tz=2, tile_size=16, src=src), 16
        ).withColumn("band", F.lit(b))
        out = chk if out is None else out.unionByName(chk)
    alpha = BT.tile_checksums(
        BT.base_tiles(spark, tz=2, tile_size=16, src=BT.src_alpha(spark)), 16
    ).withColumn("band", F.lit(3))
    out = out.unionByName(alpha)
    return out.select("tz", "tx", "ty", "band", "checksum", "n_px")


def sql_base_tiles_rgba() -> str:
    from .operators import base_tiles as BT

    P = BT.CHECKSUM_P
    parts = []
    vals = [_band_src_sql(s, byte_range=True) for s in _RGBA_SALTS] + ["255"]
    for b, v in enumerate(vals):
        ctes = BT.sql_ctes(tz=2, tile_size=16, src_val_sql=v).strip()
        parts.append(f"""
SELECT tz, tx, ty, {b} AS band,
       CAST(sum((1 + pos) * value) % {P} AS BIGINT) AS checksum,
       count(*) AS n_px
FROM (WITH {ctes} SELECT * FROM base) GROUP BY 1, 2, 3
""")
    return "\nUNION ALL\n".join(parts)


def q_base_tiles_antialias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdal2tiles ANTIALIAS scaling flavor: 4x-supersampled query grid
    shrunk by the separable PIL Lanczos-3 resize (scale_query_to_tile,
    gdal2tiles.py options.resampling == 'antialias'). Two parts:
    `float` — real-valued PIL semantics, tap weights computed once in
    Python and shared as literals with the oracle so only +/* remain;
    `u8` — the fixed-point path Pillow actually takes on the 8-bit
    tile buffers (Resample.c 8bpc: INT32 taps x 2^22, 2^21 bias,
    clip8 after each pass) — pure integer math, bit-exact."""
    from .operators import base_tiles as BT

    src = BT.src_pixels(spark, salt=BT.SALT_SRC, byte_range=True)
    qpx = BT.base_tiles(spark, tz=2, tile_size=16, resampling="query",
                        query_factor=4, src=src)
    fl = BT.antialias_shrink(qpx, tile_size=16, qs=64).select(
        "tz", "tx", "ty", "pos", F.round("value", 9).alias("value"))
    u8 = BT.antialias_shrink_u8(qpx, tile_size=16, qs=64)
    cols = ["tz", "tx", "ty", "pos", "value"]
    return _suite([("float", fl, [], cols), ("u8", u8, [], cols)],
                  n_str=0, n_num=5)


def sql_base_tiles_antialias() -> str:
    from .operators import base_tiles as BT

    v = _band_src_sql(BT.SALT_SRC, byte_range=True)
    cols = ["tz", "tx", "ty", "pos", "value"]
    return _suite_sql(
        [("float", BT.antialias_sql(2, 16, src_val_sql=v), [], cols),
         ("u8", BT.antialias_u8_sql(2, 16, src_val_sql=v), [], cols)],
        n_str=0, n_num=5)


def q_tile_assign_geodetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile assignment in the EPSG:4326 geodetic profile
    (gdal2tiles.py:534-629 GlobalGeodetic, tmscompatible 2:1 grid):
    lon/lat are planar, top level is 2x1 tiles — the second of
    gdal2tiles' two global profiles."""
    pts = _points(spark, sf_dir)
    return TF.geodetic_tile_columns(pts, zoom=10).select("id", "gtx", "gty_tms")


def sql_tile_assign_geodetic() -> str:
    z, ts = 10, 256
    res = repr((180.0 / ts) / float(2**z))
    tx = f"CAST(ceil(((180.0 + x) / {res}) / CAST({ts} AS DOUBLE)) - 1 AS BIGINT)"
    ty = f"CAST(ceil(((90.0 + y) / {res}) / CAST({ts} AS DOUBLE)) - 1 AS BIGINT)"
    nx, ny = 2 * 2**z, 2**z
    return f"""
WITH pts AS ({_pts_cte()})
SELECT id,
       least(greatest({tx}, 0), {nx - 1}) AS gtx,
       least(greatest({ty}, 0), {ny - 1}) AS gty_tms
FROM pts
"""


def q_pyramid_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count pyramid z5..z0 — the overview reduction loop
    (gdal2tiles.py:1471 analog) with count as merge fn."""
    return tiling.pyramid_counts(_points(spark, sf_dir), max_zoom=5, min_zoom=0)


def sql_pyramid_counts() -> str:
    qk = derive.quadkey_sql("tx", "ty_tms", 5)
    parts = [f"SELECT 5 AS zoom, quadkey, cnt FROM base"]
    for z in range(4, -1, -1):
        parts.append(
            f"SELECT {z} AS zoom, substring(quadkey, 1, {z}) AS quadkey, "
            f"CAST(sum(cnt) AS BIGINT) AS cnt FROM base GROUP BY 2"
        )
    union = "\nUNION ALL\n".join(parts)
    return f"""
WITH pts AS ({_pts_cte()}), t AS ({_tile_cte(5)}),
base AS (SELECT {qk} AS quadkey, count(*) AS cnt FROM t GROUP BY 1)
{union}
"""


def q_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon spatial join, broadcast cell-join plan
    (SURVEY §2.3; FilterGeometry staging §2.2)."""
    pts = _points(spark, sf_dir)
    cov = polygons.countries64_cover(spark, res=6)
    return spatial_join_points_in_polygons(
        pts, cov, res=6, strategy="broadcast", keep_point_cols=["id"]
    )


def sql_spatial_join() -> str:
    return derive.pip_join_sql(_pts_cte(), id_col="id", x_col="x", y_col="y")


def q_spatial_join_wkb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end WKB path: points stored as WKB binary (GeoParquet
    convention, ogrgeometry.cpp:1515/1610) joined against WKB
    MultiPolygons WITH holes and island parts. The point column is
    encoded then batch-decoded inside the pipeline, so the codec is on
    the hot path; the oracle computes the identical multi-ring
    crossing-rule result from the closed-form fixture — a WKB-free
    twin, proving the codec is lossless."""
    from .kernels import wkb as wkb_mod
    from .operators.spatial_join import spatial_join_wkb

    pts = _points(spark, sf_dir)

    @F.pandas_udf("binary")
    def _enc(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(wkb_mod.encode_points(lon.to_numpy(), lat.to_numpy()))

    wkb_pts = pts.select("id", _enc("lon", "lat").alias("geom"))
    cov = polygons.countries64_mp_cover(spark, res=6)
    return spatial_join_wkb(wkb_pts, cov, res=6, keep_point_cols=["id"])


def sql_spatial_join_wkb() -> str:
    return derive.pip_mp_join_sql(
        _pts_cte(), hole_s=polygons.HOLE_S, island_s=polygons.ISLAND_S,
        id_col="id", x_col="x", y_col="y",
    )


def q_spatial_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same join with the hot-polygon fixture + salted shuffle strategy
    (north_rule skew handling)."""
    from .kernels import cells

    pts = _points(spark, sf_dir)
    cov = polygons.countries64_cover(spark, res=6, skew_poly0=True)
    pdf = polygons.countries64_pdf(skew_poly0=True)
    ring = np.column_stack([np.asarray(pdf.iloc[0]["xs"]), np.asarray(pdf.iloc[0]["ys"])])
    hot = [int(c) for c in cells.polygon_cover(ring, 6)]
    return spatial_join_points_in_polygons(
        pts, cov, res=6, strategy="salted", hot_cells=hot, n_salt=8,
        keep_point_cols=["id"],
    )


def sql_spatial_join_skew() -> str:
    return derive.pip_join_sql(_pts_cte(), id_col="id", x_col="x", y_col="y", skew=True)


BIGRING_NV = 4096


def q_spatial_join_bigring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship scale fixture, correctness-gated (VERDICT r3 item
    2): the 4096-vertex dense cover (real-country ring sizes) joined
    through BOTH exact-stage engines — the broadcast-dict Arrow PIP
    (rings cross once per executor, 8 B/candidate) and the grouped
    cogroup PIP (no-broadcast regime: rings ship once per
    (cell, poly_id) group) — plus (r5) the SALTED grouped form with
    salting forced on for every key (n_salt=4), which replicates each
    4096-vertex ring per salt and splits each cogroup four ways. One
    oracle replays the crossing rule (ogrlinearring.cpp:503-531) over
    all 4096 edges; all three engine tags must produce the identical
    row set."""
    pts = _points(spark, sf_dir)
    cov = polygons.countries64_dense_cover(spark, res=6, nv=BIGRING_NV)
    out = []
    for tag, st in (("dict", "broadcast"), ("grouped", "shuffle"),
                    ("salted", "grouped_salted")):
        out.append(
            spatial_join_points_in_polygons(
                pts, cov, res=6, strategy=st, n_salt=4,
                keep_point_cols=["id"],
            ).select("id", "poly_id", F.lit(tag).alias("engine"))
        )
    return out[0].unionByName(out[1]).unionByName(out[2])


def sql_spatial_join_bigring() -> str:
    inner = derive.pip_join_sql(
        _pts_cte(), id_col="id", x_col="x", y_col="y",
        nv_override=BIGRING_NV,
    )
    return f"""
WITH hits AS ({inner})
SELECT id, poly_id, 'dict' AS engine FROM hits
UNION ALL
SELECT id, poly_id, 'grouped' AS engine FROM hits
UNION ALL
SELECT id, poly_id, 'salted' AS engine FROM hits
"""


def q_spatial_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SetSpatialFilter path: docs whose point intersects ONE filter
    polygon (the SURVEY §7.2 minimal slice)."""
    pts = _points(spark, sf_dir)
    cov = polygons.countries64_cover(spark, res=6).filter(F.col("poly_id") == 27)
    out = spatial_join_points_in_polygons(
        pts, cov, res=6, strategy="broadcast", keep_point_cols=["id"]
    )
    return out.select("id")


def sql_spatial_filter() -> str:
    inner = derive.pip_join_sql(_pts_cte(), id_col="id", x_col="x", y_col="y")
    return f"SELECT id FROM ({inner}) WHERE poly_id = 27"


def q_spatial_erase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layer-algebra Erase for point layers (ogrlayer.cpp:5806 — the
    spatial ANTI-join): docs whose point is inside NO polygon."""
    pts = _points(spark, sf_dir)
    cov = polygons.countries64_cover(spark, res=6)
    hits = spatial_join_points_in_polygons(
        pts, cov, res=6, strategy="broadcast", keep_point_cols=["id"]
    ).select("id")
    return pts.select("id").join(hits, "id", "left_anti")


def sql_spatial_erase() -> str:
    inner = derive.pip_join_sql(_pts_cte(), id_col="id", x_col="x", y_col="y")
    return f"""
WITH pts AS ({_pts_cte()})
SELECT pts.id FROM pts
LEFT JOIN (SELECT DISTINCT id FROM ({inner}) t) h ON h.id = pts.id
WHERE h.id IS NULL
"""


def q_spatial_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layer-algebra Identity for point layers (ogrlayer.cpp:4730):
    every input point, with poly_id where covered, NULL elsewhere."""
    pts = _points(spark, sf_dir)
    cov = polygons.countries64_cover(spark, res=6)
    hits = spatial_join_points_in_polygons(
        pts, cov, res=6, strategy="broadcast", keep_point_cols=["id"]
    )
    return pts.select("id").join(hits, "id", "left").select("id", "poly_id")


def sql_spatial_identity() -> str:
    inner = derive.pip_join_sql(_pts_cte(), id_col="id", x_col="x", y_col="y")
    return f"""
WITH pts AS ({_pts_cte()})
SELECT pts.id, h.poly_id FROM pts
LEFT JOIN ({inner}) h ON h.id = pts.id
"""


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: cos(a,b) >= 0.4 over the
    quantized vectors — the exact comparison 100*dot^2 >= 16*naa*nbb
    AND dot > 0 (squares stay < 2^53, so the double products are
    exact). 0.4 is calibrated to the synthetic corpus (max pairwise
    cosine ~0.51); real near-dup corpora would use ~0.9."""
    e = _read(spark, sf_dir, "embeddings")
    q = similarity.quantize(e, id_col="vec_id")
    n = q.select(
        "id", "qvec",
        F.expr("aggregate(qvec, 0L, (s, v) -> s + v * v)").alias("n2"),
    )
    a = n.select(F.col("id").alias("id_a"), F.col("qvec").alias("va"), F.col("n2").alias("naa"))
    b = n.select(F.col("id").alias("id_b"), F.col("qvec").alias("vb"), F.col("n2").alias("nbb"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "dot",
            F.expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0L, (s, v) -> s + v)"),
        )
        .filter(
            (F.col("dot") > 0)
            & (
                F.lit(100.0) * (F.col("dot") * F.col("dot")).cast("double")
                >= F.lit(16.0) * (F.col("naa") * F.col("nbb")).cast("double")
            )
        )
    )
    return pairs.select("id_a", "id_b", "dot")


def sql_dedup_embedding() -> str:
    sc = similarity.SCALE
    return f"""
WITH qv AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {sc}) AS BIGINT)) AS v
  FROM embeddings
),
n AS (SELECT vec_id, v, CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS n2 FROM qv),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.n2 AS naa, b.n2 AS nbb,
         a.v AS va, b.v AS vb
  FROM n a JOIN n b ON a.vec_id < b.vec_id
),
e AS (SELECT id_a, id_b, naa, nbb, unnest(va) AS xa, unnest(vb) AS xb FROM p),
d AS (SELECT id_a, id_b, naa, nbb, CAST(sum(xa * xb) AS BIGINT) AS dot FROM e GROUP BY 1, 2, 3, 4)
SELECT id_a, id_b, dot FROM d
WHERE dot > 0 AND 100.0 * CAST(dot * dot AS DOUBLE) >= 16.0 * CAST(naa * nbb AS DOUBLE)
"""


def q_dedup_embedding_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs THE SCALE WAY: IVF multi-assign bucket
    candidates + exact integer cosine verify (no cross join; per-bucket
    pairs are O((n/K)^2)). The all-pairs q_dedup_embedding stays as the
    small-scale recall yardstick; this is the production path."""
    e = _read(spark, sf_dir, "embeddings")
    return similarity.ivf_dedup_pairs(
        e, n_centroids=8, n_assign=2, cos_threshold_x10=4, id_col="vec_id"
    )


def sql_dedup_embedding_ivf() -> str:
    ctes = similarity.ivf_sql_ctes(dim=64, n_centroids=8, n_assign=2)
    return f"""
WITH {ctes.strip()},
candp AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM asg a JOIN asg b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
),
pf AS (
  SELECT id_a, id_b, na.v AS va, nb.v AS vb, na.n2 AS naa, nb.n2 AS nbb
  FROM candp JOIN n0 na ON na.vec_id = id_a JOIN n0 nb ON nb.vec_id = id_b
),
d AS (
  SELECT id_a, id_b, naa, nbb,
         CAST(list_sum(list_transform(range(64), i -> va[i+1] * vb[i+1])) AS BIGINT) AS dot
  FROM pf
)
SELECT id_a, id_b, dot FROM d
WHERE dot > 0 AND 100.0 * CAST(dot * dot AS DOUBLE) >= 16.0 * CAST(naa * nbb AS DOUBLE)
"""


SALT_LAX, SALT_LAY, SALT_LAW, SALT_LAH = 21, 22, 23, 24
SALT_LBX, SALT_LBY, SALT_LBW, SALT_LBH = 25, 26, 27, 28


def _l_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic non-convex pair fixture: two axis-aligned L-shapes
    per supplier key (B anchored inside A's bbox so most pairs overlap
    non-convexly; disjoint/containment pairs exercised too)."""
    s = _read(spark, sf_dir, "supplier")
    i = F.col("s_suppkey")
    ax = F.lit(-170.0) + F.lit(320.0) * docs.hash01_col(i, SALT_LAX)
    ay = F.lit(-75.0) + F.lit(140.0) * docs.hash01_col(i, SALT_LAY)
    w = F.lit(4.0) + F.lit(4.0) * docs.hash01_col(i, SALT_LAW)
    h = F.lit(4.0) + F.lit(4.0) * docs.hash01_col(i, SALT_LAH)
    w1 = w * F.lit(0.4)
    h1 = h * F.lit(0.45)
    bx = ax + w * (F.lit(0.1) + F.lit(0.5) * docs.hash01_col(i, SALT_LBX))
    by = ay + h * (F.lit(0.1) + F.lit(0.5) * docs.hash01_col(i, SALT_LBY))
    wb = F.lit(4.0) + F.lit(4.0) * docs.hash01_col(i, SALT_LBW)
    hb = F.lit(4.0) + F.lit(4.0) * docs.hash01_col(i, SALT_LBH)
    wb1 = wb * F.lit(0.4)
    hb1 = hb * F.lit(0.45)
    return s.select(
        i.alias("pair_id"),
        F.array(ax, ax + w, ax + w, ax + w1, ax + w1, ax).alias("xs_a"),
        F.array(ay, ay, ay + h1, ay + h1, ay + h, ay + h).alias("ys_a"),
        F.array(bx, bx + wb, bx + wb, bx + wb1, bx + wb1, bx).alias("xs_b"),
        F.array(by, by, by + hb1, by + hb1, by + hb, by + hb).alias("ys_b"),
    )


def q_boolean_geometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-convex boolean RESULT GEOMETRY: Greiner-Hormann traced
    rings for Intersection and Union per L-shape pair
    (ogrlayer.cpp:3345/:3763 merged-geometry semantics), reported as
    the orientation-free ring vertex set. The oracle derives the same
    set closed-form: strictly-inside/outside original vertices plus
    proper edge crossings."""
    from .operators import boolean_geom

    pairs = _l_pairs(spark, sf_dir)
    rings = boolean_geom.boolean_rings(pairs)
    return boolean_geom.ring_vertex_set(rings, decimals=9)


def _l_pair_ctes() -> str:
    hx = lambda s: derive.hash01_sql("s_suppkey", s)
    params = f"""
SELECT s_suppkey AS pid,
  -170.0 + 320.0 * ({hx(SALT_LAX)}) AS ax,
  -75.0 + 140.0 * ({hx(SALT_LAY)}) AS ay,
  4.0 + 4.0 * ({hx(SALT_LAW)}) AS w,
  4.0 + 4.0 * ({hx(SALT_LAH)}) AS h,
  4.0 + 4.0 * ({hx(SALT_LBW)}) AS wb,
  4.0 + 4.0 * ({hx(SALT_LBH)}) AS hb,
  0.1 + 0.5 * ({hx(SALT_LBX)}) AS fbx,
  0.1 + 0.5 * ({hx(SALT_LBY)}) AS fby
FROM supplier"""
    # vertex coordinate CASEs (exact op order as the Spark arrays)
    vxa = ("CASE j WHEN 0 THEN ax WHEN 1 THEN ax + w WHEN 2 THEN ax + w "
           "WHEN 3 THEN ax + w * 0.4 WHEN 4 THEN ax + w * 0.4 ELSE ax END")
    vya = ("CASE j WHEN 0 THEN ay WHEN 1 THEN ay WHEN 2 THEN ay + h * 0.45 "
           "WHEN 3 THEN ay + h * 0.45 WHEN 4 THEN ay + h ELSE ay + h END")
    vxb = ("CASE j WHEN 0 THEN bx WHEN 1 THEN bx + wb WHEN 2 THEN bx + wb "
           "WHEN 3 THEN bx + wb * 0.4 WHEN 4 THEN bx + wb * 0.4 ELSE bx END")
    vyb = ("CASE j WHEN 0 THEN by_ WHEN 1 THEN by_ WHEN 2 THEN by_ + hb * 0.45 "
           "WHEN 3 THEN by_ + hb * 0.45 WHEN 4 THEN by_ + hb ELSE by_ + hb END")
    return f"""
k0 AS ({params}),
k AS (
  SELECT pid, ax, ay, w, h, wb, hb,
         ax + w * fbx AS bx, ay + h * fby AS by_
  FROM k0
),
j6 AS (SELECT CAST(range AS BIGINT) AS j FROM range(6)),
va AS (SELECT pid, j, {vxa} AS x, {vya} AS y FROM k CROSS JOIN j6),
vb AS (SELECT pid, j, {vxb} AS x, {vyb} AS y FROM k CROSS JOIN j6),
ea AS (
  SELECT a1.pid, a1.j, a1.x AS x1, a1.y AS y1, a2.x AS x2, a2.y AS y2
  FROM va a1 JOIN va a2 ON a2.pid = a1.pid AND a2.j = (a1.j + 1) % 6
),
eb AS (
  SELECT b1.pid, b1.j, b1.x AS x1, b1.y AS y1, b2.x AS x2, b2.y AS y2
  FROM vb b1 JOIN vb b2 ON b2.pid = b1.pid AND b2.j = (b1.j + 1) % 6
),
-- crossing-rule PIP of A vertices against B (ogrlinearring.cpp:503-531)
pipa AS (
  SELECT v.pid, v.j, v.x, v.y,
         sum(CASE WHEN ((((e.y2 - v.y) > 0) AND ((e.y1 - v.y) <= 0))
                     OR (((e.y1 - v.y) > 0) AND ((e.y2 - v.y) <= 0)))
                   AND (((e.x2 - v.x) * (e.y1 - v.y) - (e.x1 - v.x) * (e.y2 - v.y))
                        / ((e.y1 - v.y) - (e.y2 - v.y))) > 0.0
             THEN 1 ELSE 0 END) % 2 AS inside
  FROM va v JOIN eb e ON e.pid = v.pid GROUP BY 1, 2, 3, 4
),
pipb AS (
  SELECT v.pid, v.j, v.x, v.y,
         sum(CASE WHEN ((((e.y2 - v.y) > 0) AND ((e.y1 - v.y) <= 0))
                     OR (((e.y1 - v.y) > 0) AND ((e.y2 - v.y) <= 0)))
                   AND (((e.x2 - v.x) * (e.y1 - v.y) - (e.x1 - v.x) * (e.y2 - v.y))
                        / ((e.y1 - v.y) - (e.y2 - v.y))) > 0.0
             THEN 1 ELSE 0 END) % 2 AS inside
  FROM vb v JOIN ea e ON e.pid = v.pid GROUP BY 1, 2, 3, 4
),
-- proper edge crossings with the kernel's exact formula order
cross0 AS (
  SELECT a.pid,
         (a.x2 - a.x1) AS d1x, (a.y2 - a.y1) AS d1y,
         (b.x2 - b.x1) AS d2x, (b.y2 - b.y1) AS d2y,
         (b.x1 - a.x1) AS ex, (b.y1 - a.y1) AS ey,
         a.x1 AS px, a.y1 AS py
  FROM ea a JOIN eb b ON b.pid = a.pid
),
crossings AS (
  SELECT pid,
         px + ((ex * d2y - ey * d2x) / (d1x * d2y - d1y * d2x)) * d1x AS x,
         py + ((ex * d2y - ey * d2x) / (d1x * d2y - d1y * d2x)) * d1y AS y
  FROM cross0
  WHERE (d1x * d2y - d1y * d2x) != 0.0
    AND ((ex * d2y - ey * d2x) / (d1x * d2y - d1y * d2x)) > 0.0
    AND ((ex * d2y - ey * d2x) / (d1x * d2y - d1y * d2x)) < 1.0
    AND ((ex * d1y - ey * d1x) / (d1x * d2y - d1y * d2x)) > 0.0
    AND ((ex * d1y - ey * d1x) / (d1x * d2y - d1y * d2x)) < 1.0
),
st AS (
  SELECT k.pid,
         coalesce(c.n, 0) AS ncross,
         (SELECT inside FROM pipa WHERE pipa.pid = k.pid AND pipa.j = 0) AS a_in_b,
         (SELECT inside FROM pipb WHERE pipb.pid = k.pid AND pipb.j = 0) AS b_in_a
  FROM k LEFT JOIN (SELECT pid, count(*) AS n FROM crossings GROUP BY 1) c
    ON c.pid = k.pid
)"""


def sql_boolean_geometry() -> str:
    return f"""
WITH {_l_pair_ctes().strip()},
iverts AS (
  SELECT p.pid, p.x, p.y FROM pipa p JOIN st ON st.pid = p.pid
   WHERE st.ncross > 0 AND p.inside = 1
  UNION ALL
  SELECT p.pid, p.x, p.y FROM pipb p JOIN st ON st.pid = p.pid
   WHERE st.ncross > 0 AND p.inside = 1
  UNION ALL
  SELECT c.pid, c.x, c.y FROM crossings c
  UNION ALL
  SELECT v.pid, v.x, v.y FROM va v JOIN st ON st.pid = v.pid
   WHERE st.ncross = 0 AND st.a_in_b = 1
  UNION ALL
  SELECT v.pid, v.x, v.y FROM vb v JOIN st ON st.pid = v.pid
   WHERE st.ncross = 0 AND st.a_in_b = 0 AND st.b_in_a = 1
),
uverts AS (
  SELECT p.pid, p.x, p.y FROM pipa p JOIN st ON st.pid = p.pid
   WHERE st.ncross > 0 AND p.inside = 0
  UNION ALL
  SELECT p.pid, p.x, p.y FROM pipb p JOIN st ON st.pid = p.pid
   WHERE st.ncross > 0 AND p.inside = 0
  UNION ALL
  SELECT c.pid, c.x, c.y FROM crossings c
  UNION ALL
  SELECT v.pid, v.x, v.y FROM vb v JOIN st ON st.pid = v.pid
   WHERE st.ncross = 0 AND st.a_in_b = 1
  UNION ALL
  SELECT v.pid, v.x, v.y FROM va v JOIN st ON st.pid = v.pid
   WHERE st.ncross = 0 AND st.a_in_b = 0 AND st.b_in_a = 1
  UNION ALL
  SELECT v.pid, v.x, v.y FROM va v JOIN st ON st.pid = v.pid
   WHERE st.ncross = 0 AND st.a_in_b = 0 AND st.b_in_a = 0
  UNION ALL
  SELECT v.pid, v.x, v.y FROM vb v JOIN st ON st.pid = v.pid
   WHERE st.ncross = 0 AND st.a_in_b = 0 AND st.b_in_a = 0
)
SELECT DISTINCT pid AS pair_id, 'i' AS op, round(x, 9) AS vx, round(y, 9) AS vy FROM iverts
UNION
SELECT DISTINCT pid AS pair_id, 'u' AS op, round(x, 9) AS vx, round(y, 9) AS vy FROM uverts
"""


def q_boolean_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layer-algebra Update (ogrlayer.cpp:5148): A updated by B =
    difference(A, B) rings + B's geometry, reported as the ring vertex
    set (difference arcs: A-verts outside B, B-verts inside A,
    crossings — plus all of B)."""
    from .operators import boolean_geom

    pairs = _l_pairs(spark, sf_dir)
    rings = boolean_geom.update_rings(pairs)
    return boolean_geom.ring_vertex_set(
        rings.drop("op").withColumn("op", F.lit("up")), decimals=9
    )


def sql_boolean_update() -> str:
    return f"""
WITH {_l_pair_ctes().strip()},
dverts AS (
  SELECT p.pid, p.x, p.y FROM pipa p JOIN st ON st.pid = p.pid
   WHERE st.ncross > 0 AND p.inside = 0
  UNION ALL
  SELECT p.pid, p.x, p.y FROM pipb p JOIN st ON st.pid = p.pid
   WHERE st.ncross > 0 AND p.inside = 1
  UNION ALL
  SELECT c.pid, c.x, c.y FROM crossings c
  UNION ALL
  -- no crossings: B inside A -> diff = A with B-hole (all A verts;
  -- B verts arrive via the passthrough); disjoint -> all A verts;
  -- A inside B -> diff empty
  SELECT v.pid, v.x, v.y FROM va v JOIN st ON st.pid = v.pid
   WHERE st.ncross = 0 AND st.a_in_b = 0
  UNION ALL
  -- the method layer's own ring, always present
  SELECT v.pid, v.x, v.y FROM vb v
)
SELECT DISTINCT pid AS pair_id, 'up' AS op, round(x, 9) AS vx, round(y, 9) AS vy
FROM dverts
"""


def _rect_layer(spark: SparkSession, sf_dir: str, table: str, key: str,
                salt_x: int, salt_y: int, w: float, h: float, res: int) -> DataFrame:
    """Derived rectangle layer: one axis-aligned w x h rect per table
    key, corner from the cross-engine hash — SH-clippable by the
    polygon_intersection operator AND closed-form for the SQL oracle."""
    from .kernels import mercator

    t = _read(spark, sf_dir, table)
    i = F.col(key)
    x0 = F.lit(-170.0) + F.lit(330.0) * docs.hash01_col(i, salt_x)
    y0 = F.lit(-75.0) + F.lit(140.0) * docs.hash01_col(i, salt_y)
    base = t.select(
        i.alias("poly_id"), x0.alias("x0"), y0.alias("y0"),
        (x0 + w).alias("x1"), (y0 + h).alias("y1"),
    )
    ring_xs = F.array("x0", "x1", "x1", "x0", "x0")
    ring_ys = F.array("y0", "y0", "y1", "y1", "y0")
    geo = base.select(
        "poly_id",
        ring_xs.alias("xs"), ring_ys.alias("ys"),
        F.col("x0").alias("minx"), F.col("y0").alias("miny"),
        F.col("x1").alias("maxx"), F.col("y1").alias("maxy"),
    )
    # covering cells of the rect bbox at `res` (engine-side explode)
    lim = 2**res - 1
    tx0, ty0_tms = TF.tms_tile(F.col("minx"), F.col("miny"), res)
    tx1, ty1_tms = TF.tms_tile(F.col("maxx"), F.col("maxy"), res)
    cx0 = TF.clamp(tx0, 0, lim)
    cx1 = TF.clamp(tx1, 0, lim)
    cy_a = TF.clamp(TF.xyz_ty(ty0_tms, res), 0, lim)
    cy_b = TF.clamp(TF.xyz_ty(ty1_tms, res), 0, lim)
    cy0 = F.least(cy_a, cy_b)
    cy1 = F.greatest(cy_a, cy_b)
    # build the covering-cell list as a cross of two sequences
    out = (
        geo.withColumn("_cxs", F.sequence(cx0, cx1))
        .withColumn("_cys", F.sequence(cy0, cy1))
        .withColumn(
            "cell",
            F.explode(F.expr(
                f"flatten(transform(_cxs, x -> transform(_cys, y -> "
                f"{1 << (2 * res)} + x * {2 ** res} + y)))"
            )),
        )
        .drop("_cxs", "_cys")
    )
    return out


def q_layer_algebra_areas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layer algebra on polygon pairs (ogrlayer.cpp Intersection :3345,
    Union :3763, SymDifference :4300 — area semantics): two derived
    rectangle layers through the cell-join + Sutherland-Hodgman
    pipeline; per intersecting pair emit intersection/union/symdiff
    areas (union = aA + aB - aI, symdiff = aA + aB - 2*aI). Rectangle
    fixtures keep the oracle closed-form; the engine path is the
    general convex-polygon operator."""
    from .operators.spatial_join import polygon_intersection

    a = _rect_layer(spark, sf_dir, "supplier", "s_suppkey", 21, 22, 30.0, 20.0, res=4)
    b = _rect_layer(spark, sf_dir, "customer", "c_custkey", 23, 24, 25.0, 15.0, res=4)
    inter = polygon_intersection(a, b, res=4)
    # 4dp: the engine computes clip areas by the shoelace of the
    # clipped ring while the oracle uses the closed rectangle form —
    # algebraically equal, ~1e-12 apart in floats; 6dp flipped ~1 row
    # in 4e5 at sf0.1
    return inter.select(
        "id_a", "id_b",
        F.round("area", 4).alias("area_i"),
        F.round(F.lit(30.0 * 20.0) + F.lit(25.0 * 15.0) - F.col("area"), 4).alias("area_u"),
        F.round(F.lit(30.0 * 20.0) + F.lit(25.0 * 15.0) - 2 * F.col("area"), 4).alias("area_sd"),
    )


def sql_layer_algebra_areas() -> str:
    ax0 = f"CAST(-170 AS DOUBLE)+CAST(330 AS DOUBLE)*({derive.hash01_sql('s_suppkey', 21)})"
    ay0 = f"CAST(-75 AS DOUBLE)+CAST(140 AS DOUBLE)*({derive.hash01_sql('s_suppkey', 22)})"
    bx0 = f"CAST(-170 AS DOUBLE)+CAST(330 AS DOUBLE)*({derive.hash01_sql('c_custkey', 23)})"
    by0 = f"CAST(-75 AS DOUBLE)+CAST(140 AS DOUBLE)*({derive.hash01_sql('c_custkey', 24)})"
    return f"""
WITH a AS (SELECT s_suppkey AS id_a, {ax0} AS x0, {ay0} AS y0 FROM supplier),
b AS (SELECT c_custkey AS id_b, {bx0} AS x0, {by0} AS y0 FROM customer),
p AS (
  SELECT id_a, id_b,
         greatest(a.x0, b.x0) AS ix0, least(a.x0 + 30.0, b.x0 + 25.0) AS ix1,
         greatest(a.y0, b.y0) AS iy0, least(a.y0 + 20.0, b.y0 + 15.0) AS iy1
  FROM a CROSS JOIN b
),
i AS (
  SELECT id_a, id_b, (ix1 - ix0) * (iy1 - iy0) AS area
  FROM p WHERE ix1 > ix0 AND iy1 > iy0
)
SELECT id_a, id_b, round(area, 4) AS area_i,
       round(600.0 + 375.0 - area, 4) AS area_u,
       round(600.0 + 375.0 - 2 * area, 4) AS area_sd
FROM i
"""


def _l_layer(spark: SparkSession, sf_dir: str, table: str, key: str,
             salt_x: int, salt_y: int) -> DataFrame:
    """Derived NON-CONVEX (L-shaped) polygon layer: corner from the
    cross-engine hash; bottom bar 20x5 + left bar 6x10 (area 160)."""
    t = _read(spark, sf_dir, table)
    i = F.col(key)
    x0 = F.lit(-170.0) + F.lit(320.0) * docs.hash01_col(i, salt_x)
    y0 = F.lit(-75.0) + F.lit(130.0) * docs.hash01_col(i, salt_y)
    return t.select(
        i.alias("poly_id"),
        F.array(x0, x0 + 20, x0 + 20, x0 + 6, x0 + 6, x0, x0).alias("xs"),
        F.array(y0, y0, y0 + 5, y0 + 5, y0 + 15, y0 + 15, y0).alias("ys"),
    )


def q_boolean_areas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General (non-convex) layer-algebra boolean areas: two L-shaped
    layers through ear-clipping triangulation + per-triangle-pair
    convex clipping (the Union/SymDifference/Intersection area
    semantics of ogrlayer.cpp:3345-4300 for simple polygons)."""
    from .operators.spatial_join import boolean_areas_general

    a = _l_layer(spark, sf_dir, "supplier", "s_suppkey", 31, 32)
    b = _l_layer(spark, sf_dir, "customer", "c_custkey", 33, 34)
    out = boolean_areas_general(a, b, res=4)
    # 4dp: triangle-soup area sums vs the oracle's rectangle algebra
    # differ at the ~1e-12 level (and the engine's per-pair float sum
    # order is plan-dependent); 6dp flipped ~1 row in 3e5 at sf0.1
    return out.select(
        "id_a", "id_b",
        F.round("area_i", 4).alias("area_i"),
        F.round("area_u", 4).alias("area_u"),
        F.round("area_sd", 4).alias("area_sd"),
    )


def sql_boolean_areas() -> str:
    ax0 = f"CAST(-170 AS DOUBLE)+CAST(320 AS DOUBLE)*({derive.hash01_sql('s_suppkey', 31)})"
    ay0 = f"CAST(-75 AS DOUBLE)+CAST(130 AS DOUBLE)*({derive.hash01_sql('s_suppkey', 32)})"
    bx0 = f"CAST(-170 AS DOUBLE)+CAST(320 AS DOUBLE)*({derive.hash01_sql('c_custkey', 33)})"
    by0 = f"CAST(-75 AS DOUBLE)+CAST(130 AS DOUBLE)*({derive.hash01_sql('c_custkey', 34)})"
    # each L = two disjoint rects: bottom [x0,x0+20]x[y0,y0+5],
    # left [x0,x0+6]x[y0+5,y0+15]; aI = sum of the 4 rect-pair overlaps
    return f"""
WITH a AS (SELECT s_suppkey AS id_a, {ax0} AS x0, {ay0} AS y0 FROM supplier),
b AS (SELECT c_custkey AS id_b, {bx0} AS x0, {by0} AS y0 FROM customer),
ar AS (
  SELECT id_a, x0 AS rx0, y0 AS ry0, x0 + 20.0 AS rx1, y0 + 5.0 AS ry1 FROM a
  UNION ALL
  SELECT id_a, x0, y0 + 5.0, x0 + 6.0, y0 + 15.0 FROM a
),
br AS (
  SELECT id_b, x0 AS rx0, y0 AS ry0, x0 + 20.0 AS rx1, y0 + 5.0 AS ry1 FROM b
  UNION ALL
  SELECT id_b, x0, y0 + 5.0, x0 + 6.0, y0 + 15.0 FROM b
),
pair AS (
  SELECT id_a, id_b,
         greatest(ar.rx0, br.rx0) AS ix0, least(ar.rx1, br.rx1) AS ix1,
         greatest(ar.ry0, br.ry0) AS iy0, least(ar.ry1, br.ry1) AS iy1
  FROM ar CROSS JOIN br
),
inter AS (
  SELECT id_a, id_b,
         sum(CASE WHEN ix1 > ix0 AND iy1 > iy0
                  THEN (ix1 - ix0) * (iy1 - iy0) ELSE 0.0 END) AS ai
  FROM pair GROUP BY 1, 2
)
SELECT id_a, id_b, round(ai, 4) AS area_i,
       round(160.0 + 160.0 - ai, 4) AS area_u,
       round(160.0 + 160.0 - 2 * ai, 4) AS area_sd
FROM inter WHERE ai > 0.0
"""


def q_span_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-rule per-row invariant as a gate query: interleaved
    docs (spans synthesized from orders keys) flow through the
    cell-bucketed spatial join, and the output carries an
    order-sensitive md5 fingerprint of each doc's span sequence
    (kind, text, media_ref, offset). The oracle rebuilds the SAME
    fingerprint independently in SQL — any span reorder, drop, or
    mutation inside the engine breaks the hash (the ogr_gensql
    native-data preservation contract, ogr_gensql.cpp:1536-1538)."""
    o = _read(spark, sf_dir, "orders")
    i = F.col("o_orderkey")
    d = o.select(
        i.alias("id"),
        docs.spans_col(i).alias("spans"),
        docs.lon_col(i).alias("lon"),
        docs.lat_col(i).alias("lat"),
    )
    cov = polygons.countries64_cover(spark, res=6)
    joined = spatial_join_points_in_polygons(
        d, cov, res=6, strategy="broadcast",
        keep_point_cols=["id", "spans"],
    )
    fp = F.md5(
        F.concat_ws(
            "\x1f",
            F.transform(
                F.col("spans"),
                lambda s: F.concat_ws(
                    "\x1e", s["kind"], s["text"], s["media_ref"],
                    s["offset"].cast("string"),
                ),
            ),
        )
    )
    return joined.select("id", "poly_id", fp.alias("span_fp"))


def sql_span_invariant() -> str:
    inner = derive.pip_join_sql(_pts_cte(), id_col="id", x_col="x", y_col="y")
    # rebuild the span sequence independently: nspans = id%5+1 spans,
    # kind cycles (id+j)%3 over {text,image,audio}, text='t-id-j',
    # media='m://id/j' unless kind='text', offset=j — ordered by j
    return f"""
WITH hits AS ({inner}),
spans AS (
  SELECT h.id, h.poly_id, j.range AS j,
         CASE (h.id + j.range) % 3 WHEN 0 THEN 'text' WHEN 1 THEN 'image' ELSE 'audio' END AS kind
  FROM hits h CROSS JOIN range(5) j WHERE j.range <= h.id % 5
),
parts AS (
  SELECT id, poly_id, j,
         kind || chr(30) || ('t-' || CAST(id AS VARCHAR) || '-' || CAST(j AS VARCHAR))
              || chr(30) || (CASE WHEN kind = 'text' THEN ''
                             ELSE 'm://' || CAST(id AS VARCHAR) || '/' || CAST(j AS VARCHAR) END)
              || chr(30) || CAST(j AS VARCHAR) AS piece
  FROM spans
),
fp AS (
  SELECT id, poly_id, md5(string_agg(piece, chr(31) ORDER BY j)) AS span_fp
  FROM parts GROUP BY id, poly_id
)
SELECT id, poly_id, span_fp FROM fp
"""


def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN(k=5) of supplier-derived queries vs orders-derived points by
    iterative cell-ring expansion (gdalgrid.cpp:896-909 semantics)."""
    pts = _points(spark, sf_dir).withColumnRenamed("id", "point_id")
    qs = _qpoints(spark, sf_dir).withColumnRenamed("qid", "query_id")
    out = knn.knn_join(pts, qs, k=5, res=5, point_id="point_id", query_id="query_id")
    return out.select("query_id", "point_id", F.col("rank").alias("rnk"))


def sql_knn() -> str:
    return f"""
WITH pts0 AS ({_pts_cte()}), qs0 AS ({_qpts_cte()}),
pts AS (SELECT id, {derive.mercator_mx_sql('x')} AS mx, {derive.mercator_my_sql('y')} AS my FROM pts0),
qs AS (SELECT qid, {derive.mercator_mx_sql('x')} AS mx, {derive.mercator_my_sql('y')} AS my FROM qs0),
d AS (
  SELECT qs.qid, pts.id,
         (pts.mx - qs.mx) * (pts.mx - qs.mx)
         + (pts.my - qs.my) * (pts.my - qs.my) AS d2
  FROM qs CROSS JOIN pts
),
r AS (SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY d2 ASC, id ASC) AS rnk FROM d)
SELECT qid AS query_id, id AS point_id, rnk FROM r WHERE rnk <= 5
"""


def q_reproject_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4326 -> 3857 -> 4326 round trip; counts of sub-1e-9-degree error
    (warp round-trip pattern, test_gdalwarp_lib.py:31-113)."""
    from .operators import reproject

    rt = reproject.roundtrip_error(_points(spark, sf_dir))
    return rt.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("err") < 1e-9, 1).otherwise(0)).cast("bigint").alias("n_ok"),
    )


def sql_reproject_roundtrip() -> str:
    mx = derive.mercator_mx_sql("x")
    my = derive.mercator_my_sql("y")
    return f"""
WITH pts AS ({_pts_cte()}),
m AS (SELECT id, x, y, {mx} AS mx, {my} AS my FROM pts),
b AS (SELECT id, x, y, (mx)/{OS}*CAST(180 AS DOUBLE) AS lon2,
       CAST(180 AS DOUBLE)/pi()*(CAST(2 AS DOUBLE)*atan(exp((my)/{OS}*pi())) - pi()/CAST(2 AS DOUBLE)) AS lat2
      FROM m),
e AS (SELECT greatest(abs(lon2 - x), abs(lat2 - y)) AS err FROM b)
SELECT count(*) AS n, CAST(sum(CASE WHEN err < 1e-9 THEN 1 ELSE 0 END) AS BIGINT) AS n_ok FROM e
"""


SALT_ULON, SALT_ULAT = 11, 12


def _utm_pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-31 point layer anchored on customer keys: lon in [0.5, 5.5),
    lat in [-75, 80) — inside UTM zone 31's validity box."""
    c = _read(spark, sf_dir, "customer")
    i = F.col("c_custkey")
    return c.select(
        i.alias("id"),
        (F.lit(0.5) + F.lit(5.0) * docs.hash01_col(i, SALT_ULON)).alias("lon"),
        (F.lit(-75.0) + F.lit(155.0) * docs.hash01_col(i, SALT_ULAT)).alias("lat"),
    )


def _utm_pts_cte() -> str:
    lon = f"0.5 + 5.0 * ({derive.hash01_sql('c_custkey', SALT_ULON)})"
    lat = f"-75.0 + 155.0 * ({derive.hash01_sql('c_custkey', SALT_ULAT)})"
    return f"SELECT c_custkey AS id, {lon} AS lon, {lat} AS lat FROM customer"


def q_reproject_utm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4326 -> EPSG:32631 -> 4326: the reference's own ogr2ogr benchmark
    CRS pair (autotest/benchmark/test_ogr2ogr.py:61-66), run through the
    closed-form Krüger-series batch UDFs (ogrct.cpp:2254 array
    Transform). Outputs mm-rounded projected coords + nano-degree-
    rounded round-trip coords; the oracle replays the identical series
    in SQL (coefficients are shared float literals)."""
    from .operators import reproject

    pts = _utm_pts(spark, sf_dir)
    fwd = reproject.utm_forward_cols(pts, zone=31)
    rt = reproject.utm_inverse_cols(fwd, zone=31)
    return rt.select(
        "id",
        F.round("easting", 3).alias("easting_mm"),
        F.round("northing", 3).alias("northing_mm"),
        F.round("lon_inv", 9).alias("lon_rt"),
        F.round("lat_inv", 9).alias("lat_rt"),
    )


def sql_reproject_utm() -> str:
    from .kernels import tmerc

    fwd = tmerc.forward_sql_ctes("pts", 31).strip()
    inv = tmerc.inverse_sql_ctes("fe", 31).strip()
    return f"""
WITH pts AS ({_utm_pts_cte()}),
{fwd},
fe AS (SELECT id, easting, northing FROM utm_fwd),
{inv}
SELECT f.id, round(f.easting, 3) AS easting_mm, round(f.northing, 3) AS northing_mm,
       round(i.lon, 9) AS lon_rt, round(i.lat, 9) AS lat_rt
FROM fe f JOIN utm_inv i USING (id)
"""


SALT_OLON, SALT_OLAT = 13, 14


def _osgb_pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point layer over Britain (EPSG:27700 validity box), anchored on
    customer keys."""
    c = _read(spark, sf_dir, "customer")
    i = F.col("c_custkey")
    return c.select(
        i.alias("id"),
        (F.lit(-5.5) + F.lit(7.0) * docs.hash01_col(i, SALT_OLON)).alias("lon"),
        (F.lit(50.2) + F.lit(7.8) * docs.hash01_col(i, SALT_OLAT)).alias("lat"),
    )


def _osgb_pts_cte() -> str:
    lon = f"-5.5 + 7.0 * ({derive.hash01_sql('c_custkey', SALT_OLON)})"
    lat = f"50.2 + 7.8 * ({derive.hash01_sql('c_custkey', SALT_OLAT)})"
    return f"SELECT c_custkey AS id, {lon} AS lon, {lat} AS lat FROM customer"


def q_reproject_osgb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4326 -> EPSG:27700 -> 4326: the datum-SHIFTED path (Airy 1830
    National Grid through the exact-inverse 7-param Helmert,
    kernels.datum) — the first closed-form TOWGS84 chain (VERDICT r3
    item 4; reference semantics ogr/ogrct.cpp:2254 via PROJ's TOWGS84
    pipeline). mm-rounded grid coords + nano-degree round-trip; the
    oracle replays the identical chain in SQL from shared coefficient
    literals (incl. the constant inverse Helmert matrix)."""
    from .operators import reproject

    pts = _osgb_pts(spark, sf_dir)
    fwd = reproject.osgb_forward_cols(pts)
    rt = reproject.osgb_inverse_cols(fwd)
    return rt.select(
        "id",
        F.round("easting", 3).alias("easting_mm"),
        F.round("northing", 3).alias("northing_mm"),
        F.round("lon_inv", 9).alias("lon_rt"),
        F.round("lat_inv", 9).alias("lat_rt"),
    )


def sql_reproject_osgb() -> str:
    from .kernels import datum as DT

    fwd = DT.osgb_forward_sql_ctes("pts").strip()
    inv = DT.osgb_inverse_sql_ctes("fe").strip()
    return f"""
WITH pts AS ({_osgb_pts_cte()}),
{fwd},
fe AS (SELECT id, easting, northing FROM osgb_fwd),
{inv}
SELECT f.id, round(f.easting, 3) AS easting_mm, round(f.northing, 3) AS northing_mm,
       round(i.lon, 9) AS lon_rt, round(i.lat, 9) AS lat_rt
FROM fe f JOIN osgb_inv i USING (id)
"""


def q_overview_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster overview build: z3 int band -> z2 by 2x2 average
    (gcore/overview.cpp semantics; exact integer sum / 4)."""
    band = raster.synth_band(spark, zoom=3, tile_px=16)
    return raster.overview_reduce(band, alg="average")


def sql_overview_avg() -> str:
    salt = raster.SALT_BAND
    val = (
        f"((((r.range % {M31}) * {A} + {salt}) % {M31}) * {A} + {salt * 7 + 13}) % {M31}"
    )
    return f"""
WITH px AS (SELECT r.range % 128 AS gx, r.range // 128 AS gy, {val} AS value FROM range(16384) r)
SELECT gx // 2 AS gx, gy // 2 AS gy,
       CAST(sum(value) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS value
FROM px GROUP BY 1, 2
"""


def q_overview_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-statistic resampling kernels (GRA_Mode/Med/Q1/Q3/RMS,
    alg/gdalwarper.h:37-67) in one overview pass: mode (ties ->
    smallest, a pinned total order), median, nearest-rank quartiles,
    RMS — all from the sorted 2x2 child list, pure JVM."""
    band = raster.synth_band(spark, zoom=3, tile_px=16)  # 128x128
    outs = None
    for alg in ("mode", "med", "q1", "q3", "rms"):
        o = raster.overview_reduce(band, alg=alg).withColumnRenamed("value", alg)
        outs = o if outs is None else outs.join(o, ["gx", "gy"])
    # rms is ~2^31-scale; 3dp rounding sits far above the double ulp
    # at that magnitude (6dp would be ulp-unstable)
    return outs.select(
        "gx", "gy", "mode", "med", "q1", "q3", F.round("rms", 3).alias("rms")
    )


def sql_overview_stats() -> str:
    W = 128
    kids = ", ".join(
        _band_val_sql(f"(2 * gy + {dy}) * {W} + 2 * gx + {dx}")
        for dy in (0, 1) for dx in (0, 1)
    )
    return f"""
WITH pp AS (SELECT r.range % {W // 2} AS gx, r.range // {W // 2} AS gy FROM range({(W // 2) ** 2}) r),
v AS (SELECT gx, gy, list_sort([{kids}]) AS vs FROM pp),
m AS (
  SELECT gx, gy, vs,
         (list_sort(list_transform(list_distinct(vs), d ->
            {{'negcnt': -len(list_filter(vs, x -> x = d)), 'v': d}})))[1].v AS mode_v
  FROM v
)
SELECT gx, gy,
       CAST(mode_v AS DOUBLE) AS mode,
       CAST(vs[2] + vs[3] AS DOUBLE) / 2.0 AS med,
       CAST(vs[1] AS DOUBLE) AS q1,
       CAST(vs[3] AS DOUBLE) AS q3,
       round(sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(vs, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                 (a, b) -> a + b) / 4.0), 3) AS rms
FROM m
"""


def q_rasterize_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector->raster burn, BOTH merge algorithms
    (gdalrasterize.cpp:800-817): pixel-center PIP then per-pixel
    MERGE_ALG=ADD (sum of poly_id+1) and MERGE_ALG=REPLACE (max burn —
    the deterministic last-wins, features iterating in id order)."""
    grid = raster.pixel_grid(spark, zoom=2, tile_px=16)
    cov = polygons.countries64_cover(spark, res=4)
    add = raster.rasterize_polygons(grid, cov, res=4, merge_alg="add") \
        .select("gx", "gy", F.col("burn").cast("bigint").alias("burn"))
    rep = raster.rasterize_polygons(grid, cov, res=4, merge_alg="replace") \
        .select("gx", "gy", F.col("burn").cast("bigint").alias("burn_replace"))
    return add.join(rep, ["gx", "gy"])


def sql_rasterize_add() -> str:
    w = 64
    pix = 2.0 * float(OS) / w
    grid_cte = f"""
SELECT r.range AS id,
  ((CAST(r.range % {w} AS DOUBLE) + 0.5) * {pix!r} - {OS}) / {OS} * CAST(180 AS DOUBLE) AS x,
  CAST(180 AS DOUBLE)/pi() * (CAST(2 AS DOUBLE)*atan(exp(({OS} - (CAST(r.range // {w} AS DOUBLE) + 0.5) * {pix!r}) / {OS} * pi())) - pi()/CAST(2 AS DOUBLE)) AS y
FROM range({w * w}) r
"""
    inner = derive.pip_join_sql(grid_cte, id_col="id", x_col="x", y_col="y")
    return f"""
SELECT id % {w} AS gx, id // {w} AS gy,
       CAST(sum(poly_id + 1) AS BIGINT) AS burn,
       CAST(max(poly_id) AS BIGINT) AS burn_replace
FROM ({inner}) GROUP BY 1, 2
"""


# pixel-space rasterize fixture: strictly off-grid coordinates (no
# vertex / crossing on a cell boundary), the generic position the
# reference resolves with 1e-9 nudges (llrasterize.cpp:690-705)
_RAST_POLYS = [
    (0, [3.3, 20.7, 9.4], [2.2, 5.1, 17.8]),
    (1, [30.2, 45.9, 44.1, 28.8], [30.6, 32.4, 46.7, 44.3]),
    (2, [5.6, 58.3, 6.1], [50.2, 54.9, 52.8]),
]
_RAST_W = 64


def _rast_polys_cte() -> str:
    rows = ", ".join(
        f"({pid}, {xs}, {ys})".replace("'", "")
        for pid, xs, ys in _RAST_POLYS
    )
    return f"SELECT * FROM (VALUES {rows}) AS t(poly_id, xs, ys)"


def q_rasterize_all_touched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdal_rasterize ALL_TOUCHED=TRUE: boundary cell walk union
    interior fill over the literal pixel-space fixture."""
    polys = raster.pixel_polys(spark, _RAST_POLYS)
    return raster.rasterize_all_touched(polys, width=_RAST_W, height=_RAST_W) \
        .select(F.col("gx").cast("bigint"), F.col("gy").cast("bigint"), "poly_id")


def sql_rasterize_all_touched() -> str:
    W = _RAST_W
    return f"""
WITH polys AS ({_rast_polys_cte()}),
edges AS (
  SELECT poly_id, xs[i] AS x0, ys[i] AS y0,
         xs[(i % len(xs)) + 1] AS x1, ys[(i % len(ys)) + 1] AS y1
  FROM polys, unnest(generate_series(1, len(xs))) AS u(i)
),
cols AS (
  SELECT *, u.i AS i,
         greatest(CAST(i AS DOUBLE), least(x0, x1)) AS xlo,
         least(CAST(i AS DOUBLE) + 1.0, greatest(x0, x1)) AS xhi
  FROM edges, unnest(generate_series(CAST(floor(least(x0, x1)) AS INT),
                                     CAST(floor(greatest(x0, x1)) AS INT))) AS u(i)
  WHERE u.i >= 0 AND u.i < {W}
),
ys AS (
  SELECT poly_id, i,
    CASE WHEN abs(x1 - x0) < 1e-12 THEN least(y0, y1)
         ELSE y0 + (xlo - x0) / (x1 - x0) * (y1 - y0) END AS ya,
    CASE WHEN abs(x1 - x0) < 1e-12 THEN greatest(y0, y1)
         ELSE y0 + (xhi - x0) / (x1 - x0) * (y1 - y0) END AS yb
  FROM cols
),
touched AS (
  SELECT CAST(i AS BIGINT) AS gx, CAST(u.j AS BIGINT) AS gy, poly_id
  FROM ys, unnest(generate_series(CAST(floor(least(ya, yb)) AS INT),
                                  CAST(floor(greatest(ya, yb)) AS INT))) AS u(j)
  WHERE u.j >= 0 AND u.j < {W}
),
grid AS (SELECT r.range % {W} AS gx, r.range // {W} AS gy FROM range({W * W}) r),
inner_fill AS (
  SELECT g.gx, g.gy, e.poly_id
  FROM grid g CROSS JOIN edges e
  WHERE ((e.y0 > CAST(g.gy AS DOUBLE) + 0.5) != (e.y1 > CAST(g.gy AS DOUBLE) + 0.5))
    AND (CAST(g.gx AS DOUBLE) + 0.5) <
        e.x0 + ((CAST(g.gy AS DOUBLE) + 0.5) - e.y0) / (e.y1 - e.y0) * (e.x1 - e.x0)
  GROUP BY 1, 2, 3 HAVING count(*) % 2 = 1
)
SELECT DISTINCT gx, gy, poly_id FROM (
  SELECT * FROM touched UNION ALL SELECT CAST(gx AS BIGINT), CAST(gy AS BIGINT), poly_id FROM inner_fill
)
"""


def q_rasterize_inverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdal_rasterize -i: burn into every pixel NOT covered by any
    fixture polygon."""
    polys = raster.pixel_polys(spark, _RAST_POLYS)
    return raster.rasterize_inverse(polys, width=_RAST_W, height=_RAST_W) \
        .select(F.col("gx").cast("bigint"), F.col("gy").cast("bigint"), "burn")


def sql_rasterize_inverse() -> str:
    W = _RAST_W
    return f"""
WITH polys AS ({_rast_polys_cte()}),
edges AS (
  SELECT poly_id, xs[i] AS x0, ys[i] AS y0,
         xs[(i % len(xs)) + 1] AS x1, ys[(i % len(ys)) + 1] AS y1
  FROM polys, unnest(generate_series(1, len(xs))) AS u(i)
),
grid AS (SELECT r.range % {W} AS gx, r.range // {W} AS gy FROM range({W * W}) r),
inner_fill AS (
  SELECT g.gx, g.gy, e.poly_id
  FROM grid g CROSS JOIN edges e
  WHERE ((e.y0 > CAST(g.gy AS DOUBLE) + 0.5) != (e.y1 > CAST(g.gy AS DOUBLE) + 0.5))
    AND (CAST(g.gx AS DOUBLE) + 0.5) <
        e.x0 + ((CAST(g.gy AS DOUBLE) + 0.5) - e.y0) / (e.y1 - e.y0) * (e.x1 - e.x0)
  GROUP BY 1, 2, 3 HAVING count(*) % 2 = 1
)
SELECT CAST(g.gx AS BIGINT) AS gx, CAST(g.gy AS BIGINT) AS gy,
       CAST(255 AS BIGINT) AS burn
FROM grid g ANTI JOIN (SELECT DISTINCT gx, gy FROM inner_fill) f
  ON g.gx = f.gx AND g.gy = f.gy
"""


_RASTERIZE_PARTS = [
    ("merge", [], ["gx", "gy", "burn", "burn_replace"]),
    ("all_touched", [], ["gx", "gy", "poly_id"]),
    ("inverse", [], ["gx", "gy", "burn"]),
]


def q_rasterize_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rasterize surface in one gate row: ADD+REPLACE merge algebra
    (geo-space cell-join path), ALL_TOUCHED boundary walk, and -i
    inverse burn (pixel-space literal fixture)."""
    subs = {"merge": q_rasterize_add, "all_touched": q_rasterize_all_touched,
            "inverse": q_rasterize_inverse}
    return _suite(
        [(t, subs[t](spark, sf_dir), sc, nc) for t, sc, nc in _RASTERIZE_PARTS],
        n_str=0, n_num=4,
    )


def sql_rasterize_suite() -> str:
    subs = {"merge": sql_rasterize_add,
            "all_touched": sql_rasterize_all_touched,
            "inverse": sql_rasterize_inverse}
    return _suite_sql(
        [(t, subs[t](), sc, nc) for t, sc, nc in _RASTERIZE_PARTS],
        n_str=0, n_num=4,
    )


_POLYGONIZE_PARTS = [
    ("conn4", [], ["label", "value", "n_pixels"]),
    ("conn8", [], ["label", "value", "n_pixels"]),
]


def q_polygonize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster->vector: distributed CCL with cross-tile stitch
    (alg/polygonize.cpp:73-87); checkerboard fixture has an analytic
    component oracle. conn4: each 20x20 block is its own component.
    conn8 (8CONNECTED=8, polygonize.cpp:482): same-value blocks touch
    at corners, so the whole board collapses to one component per
    value; tile=16 puts block corner (80,80) on a tile line so the
    cross-tile DIAGONAL stitch is exercised, not just the local pass."""
    px = raster.synth_raster(spark, width=96, height=96, block=20, n_values=2)
    c4 = raster.polygonize_ccl(px, width=96, tile=32)
    c8 = raster.polygonize_ccl(px, width=96, tile=16, connect=8)
    return _suite(
        [("conn4", c4, [], ["label", "value", "n_pixels"]),
         ("conn8", c8, [], ["label", "value", "n_pixels"])],
        n_str=0, n_num=3,
    )


def sql_polygonize() -> str:
    base = """
WITH px AS (SELECT r.range % 96 AS gx, r.range // 96 AS gy FROM range(9216) r)
SELECT min(gy * 96 + gx) AS label,
       ((gx // 20) + (gy // 20)) % 2 AS value,
       count(*) AS n_pixels
FROM px GROUP BY {groups}
"""
    # conn8: diagonal corner contacts chain every same-value block into
    # one component per checkerboard colour
    c4 = base.format(groups="gx // 20, gy // 20, ((gx // 20) + (gy // 20)) % 2")
    c8 = base.format(groups="((gx // 20) + (gy // 20)) % 2")
    return _suite_sql(
        [("conn4", c4, [], ["label", "value", "n_pixels"]),
         ("conn8", c8, [], ["label", "value", "n_pixels"])],
        n_str=0, n_num=3,
    )


def _band_val_sql(pid_expr: str) -> str:
    """Closed-form int band value (raster.synth_band LCG twin)."""
    salt = raster.SALT_BAND
    return (
        f"(((({pid_expr}) % {M31}) * {A} + {salt}) % {M31} * {A} + {salt * 7 + 13}) % {M31}"
    )


def q_focal_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horn 3x3 slope via the tile-array model (gdaldem slope
    semantics, apps/gdalalg_raster_slope.cpp): ONE halo shuffle +
    per-tile numpy stencil (operators.tile_raster), not 8 self-joins;
    rounded to 6dp (atan is the one non-IEEE-pinned op)."""
    from .operators import tile_raster

    band = raster.synth_band(spark, zoom=2, tile_px=8)  # 32x32
    tiles = tile_raster.tiles_from_pixels(band, tile=8)
    out = tile_raster.slope_tiles(tiles, tile=8, nty=4, ntx=4,
                                  cellsize=1.0, z_factor=1.0)
    px = tile_raster.pixels_from_tiles(out, tile=8, col="slope_deg",
                                       out="slope_deg")
    return px.select("gx", "gy", F.round("slope_deg", 6).alias("slope_deg"))


def sql_focal_slope() -> str:
    W = 32

    def v(dx: int, dy: int) -> str:
        if dx == 0 and dy == 0:
            return _band_val_sql(f"gy * {W} + gx")
        inside = (
            f"gx + ({dx}) >= 0 AND gx + ({dx}) <= {W - 1} "
            f"AND gy + ({dy}) >= 0 AND gy + ({dy}) <= {W - 1}"
        )
        return (
            f"CASE WHEN {inside} THEN {_band_val_sql(f'(gy + ({dy})) * {W} + gx + ({dx})')} "
            f"ELSE {_band_val_sql(f'gy * {W} + gx')} END"
        )

    dzdx = (
        f"((({v(1,-1)}) + 2 * ({v(1,0)}) + ({v(1,1)})) "
        f"- (({v(-1,-1)}) + 2 * ({v(-1,0)}) + ({v(-1,1)}))) / 8.0"
    )
    dzdy = (
        f"((({v(-1,1)}) + 2 * ({v(0,1)}) + ({v(1,1)})) "
        f"- (({v(-1,-1)}) + 2 * ({v(0,-1)}) + ({v(1,-1)}))) / 8.0"
    )
    return f"""
WITH px AS (SELECT r.range % {W} AS gx, r.range // {W} AS gy FROM range({W * W}) r)
SELECT gx, gy,
       round(atan(1.0 * sqrt(({dzdx}) * ({dzdx}) + ({dzdy}) * ({dzdy}))) * (180.0 / pi()), 6) AS slope_deg
FROM px
"""


def q_sample_bilinear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample the raster at fractional points by bilinear interpolation
    (gcore/gdal_interpolateatpoint.cpp) — Raptor-style point-x-raster
    join; exact (no trig in the chain)."""
    from .operators import focal

    band = raster.synth_band(spark, zoom=2, tile_px=8)  # 32x32
    s = _read(spark, sf_dir, "supplier")
    i = F.col("s_suppkey")
    pts = s.select(
        i.alias("sid"),
        (docs.hash01_col(i, 7) * 32.0).alias("px"),
        (docs.hash01_col(i, 8) * 32.0).alias("py"),
    )
    return focal.sample_bilinear(band, pts, width=32, height=32, id_col="sid")


def sql_sample_bilinear() -> str:
    W = 32
    px = f"({derive.hash01_sql('s_suppkey', 7)}) * 32.0"
    py = f"({derive.hash01_sql('s_suppkey', 8)}) * 32.0"
    corner = lambda cx, cy: _band_val_sql(f"(_y0 + {cy}) * {W} + _x0 + {cx}")
    return f"""
WITH p0 AS (
  SELECT s_suppkey AS sid,
         least(greatest({px}, 0.5), {W - 0.5}) - 0.5 AS _fx,
         least(greatest({py}, 0.5), {W - 0.5}) - 0.5 AS _fy
  FROM supplier
),
p1 AS (
  SELECT sid, _fx, _fy,
         least(CAST(floor(_fx) AS BIGINT), {W - 2}) AS _x0,
         least(CAST(floor(_fy) AS BIGINT), {W - 2}) AS _y0
  FROM p0
),
p AS (
  SELECT sid, _x0, _y0, _fx - _x0 AS _wx, _fy - _y0 AS _wy FROM p1
)
SELECT sid,
       ({corner(0,0)}) * (1 - _wx) * (1 - _wy)
     + ({corner(1,0)}) * _wx * (1 - _wy)
     + ({corner(0,1)}) * (1 - _wx) * _wy
     + ({corner(1,1)}) * _wx * _wy AS value
FROM p
"""


def q_idw_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdal_grid IDW (alg/gdalgrid.cpp:91-199): scattered part-derived
    points -> grid nodes, circular radius, deterministic ordered fold."""
    from .operators import focal

    p = _read(spark, sf_dir, "part")
    i = F.col("p_partkey")
    pts = p.select(
        i.alias("pid"),
        (docs.hash01_col(i, 11) * 100.0).alias("x"),
        (docs.hash01_col(i, 12) * 100.0).alias("y"),
        ((i * 37 + 11) % 1000).alias("v"),
    )
    return focal.idw_grid(pts, cell=10.0, power=2, radius=15.0)


def sql_idw_grid() -> str:
    x = f"({derive.hash01_sql('p_partkey', 11)}) * 100.0"
    y = f"({derive.hash01_sql('p_partkey', 12)}) * 100.0"
    return f"""
WITH pts AS (
  SELECT p_partkey AS pid, {x} AS _x, {y} AS _y,
         (p_partkey * 37 + 11) % 1000 AS _v
  FROM part
),
offs AS (SELECT a.range - 2 AS di, b.range - 2 AS dj FROM range(5) a CROSS JOIN range(5) b),
cand0 AS (
  SELECT pid, _x, _y, _v,
         CAST(floor(_x / 10.0) AS BIGINT) + di AS i,
         CAST(floor(_y / 10.0) AS BIGINT) + dj AS j
  FROM pts CROSS JOIN offs
),
cand AS (
  SELECT pid, _v, i, j,
         (i * 10.0 - _x) * (i * 10.0 - _x) + (j * 10.0 - _y) * (j * 10.0 - _y) AS _d2
  FROM cand0
),
filt AS (SELECT * FROM cand WHERE _d2 <= 225.0),
agg AS (
  SELECT i, j,
         list_reduce(list_prepend(CAST(0 AS DOUBLE), list(_v / _d2 ORDER BY pid)), (a, b) -> a + b) AS num,
         list_reduce(list_prepend(CAST(0 AS DOUBLE), list(1.0 / _d2 ORDER BY pid)), (a, b) -> a + b) AS den,
         arg_min(CASE WHEN _d2 < 1e-13 THEN _v END, pid) FILTER (_d2 < 1e-13) AS exactv
  FROM filt GROUP BY 1, 2
)
SELECT i, j, CASE WHEN exactv IS NOT NULL THEN CAST(exactv AS DOUBLE) ELSE num / den END AS value
FROM agg
"""


_IDW_FULL = dict(r1=18.0, r2=10.0, angle=30.0, smoothing=1.5,
                 min_points=2, max_points=4)


def q_idw_grid_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdal_grid invdist FULL parameter surface (alg/gdalgrid.cpp:91-199
    + the NearestNeighbor flavor's nearest-max_points selection):
    rotated search ellipse (radius1/radius2/angle), smoothing term
    folded into d^2, min_points nodata gate, nearest-4 trim ordered by
    (distance, point id)."""
    from .operators import focal

    p = _read(spark, sf_dir, "part")
    i = F.col("p_partkey")
    pts = p.select(
        i.alias("pid"),
        (docs.hash01_col(i, 11) * 100.0).alias("x"),
        (docs.hash01_col(i, 12) * 100.0).alias("y"),
        ((i * 37 + 11) % 1000).alias("v"),
    )
    c = _IDW_FULL
    return focal.idw_grid(
        pts, cell=10.0, power=2, radius1=c["r1"], radius2=c["r2"],
        angle=c["angle"], smoothing=c["smoothing"],
        min_points=c["min_points"], max_points=c["max_points"])


def sql_idw_grid_full() -> str:
    import math as _m

    c = _IDW_FULL
    ca = repr(_m.cos(_m.radians(c["angle"])))
    sa = repr(_m.sin(_m.radians(c["angle"])))
    r1sq, r2sq = repr(c["r1"] * c["r1"]), repr(c["r2"] * c["r2"])
    s2 = repr(c["smoothing"] * c["smoothing"])
    reach = int(max(c["r1"], c["r2"]) / 10.0) + 1
    n_off = 2 * reach + 1
    x = f"({derive.hash01_sql('p_partkey', 11)}) * 100.0"
    y = f"({derive.hash01_sql('p_partkey', 12)}) * 100.0"
    return f"""
WITH pts AS (
  SELECT p_partkey AS pid, {x} AS _x, {y} AS _y,
         (p_partkey * 37 + 11) % 1000 AS _v
  FROM part
),
offs AS (SELECT a.range - {reach} AS di, b.range - {reach} AS dj
         FROM range({n_off}) a CROSS JOIN range({n_off}) b),
cand AS (
  SELECT pid, _v,
         CAST(floor(_x / 10.0) AS BIGINT) + di AS i,
         CAST(floor(_y / 10.0) AS BIGINT) + dj AS j,
         (CAST(floor(_x / 10.0) AS BIGINT) + di) * 10.0 - _x AS _dx,
         (CAST(floor(_y / 10.0) AS BIGINT) + dj) * 10.0 - _y AS _dy
  FROM pts CROSS JOIN offs
),
dist AS (
  SELECT pid, _v, i, j, _dx * _dx + _dy * _dy AS _d2,
         _dx * {ca} + _dy * {sa} AS _rx,
         -_dx * {sa} + _dy * {ca} AS _ry
  FROM cand
),
filt AS (
  SELECT * FROM dist
  WHERE (_rx * _rx) / {r1sq} + (_ry * _ry) / {r2sq} <= 1.0
),
agg AS (
  SELECT i, j,
         list_slice(list({{'d2': _d2, 'pid': pid, 'v': _v}}
                         ORDER BY _d2, pid), 1, {c["max_points"]}) AS pts,
         count(*) AS n
  FROM filt GROUP BY 1, 2 HAVING count(*) >= {c["min_points"]}
)
SELECT i, j,
       list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(pts, s -> s.v / (s.d2 + {s2}))), (a, b) -> a + b)
       / list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(pts, s -> 1.0 / (s.d2 + {s2}))), (a, b) -> a + b)
       AS value
FROM agg
"""


def q_grid_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdal_grid data metrics (alg/gdalgrid.h:50-88): min/max/range/
    count/average-distance + nearest per node, circular radius, same
    scattered fixture as idw_grid."""
    from .operators import focal

    p = _read(spark, sf_dir, "part")
    i = F.col("p_partkey")
    pts = p.select(
        i.alias("pid"),
        (docs.hash01_col(i, 11) * 100.0).alias("x"),
        (docs.hash01_col(i, 12) * 100.0).alias("y"),
        ((i * 37 + 11) % 1000).alias("v"),
    )
    return focal.grid_metrics(pts, cell=10.0, radius=15.0)


def sql_grid_metrics() -> str:
    x = f"({derive.hash01_sql('p_partkey', 11)}) * 100.0"
    y = f"({derive.hash01_sql('p_partkey', 12)}) * 100.0"
    return f"""
WITH pts AS (
  SELECT p_partkey AS pid, {x} AS _x, {y} AS _y,
         (p_partkey * 37 + 11) % 1000 AS _v
  FROM part
),
offs AS (SELECT a.range - 2 AS di, b.range - 2 AS dj FROM range(5) a CROSS JOIN range(5) b),
cand0 AS (
  SELECT pid, _x, _y, _v,
         CAST(floor(_x / 10.0) AS BIGINT) + di AS i,
         CAST(floor(_y / 10.0) AS BIGINT) + dj AS j
  FROM pts CROSS JOIN offs
),
cand AS (
  SELECT pid, _v, i, j,
         (i * 10.0 - _x) * (i * 10.0 - _x) + (j * 10.0 - _y) * (j * 10.0 - _y) AS _d2
  FROM cand0
),
filt AS (SELECT * FROM cand WHERE _d2 <= 225.0)
SELECT i, j, count(*) AS cnt, min(_v) AS vmin, max(_v) AS vmax,
       max(_v) - min(_v) AS vrange,
       list_reduce(list_prepend(CAST(0 AS DOUBLE), list(sqrt(_d2) ORDER BY pid)),
                   (a, b) -> a + b) / count(*) AS avg_dist,
       (list(_v ORDER BY _d2, pid))[1] AS nearest_v
FROM filt GROUP BY 1, 2
"""


def q_footprint_rings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Footprint ring-OUTLINE geometry (gdal_footprint emits polygons,
    apps/gdal_footprint_lib.cpp): traced pixel-edge boundary rings per
    valid component. The checkerboard fixture's components are
    axis-aligned blocks, so every ring is an analytically-known
    rectangle; non-rectangular shapes (L, donut holes, degree-2
    vertices) are pinned in tests/test_footprint_rings.py."""
    from .operators import focal

    px = raster.synth_raster(spark, width=96, height=96, block=24, n_values=2)
    rings = focal.footprint_rings(px, width=96, valid=1, tile=32)
    return rings.select(
        "label", "ring_idx", "nv", "area",
        F.array_min("xs").alias("minx"), F.array_min("ys").alias("miny"),
        F.array_max("xs").alias("maxx"), F.array_max("ys").alias("maxy"),
    )


def sql_footprint_rings() -> str:
    # blocks are 24x24 on a 96x96 raster (exact tiling); valid blocks
    # have (bx + by) % 2 == 1; label = min pixel id = top-left pid
    return """
WITH b AS (
  SELECT a.range AS bx, c.range AS by_
  FROM range(4) a CROSS JOIN range(4) c
  WHERE (a.range + c.range) % 2 = 1
)
SELECT (by_ * 24) * 96 + bx * 24 AS label,
       0 AS ring_idx, 4 AS nv, CAST(576 AS DOUBLE) AS area,
       CAST(bx * 24 AS DOUBLE) AS minx, CAST(by_ * 24 AS DOUBLE) AS miny,
       CAST(bx * 24 + 24 AS DOUBLE) AS maxx, CAST(by_ * 24 + 24 AS DOUBLE) AS maxy
FROM b
"""


def q_grid_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdal_grid linear (Delaunay) interpolation (GGA_Linear,
    alg/delaunay.c): scattered plane-valued points (4 pinned domain
    corners so every node is inside the hull + hash-scattered
    interior points) -> 11x11 grid. Linear interpolation reproduces
    the plane EXACTLY regardless of which Delaunay triangulation is
    built, so the oracle is the closed-form plane — an oracle that is
    agnostic to triangulation internals yet fails if coverage,
    continuity or barycentric math break. Non-planar behavior is
    pinned in tests/test_grid_linear.py."""
    from .operators import focal
    from .sources.derive import hash01_np

    import numpy as np

    n_sc = 60
    ids = np.arange(n_sc)
    sx = hash01_np(ids, 41) * 100.0
    sy = hash01_np(ids, 42) * 100.0
    pts = [(-10.0, -10.0), (110.0, -10.0), (110.0, 110.0), (-10.0, 110.0)]
    pts += list(zip(sx.tolist(), sy.tolist()))
    xyv = [(x, y, 3.5 * x - 1.25 * y + 20.0) for x, y in pts]
    nodes = spark.range(121).select(
        (F.col("id") % 11).alias("i"),
        (F.col("id") / 11).cast("bigint").alias("j"),
    ).withColumn("x", F.col("i") * 10.0).withColumn("y", F.col("j") * 10.0)
    out = focal.grid_linear(spark, xyv, nodes)
    return out.select("i", "j", F.round("value", 6).alias("value"))


def sql_grid_linear() -> str:
    return """
WITH n AS (SELECT r.range % 11 AS i, r.range // 11 AS j FROM range(121) r)
SELECT i, j, round(3.5 * (i * 10.0) - 1.25 * (j * 10.0) + 20.0, 6) AS value FROM n
"""


def q_polygon_buffer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONVEX polygon buffer (GEOS BufferOp semantics, 8 quadrant
    segments): offset edges + round corner arcs. Rect fixture -> the
    corner angles are exact multiples of pi/2 in both engines, so the
    only cross-engine wobble is cos/sin ulp, absorbed at 9dp."""
    from .operators import vector_pipeline as VP

    s = _read(spark, sf_dir, "supplier")
    i = F.col("s_suppkey")
    x0 = F.lit(-160.0) + F.lit(300.0) * docs.hash01_col(i, 61)
    y0 = F.lit(-70.0) + F.lit(120.0) * docs.hash01_col(i, 62)
    w = F.lit(6.0) + F.lit(4.0) * docs.hash01_col(i, 63)
    h = F.lit(5.0) + F.lit(3.0) * docs.hash01_col(i, 64)
    d = s.select(
        i.alias("id"),
        F.array(x0, x0 + w, x0 + w, x0).alias("xs"),
        F.array(y0, y0, y0 + h, y0 + h).alias("ys"),
        (F.lit(1.0) + docs.hash01_col(i, 65)).alias("bd"),
    )
    buf = VP.buffer_convex(d, "bd", quadrant_segments=8)
    return buf.select(
        "id", F.posexplode(F.arrays_zip("xs", "ys")).alias("k", "_p")
    ).select(
        "id", "k",
        F.round(F.col("_p.xs"), 9).alias("vx"),
        F.round(F.col("_p.ys"), 9).alias("vy"),
    )


def sql_polygon_buffer() -> str:
    hs = lambda s: derive.hash01_sql("s_suppkey", s)
    # corner c (0=BL,1=BR,2=TR,3=TL): center + arc from -pi + c*pi/2
    cxs = ("CASE c WHEN 0 THEN x0 WHEN 1 THEN x0 + w WHEN 2 THEN x0 + w ELSE x0 END")
    cys = ("CASE c WHEN 0 THEN y0 WHEN 1 THEN y0 WHEN 2 THEN y0 + h ELSE y0 + h END")
    th = "(-pi() + c * (pi() / 2)) + ((pi() / 2) * j) / 8"
    return f"""
WITH k AS (
  SELECT s_suppkey AS id,
         -160.0 + 300.0 * ({hs(61)}) AS x0,
         -70.0 + 120.0 * ({hs(62)}) AS y0,
         6.0 + 4.0 * ({hs(63)}) AS w,
         5.0 + 3.0 * ({hs(64)}) AS h,
         1.0 + ({hs(65)}) AS bd
  FROM supplier
),
e AS (
  SELECT id, x0, y0, w, h, bd,
         CAST(cc.range AS BIGINT) AS c, CAST(jj.range AS BIGINT) AS j
  FROM k CROSS JOIN range(4) cc CROSS JOIN range(9) jj
)
SELECT id, c * 9 + j AS k,
       round(({cxs}) + bd * cos({th}), 9) AS vx,
       round(({cys}) + bd * sin({th}), 9) AS vy
FROM e
"""


def q_compound_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CompoundCurve assembly (line + arc + line chained, junction
    vertices emitted once — OGRCompoundCurve::CurveToLine at the
    4-degree default step). Arc endpoints are derived from the SAME
    center/radius/angle formulas on both sides, so junctions match
    exactly; exploded vertices rounded 9dp (trig ulp)."""
    from .functions import arcs as AR

    s = _read(spark, sf_dir, "supplier")
    i = F.col("s_suppkey")
    cx = F.lit(-100.0) + F.lit(200.0) * docs.hash01_col(i, 51)
    cy = F.lit(-60.0) + F.lit(120.0) * docs.hash01_col(i, 52)
    r = F.lit(1.0) + F.lit(4.0) * docs.hash01_col(i, 53)
    a0 = F.lit(6.283185307179586) * docs.hash01_col(i, 54)
    a1 = a0 + F.lit(0.5) + F.lit(2.0) * docs.hash01_col(i, 55)
    p1x, p1y = cx + r * F.cos(a0), cy + r * F.sin(a0)
    p2x, p2y = cx + r * F.cos(a1), cy + r * F.sin(a1)
    part_l1 = F.struct(
        F.lit("L").alias("kind"),
        F.array(p1x - F.lit(3.0), p1x).alias("xs"),
        F.array(p1y - F.lit(2.0), p1y).alias("ys"),
        F.lit(0.0).alias("cx"), F.lit(0.0).alias("cy"), F.lit(0.0).alias("r"),
        F.lit(0.0).alias("a0"), F.lit(0.0).alias("a1"),
    )
    part_a = F.struct(
        F.lit("A").alias("kind"),
        F.array().cast("array<double>").alias("xs"),
        F.array().cast("array<double>").alias("ys"),
        cx.alias("cx"), cy.alias("cy"), r.alias("r"),
        a0.alias("a0"), a1.alias("a1"),
    )
    part_l2 = F.struct(
        F.lit("L").alias("kind"),
        F.array(p2x, p2x + F.lit(2.5)).alias("xs"),
        F.array(p2y, p2y + F.lit(1.5)).alias("ys"),
        F.lit(0.0).alias("cx"), F.lit(0.0).alias("cy"), F.lit(0.0).alias("r"),
        F.lit(0.0).alias("a0"), F.lit(0.0).alias("a1"),
    )
    d = s.select(i.alias("id"), F.array(part_l1, part_a, part_l2).alias("parts"))
    out = AR.assemble_compound_cols(d)
    return out.select(
        "id", F.posexplode(F.arrays_zip("xs", "ys")).alias("k", "_p")
    ).select(
        "id", "k",
        F.round(F.col("_p.xs"), 9).alias("vx"),
        F.round(F.col("_p.ys"), 9).alias("vy"),
    )


def sql_compound_curve() -> str:
    import math as _m

    step = repr(_m.radians(4.0))
    h = lambda s: derive.hash01_sql("s_suppkey", s)
    return f"""
WITH k AS (
  SELECT s_suppkey AS id,
         -100.0 + 200.0 * ({h(51)}) AS cx,
         -60.0 + 120.0 * ({h(52)}) AS cy,
         1.0 + 4.0 * ({h(53)}) AS r,
         6.283185307179586 * ({h(54)}) AS a0,
         2.0 * ({h(55)}) AS sw
  FROM supplier
),
k2 AS (SELECT *, (a0 + 0.5) + sw AS a1 FROM k),
g AS (
  SELECT id, cx, cy, r, a0, a1,
         cx + r * cos(a0) AS p1x, cy + r * sin(a0) AS p1y,
         cx + r * cos(a1) AS p2x, cy + r * sin(a1) AS p2y,
         greatest(CAST(ceil(abs(a1 - a0) / {step}) AS INT), 1) AS n
  FROM k2
),
v AS (
  SELECT id,
         list_concat(
           [p1x - 3.0, p1x],
           list_concat(
             list_transform(range(1, n + 1), kk ->
               cx + r * cos(a0 + (a1 - a0) * CAST(kk AS DOUBLE) / CAST(n AS DOUBLE))),
             [p2x + 2.5])) AS xs,
         list_concat(
           [p1y - 2.0, p1y],
           list_concat(
             list_transform(range(1, n + 1), kk ->
               cy + r * sin(a0 + (a1 - a0) * CAST(kk AS DOUBLE) / CAST(n AS DOUBLE))),
             [p2y + 1.5])) AS ys
  FROM g
)
SELECT id, CAST(generate_subscripts(xs, 1) - 1 AS BIGINT) AS k,
       round(unnest(xs), 9) AS vx, round(unnest(ys), 9) AS vy
FROM v
"""


def q_vector_buffer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point buffer step (OGRGeometry::Buffer, 32-gon GEOS-default
    approximation) — exploded ring vertices, 9dp."""
    from .operators import vector_pipeline as VP

    s = _read(spark, sf_dir, "supplier")
    i = F.col("s_suppkey")
    pts = s.select(
        i.alias("id"),
        (F.lit(-170.0) + F.lit(320.0) * docs.hash01_col(i, 31)).alias("lon"),
        (F.lit(-75.0) + F.lit(140.0) * docs.hash01_col(i, 32)).alias("lat"),
        (F.lit(1.0) + F.lit(2.0) * docs.hash01_col(i, 33)).alias("bd"),
    )
    buf = VP.buffer_points(pts, F.col("bd"), n_seg=16)
    return buf.select(
        "id", F.posexplode(F.arrays_zip("xs", "ys")).alias("k", "_p")
    ).select(
        "id", "k",
        F.round(F.col("_p.xs"), 9).alias("vx"),
        F.round(F.col("_p.ys"), 9).alias("vy"),
    )


def sql_vector_buffer() -> str:
    lon = f"-170.0 + 320.0 * ({derive.hash01_sql('s_suppkey', 31)})"
    lat = f"-75.0 + 140.0 * ({derive.hash01_sql('s_suppkey', 32)})"
    bd = f"1.0 + 2.0 * ({derive.hash01_sql('s_suppkey', 33)})"
    two_pi = repr(6.283185307179586)
    return f"""
WITH pts AS (SELECT s_suppkey AS id, {lon} AS lon, {lat} AS lat, {bd} AS bd FROM supplier)
SELECT id, CAST(k.range AS BIGINT) AS k,
       round(lon + bd * cos({two_pi} * CAST(k.range AS DOUBLE) / 16.0), 9) AS vx,
       round(lat + bd * sin({two_pi} * CAST(k.range AS DOUBLE) / 16.0), 9) AS vy
FROM pts CROSS JOIN range(16) k
"""


def q_explode_make_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode-collections + make-valid pipeline steps: 3-part multi
    geometry per key (valid CCW ring, CW ring needing orientation fix,
    degenerate 2-point sliver that must be dropped). Output: per
    surviving part, vertex count + SIGNED shoelace area (positive
    after repair proves the CCW fix)."""
    from .operators import vector_pipeline as VP

    s = _read(spark, sf_dir, "supplier")
    i = F.col("s_suppkey")
    # materialize the LCG-derived scalars in their OWN projection: each
    # is referenced ~22x by the vertex arrays below, and inlining the
    # full hash chain per use blew the Generate stage past janino's
    # 64 KB codegen limit (CollapseProject keeps the stage split
    # because the aliases are non-cheap and multiply referenced)
    s = s.select(
        i.alias("s_suppkey"),
        (F.lit(-100.0) + F.lit(200.0) * docs.hash01_col(i, 34)).alias("_cx"),
        (F.lit(-60.0) + F.lit(120.0) * docs.hash01_col(i, 35)).alias("_cy"),
        (F.lit(1.0) + F.lit(3.0) * docs.hash01_col(i, 36)).alias("_r"),
    )
    cx, cy, r = F.col("_cx"), F.col("_cy"), F.col("_r")
    # part0: CCW diamond; part1: CW square (reversed order); part2:
    # degenerate [p, q, p]
    p0 = F.struct(
        F.array(cx + r, cx, cx - r, cx).alias("xs"),
        F.array(cy, cy + r, cy, cy - r).alias("ys"),
    )
    p1 = F.struct(
        F.array(cx - r, cx - r, cx + r, cx + r).alias("xs"),
        F.array(cy - r, cy + r, cy + r, cy - r).alias("ys"),
    )
    p2 = F.struct(
        F.array(cx, cx + r, cx).alias("xs"),
        F.array(cy, cy, cy).alias("ys"),
    )
    multi = s.select(i.alias("id"), F.array(p0, p1, p2).alias("parts"))
    ex = VP.explode_parts(multi)
    mv = VP.make_valid(ex)
    signed = F.expr(
        "aggregate(sequence(1, size(xs)), 0D, (a, i) -> a + "
        "element_at(xs, i) * element_at(ys, 1 + i % size(xs)) - "
        "element_at(xs, 1 + i % size(xs)) * element_at(ys, i)) / 2"
    )
    return mv.select(
        "id", "part_idx", F.size("xs").alias("nv"),
        F.round(signed, 9).alias("signed_area"),
    )


def sql_explode_make_valid() -> str:
    cx = f"-100.0 + 200.0 * ({derive.hash01_sql('s_suppkey', 34)})"
    cy = f"-60.0 + 120.0 * ({derive.hash01_sql('s_suppkey', 35)})"
    r = f"1.0 + 3.0 * ({derive.hash01_sql('s_suppkey', 36)})"
    # part0 already CCW: area = 2 r^2 (diamond, shoelace of the exact
    # vertex doubles); part1 CW square reversed -> CCW: area = 4 r^2;
    # part2 dropped. Signed areas computed from the same vertex doubles
    # with the same fold.
    return f"""
WITH k AS (SELECT s_suppkey AS id, {cx} AS cx, {cy} AS cy, {r} AS r FROM supplier),
parts AS (
  SELECT id, 0 AS part_idx,
         [cx + r, cx, cx - r, cx] AS xs, [cy, cy + r, cy, cy - r] AS ys
  FROM k
  UNION ALL
  SELECT id, 1,
         list_reverse([cx - r, cx - r, cx + r, cx + r]),
         list_reverse([cy - r, cy + r, cy + r, cy - r])
  FROM k
),
ar AS (
  SELECT id, part_idx, len(xs) AS nv,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(range(1, len(xs) + 1), i ->
             xs[i] * ys[1 + i % len(xs)] - xs[1 + i % len(xs)] * ys[i])),
           (a, b) -> a + b) / 2 AS s2
  FROM parts
)
SELECT id, part_idx, nv, round(s2, 9) AS signed_area FROM ar
"""


def q_simplify_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """segmentize -> Douglas-Peucker simplify chain
    (OGRGeometry::segmentize + SimplifyPreserveTopology's DP core):
    a 5-vertex tent line whose climb points deviate sub-tolerance from
    the climb chords — segmentize densifies every edge with exactly
    collinear vertices (distance ~1e-16), DP at tol 0.5 then keeps
    precisely [start, apex, end]. The kept set is closed-form, so the
    oracle emits it directly; the engine runs the real chain."""
    from .operators import vector_pipeline as VP

    s = _read(spark, sf_dir, "supplier")
    i = F.col("s_suppkey")
    x0 = F.lit(-160.0) + F.lit(300.0) * docs.hash01_col(i, 111)
    y0 = F.lit(-70.0) + F.lit(120.0) * docs.hash01_col(i, 112)
    hh = F.lit(2.0) + F.lit(2.0) * docs.hash01_col(i, 113)
    e1 = F.lit(0.05) + F.lit(0.1) * docs.hash01_col(i, 114)
    e2 = F.lit(-0.05) - F.lit(0.1) * docs.hash01_col(i, 115)
    half = hh * F.lit(0.5)
    d = s.select(
        i.alias("id"),
        F.array(x0, x0 + 1.0, x0 + 2.0, x0 + 3.0, x0 + 4.0).alias("xs"),
        F.array(y0, y0 + half + e1, y0 + hh, y0 + half + e2, y0).alias("ys"),
    )
    out = VP.simplify(VP.segmentize(d, max_length=0.7), tolerance=0.5)
    return out.select(
        "id", F.posexplode(F.arrays_zip("xs", "ys")).alias("k", "_p")
    ).select(
        "id", "k",
        F.round(F.col("_p.xs"), 9).alias("vx"),
        F.round(F.col("_p.ys"), 9).alias("vy"),
    )


def sql_simplify_chain() -> str:
    hx = lambda s: derive.hash01_sql("s_suppkey", s)
    return f"""
WITH k AS (
  SELECT s_suppkey AS id,
         -160.0 + 300.0 * ({hx(111)}) AS x0,
         -70.0 + 120.0 * ({hx(112)}) AS y0,
         2.0 + 2.0 * ({hx(113)}) AS hh
  FROM supplier
)
SELECT id, CAST(j.range AS BIGINT) AS k,
       round(CASE j.range WHEN 0 THEN x0 WHEN 1 THEN x0 + 2.0 ELSE x0 + 4.0 END, 9) AS vx,
       round(CASE j.range WHEN 0 THEN y0 WHEN 1 THEN y0 + hh ELSE y0 END, 9) AS vy
FROM k CROSS JOIN range(3) j
"""


def q_simplify_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """simplify-coverage pipeline step
    (apps/gdalalg_vector_simplify_coverage.cpp:30, GEOS >= 3.12
    CoverageSimplifier contract): per supplier key, a 2-rectangle
    coverage whose shared vertical boundary carries 3 sub-tolerance
    zigzag vertices (exact reversed chain on the neighbor) and whose
    exterior edges carry sub-tolerance midpoints. At tol 0.5 every
    zigzag/midpoint collapses and each rectangle simplifies to its 4
    corners with the shared boundary IDENTICAL on both sides — the
    kept set is closed-form, so the oracle emits it directly; the
    engine runs the real edge-signature + canonical-direction-DP
    pipeline. Output rotated to start at the lexicographic-min vertex."""
    from .operators import vector_pipeline as VP

    s = _read(spark, sf_dir, "supplier")
    i = F.col("s_suppkey")
    x0 = F.lit(-170.0) + F.lit(300.0) * docs.hash01_col(i, 311)
    y0 = F.lit(-60.0) + F.lit(100.0) * docs.hash01_col(i, 312)
    a1 = F.lit(0.05) + F.lit(0.2) * docs.hash01_col(i, 313)
    a2 = F.lit(0.05) + F.lit(0.2) * docs.hash01_col(i, 314)
    x1 = x0 + F.lit(2.0)
    x2 = x0 + F.lit(4.0)
    y2 = y0 + F.lit(2.0)
    left = s.select(
        (i * 2).alias("poly_id"),
        F.array(x0, x0 + 1.0, x1, x1 + a1, x1 - a2, x1 + a1,
                x1, x0 + 1.0, x0, x0 + a2).alias("xs"),
        F.array(y0, y0 - a2, y0, y0 + 0.5, y0 + 1.0, y0 + 1.5,
                y2, y2 + a1, y2, y0 + 1.0).alias("ys"),
    )
    right = s.select(
        (i * 2 + 1).alias("poly_id"),
        F.array(x1, x1 + 1.0, x2, x2 - a2, x2, x1 + 1.0,
                x1, x1 + a1, x1 - a2, x1 + a1).alias("xs"),
        F.array(y0, y0 - a1, y0, y0 + 1.0, y2, y2 + a2,
                y2, y0 + 1.5, y0 + 1.0, y0 + 0.5).alias("ys"),
    )
    cov = left.unionByName(right)
    out = VP.simplify_coverage(cov, tolerance=0.5)
    # canonical rotation: start the ring at its lexicographic-min vertex
    out = out.withColumn(
        "_z", F.expr("arrays_zip(xs, ys)")
    ).withColumn(
        "_mi", F.expr("array_position(_z, array_min(_z))")
    ).withColumn(
        "_r", F.expr(
            "concat(slice(_z, _mi, size(_z) - _mi + 1), slice(_z, 1, _mi - 1))")
    )
    return out.select(
        F.col("poly_id").alias("id"),
        F.posexplode("_r").alias("k", "_p"),
    ).select(
        "id", "k",
        F.round(F.col("_p.xs"), 9).alias("vx"),
        F.round(F.col("_p.ys"), 9).alias("vy"),
    )


def sql_simplify_coverage() -> str:
    hx = lambda salt: derive.hash01_sql("s_suppkey", salt)
    base = (f"SELECT s_suppkey AS sk, "
            f"-170.0 + 300.0 * ({hx(311)}) AS x0, "
            f"-60.0 + 100.0 * ({hx(312)}) AS y0 FROM supplier")
    # expected: left rect corners CCW from (x0, y0); right rect corners
    # CCW from (x1, y0) — both already lexicographic-min rotated
    return f"""
WITH b AS ({base}),
sides AS (SELECT sk, x0, y0, s.range AS side FROM b CROSS JOIN range(2) s),
v AS (SELECT sk, side, x0, y0, CAST(k.range AS BIGINT) AS k
      FROM sides CROSS JOIN range(4) k),
-- near/far corner x: single additions only (x0, x0 + 2.0, x0 + 4.0)
-- so the doubles are bit-identical to the engine's x1/x2 columns
c AS (SELECT sk, side, k, y0,
             CASE WHEN side = 0 THEN x0 ELSE x0 + 2.0 END AS nx,
             CASE WHEN side = 0 THEN x0 + 2.0 ELSE x0 + 4.0 END AS fx
      FROM v)
SELECT sk * 2 + side AS id, k,
       round(CASE k WHEN 0 THEN nx WHEN 1 THEN fx
                    WHEN 2 THEN fx ELSE nx END, 9) AS vx,
       round(CASE k WHEN 0 THEN y0 WHEN 1 THEN y0
                    WHEN 2 THEN y0 + 2.0 ELSE y0 + 2.0 END, 9) AS vy
FROM c
"""


def q_wrapdateline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ogr2ogr -wrapdateline (ogr/ogrgeometryfactory.cpp
    SplitLineStringAtDateline): 5-vertex walks that cross the
    antimeridian east- or westward (ids % 5 == 0 stay far away and
    must pass through unsplit). The engine splits via one window +
    conditional explode (no Python); the oracle replays the identical
    lag/interpolation arithmetic."""
    from .operators import vector_pipeline as VP

    s = _read(spark, sf_dir, "supplier")
    i = F.col("s_suppkey")
    far = (i % 5) == 0
    dirn = F.when(i % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))
    s = s.select(
        i.alias("id"),
        F.when(far, F.lit(-60.0) + F.lit(10.0) * docs.hash01_col(i, 211))
         .otherwise(dirn * (F.lit(150.0) + F.lit(25.0) * docs.hash01_col(i, 211)))
         .alias("x0"),
        F.when(far, F.lit(1.0) + F.lit(2.0) * docs.hash01_col(i, 212))
         .otherwise(dirn * (F.lit(12.0) + F.lit(10.0) * docs.hash01_col(i, 212)))
         .alias("step"),
        (F.lit(-50.0) + F.lit(100.0) * docs.hash01_col(i, 213)).alias("y0"),
        (F.lit(4.0) * docs.hash01_col(i, 214) - F.lit(2.0)).alias("dy"),
    )
    verts = s.select(
        "id", F.explode(F.sequence(F.lit(0), F.lit(4))).alias("k"),
        "x0", "step", "y0", "dy",
    ).select(
        "id", F.col("k").cast("bigint").alias("k"),
        (F.col("x0") + F.col("k") * F.col("step")).alias("_raw"),
        (F.col("y0") + F.col("k") * F.col("dy")).alias("y"),
    ).select(
        "id", "k", "y",
        F.when(F.col("_raw") > 180.0, F.col("_raw") - 360.0)
         .when(F.col("_raw") < -180.0, F.col("_raw") + 360.0)
         .otherwise(F.col("_raw")).alias("x"),
    )
    out = VP.wrapdateline_vertices(verts)
    return out.select("id", "part_idx", "k2",
                      F.round("x", 9).alias("vx"),
                      F.round("y", 9).alias("vy"))


def sql_wrapdateline() -> str:
    hx = lambda salt: derive.hash01_sql("s_suppkey", salt)
    return f"""
WITH base AS (
  SELECT s_suppkey AS id,
         CASE WHEN s_suppkey % 5 = 0 THEN -60.0 + 10.0 * ({hx(211)})
              ELSE (CASE WHEN s_suppkey % 2 = 0 THEN 1.0 ELSE -1.0 END)
                   * (150.0 + 25.0 * ({hx(211)})) END AS x0,
         CASE WHEN s_suppkey % 5 = 0 THEN 1.0 + 2.0 * ({hx(212)})
              ELSE (CASE WHEN s_suppkey % 2 = 0 THEN 1.0 ELSE -1.0 END)
                   * (12.0 + 10.0 * ({hx(212)})) END AS step,
         -50.0 + 100.0 * ({hx(213)}) AS y0,
         4.0 * ({hx(214)}) - 2.0 AS dy
  FROM supplier
),
verts AS (
  SELECT id, CAST(j.range AS BIGINT) AS k,
         x0 + j.range * step AS raw,
         y0 + j.range * dy AS y
  FROM base CROSS JOIN range(5) j
),
wrapped AS (
  SELECT id, k, y,
         CASE WHEN raw > 180.0 THEN raw - 360.0
              WHEN raw < -180.0 THEN raw + 360.0 ELSE raw END AS x
  FROM verts
),
lagd AS (
  SELECT id, k, x, y,
         lag(x) OVER (PARTITION BY id ORDER BY k) AS px,
         lag(y) OVER (PARTITION BY id ORDER BY k) AS py
  FROM wrapped
),
flags AS (
  SELECT *, (px IS NOT NULL AND abs(x - px) > 180.0) AS crossed FROM lagd
),
parts AS (
  SELECT *,
         sum(CASE WHEN crossed THEN 1 ELSE 0 END)
           OVER (PARTITION BY id ORDER BY k) AS part,
         CASE WHEN px > 0 THEN x + 360.0 ELSE x - 360.0 END AS xu,
         CASE WHEN px > 0 THEN 180.0 ELSE -180.0 END AS xe
  FROM flags
),
interp AS (
  SELECT *, py + ((xe - px) / (xu - px)) * (y - py) AS yb FROM parts
),
rows_out AS (
  SELECT id, part AS part_idx, k AS kk, 2 AS sub, x AS vx, y AS vy FROM interp
  UNION ALL
  SELECT id, part - 1, k, 0, xe, yb FROM interp WHERE crossed
  UNION ALL
  SELECT id, part, k, 1, -xe, yb FROM interp WHERE crossed
)
SELECT id, part_idx,
       row_number() OVER (PARTITION BY id, part_idx ORDER BY kk, sub) - 1 AS k2,
       round(vx, 9) AS vx, round(vy, 9) AS vy
FROM rows_out
"""


def q_raster_reclassify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster reclassify (gdal raster reclassify step): 3-class range
    remap as one codegen CASE chain."""
    band = raster.synth_band(spark, zoom=2, tile_px=8)
    t1, t2 = 715827882, 1431655764
    out = raster.reclassify(band, [(0, t1, 10), (t1 + 1, t2, 20)], default=30)
    return out.select("gx", "gy", "value")


def sql_raster_reclassify() -> str:
    t1, t2 = 715827882, 1431655764
    v = _band_val_sql("gy * 32 + gx")
    return f"""
WITH px AS (SELECT r.range % 32 AS gx, r.range // 32 AS gy FROM range(1024) r)
SELECT gx, gy,
       CAST(CASE WHEN ({v}) BETWEEN 0 AND {t1} THEN 10
                 WHEN ({v}) BETWEEN {t1 + 1} AND {t2} THEN 20
                 ELSE 30 END AS BIGINT) AS value
FROM px
"""


SALT_BAND2 = 401


def _band2(spark: SparkSession) -> DataFrame:
    """Second synthetic band (different salt), covering gx >= 16 only —
    the partial-overlap mosaic input."""
    M31A, AA = M31, A
    pid = F.col("id")
    h1 = (pid % M31A) * AA + F.lit(SALT_BAND2)
    val = ((h1 % M31A) * AA + F.lit(SALT_BAND2 * 7 + 13)) % M31A
    return (
        spark.range(32 * 32)
        .select((F.col("id") % 32).alias("gx"),
                (F.col("id") / 32).cast("bigint").alias("gy"),
                val.alias("value"))
        .filter(F.col("gx") >= 16)
    )


def _band2_val_sql(pid_expr: str) -> str:
    s = SALT_BAND2
    return (
        f"(((({pid_expr}) % {M31}) * {A} + {s}) % {M31} * {A} + {s * 7 + 13}) % {M31}"
    )


def q_raster_mosaic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster mosaic (gdalbuildvrt overlap semantics): base band +
    a partially-overlapping second band; 'last' (later source paints
    over) and 'mean' rules side by side."""
    a = raster.synth_band(spark, zoom=2, tile_px=8).select("gx", "gy", "value")
    b = _band2(spark)
    last = raster.mosaic([a, b], rule="last").withColumnRenamed("value", "v_last")
    mean = raster.mosaic([a, b], rule="mean").withColumnRenamed("value", "v_mean")
    return last.join(mean, ["gx", "gy"])


def sql_raster_mosaic() -> str:
    va = _band_val_sql("gy * 32 + gx")
    vb = _band2_val_sql("gy * 32 + gx")
    return f"""
WITH px AS (SELECT r.range % 32 AS gx, r.range // 32 AS gy FROM range(1024) r)
SELECT gx, gy,
       CAST(CASE WHEN gx >= 16 THEN ({vb}) ELSE ({va}) END AS DOUBLE) AS v_last,
       CASE WHEN gx >= 16
            THEN CAST(({va}) + ({vb}) AS DOUBLE) / 2
            ELSE CAST(({va}) AS DOUBLE) END AS v_mean
FROM px
"""


def q_raster_stack_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band stack + nearest resize + scale in one pipeline
    (gdal raster stack/resize/scale steps): two bands stacked to an
    array column, the 32x32 grid resized to 20x20 (rasterio nearest
    rule), values scaled v*0.5 + 10 (exact: power-of-two gain)."""
    a = raster.synth_band(spark, zoom=2, tile_px=8).select("gx", "gy", "value")
    b = _band2(spark)
    b_full = a.select("gx", "gy").join(b, ["gx", "gy"], "left") \
        .select("gx", "gy", F.coalesce("value", F.lit(0)).alias("value"))
    stacked = raster.stack_bands([a, b_full])
    flat = stacked.select(
        "gx", "gy", F.element_at("values", 1).alias("value"),
        F.element_at("values", 2).alias("v2"),
    )
    rs = raster.resize_nearest(flat.select("gx", "gy", "value"),
                               src_w=32, src_h=32, dst_w=20, dst_h=20)
    out = raster.scale_values(rs, gain=0.5, offset=10.0)
    return out.select("dx", "dy", "value")


def sql_raster_stack_resize() -> str:
    # dest -> src by the nearest rule with inc = 32/20 = 1.6
    sx = "CAST(floor(least(greatest((0.5 * 1.6 + 1e-10) + CAST(dx AS DOUBLE) * 1.6, 0.0), 31.0)) AS BIGINT)"
    sy = "CAST(floor(least(greatest((0.5 * 1.6 + 1e-10) + CAST(dy AS DOUBLE) * 1.6, 0.0), 31.0)) AS BIGINT)"
    va = _band_val_sql("sy * 32 + sx")
    return f"""
WITH d AS (SELECT r.range % 20 AS dx, r.range // 20 AS dy FROM range(400) r),
m AS (SELECT dx, dy, {sx} AS sx, {sy} AS sy FROM d)
SELECT dx, dy, CAST(({va}) AS DOUBLE) * 0.5 + 10.0 AS value FROM m
"""


def q_fill_nodata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-nodata (GDALFillNodata re-derived as a bounded-window
    inverse-distance fill): ~20% of the band punched to nodata, filled
    from valid pixels within chebyshev 2; ordered fold keeps the
    doubles engine-exact."""
    band = raster.synth_band(spark, zoom=2, tile_px=8)
    punched = band.withColumn(
        "value", F.when(F.col("value") % 5 == 0, F.lit(-1)).otherwise(F.col("value"))
    ).select("gx", "gy", "value")
    out = raster.fill_nodata(punched, nodata=-1, max_dist=2)
    return out.select("gx", "gy", F.round("value", 6).alias("value"))


def sql_fill_nodata() -> str:
    v = _band_val_sql("gy * 32 + gx")
    return f"""
WITH px0 AS (SELECT r.range % 32 AS gx, r.range // 32 AS gy, {v} AS v0 FROM range(1024) r),
px AS (SELECT gx, gy, CASE WHEN v0 % 5 = 0 THEN -1 ELSE v0 END AS value FROM px0),
valid AS (SELECT * FROM px WHERE value != -1),
holes AS (SELECT gx, gy FROM px WHERE value = -1),
offs AS (
  SELECT a.range - 2 AS dx, b.range - 2 AS dy
  FROM range(5) a CROSS JOIN range(5) b
  WHERE NOT (a.range = 2 AND b.range = 2)
),
served AS (
  SELECT v.gx + o.dx AS tgx, v.gy + o.dy AS tgy,
         v.gy AS sy, v.gx AS sx,
         o.dx * o.dx + o.dy * o.dy AS d2, v.value AS vv
  FROM valid v CROSS JOIN offs o
),
cand AS (
  SELECT h.gx, h.gy, s.sy, s.sx, s.d2, s.vv
  FROM holes h JOIN served s ON s.tgx = h.gx AND s.tgy = h.gy
),
filled AS (
  SELECT gx, gy,
    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(vv / CAST(d2 AS DOUBLE) ORDER BY sy, sx)), (a, b) -> a + b)
    / list_reduce(list_prepend(CAST(0 AS DOUBLE), list(1.0 / CAST(d2 AS DOUBLE) ORDER BY sy, sx)), (a, b) -> a + b)
    AS value
  FROM cand GROUP BY 1, 2
)
SELECT gx, gy, round(CAST(value AS DOUBLE), 6) AS value FROM valid
UNION ALL
SELECT gx, gy, round(value, 6) AS value FROM filled
"""


def q_events_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal binning of the events stream table (the time analog of
    the grid/binning aggregations, SURVEY §2.4): hourly buckets per
    event type with exact integer-cents sums."""
    e = _read(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("cnt"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint").alias("sum_cents"),
        )
    )


def sql_events_buckets() -> str:
    return """
SELECT date_trunc('hour', ts) AS bucket, event_type,
       count(*) AS cnt, min(value) AS vmin, max(value) AS vmax,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY 1, 2
"""


def q_terrain_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPI / TRI / roughness (gdaldem family) on the tile-array model:
    one halo shuffle, all three metrics from one padded-tile stencil —
    integer-exact (sums of 8 int64 / 8.0)."""
    from .operators import tile_raster

    band = raster.synth_band(spark, zoom=2, tile_px=8)  # 32x32
    tiles = tile_raster.tiles_from_pixels(band, tile=8)
    out = tile_raster.terrain_tiles(tiles, tile=8, nty=4, ntx=4)
    z = out.select(
        "ty", "tx",
        F.posexplode(F.arrays_zip("tpi", "tri", "roughness")).alias("_pos", "_m"),
    )
    return z.select(
        (F.col("tx") * 8 + F.col("_pos") % 8).alias("gx"),
        (F.col("ty") * 8 + (F.col("_pos") / 8).cast("bigint")).alias("gy"),
        F.col("_m.tpi").alias("tpi"),
        F.col("_m.tri").alias("tri"),
        F.col("_m.roughness").cast("bigint").alias("roughness"),
    )


def sql_terrain_metrics() -> str:
    W = 32

    def v(dx: int, dy: int) -> str:
        if dx == 0 and dy == 0:
            return _band_val_sql(f"gy * {W} + gx")
        inside = (
            f"gx + ({dx}) >= 0 AND gx + ({dx}) <= {W - 1} "
            f"AND gy + ({dy}) >= 0 AND gy + ({dy}) <= {W - 1}"
        )
        return (
            f"(CASE WHEN {inside} THEN {_band_val_sql(f'(gy + ({dy})) * {W} + gx + ({dx})')} "
            f"ELSE {_band_val_sql(f'gy * {W} + gx')} END)"
        )

    from .operators.focal import OFFSETS_3X3

    nbrs = [(dx, dy) for dx, dy in OFFSETS_3X3 if (dx, dy) != (0, 0)]
    # match the Spark fold order exactly: sequential left-to-right adds
    s = " + ".join(v(dx, dy) for dx, dy in nbrs)
    absdev = " + ".join(f"abs(({v(0,0)}) - ({v(dx,dy)}))" for dx, dy in nbrs)
    allv = [v(0, 0), *[v(dx, dy) for dx, dy in nbrs]]
    return f"""
WITH px AS (SELECT r.range % {W} AS gx, r.range // {W} AS gy FROM range({W * W}) r)
SELECT gx, gy,
       ({v(0,0)}) - ({s}) / 8.0 AS tpi,
       ({absdev}) / 8.0 AS tri,
       CAST(greatest({', '.join(allv)}) - least({', '.join(allv)}) AS BIGINT) AS roughness
FROM px
"""


def q_terrain_aspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdaldem aspect (azimuth form, flat -> -9999) on the tile-array
    model — the remaining gdaldem verb (alg/gdaldem_lib.cpp
    GDALAspectAlg); rounded 6dp (atan2 ulp)."""
    from .operators import tile_raster

    band = raster.synth_band(spark, zoom=2, tile_px=8)
    tiles = tile_raster.tiles_from_pixels(band, tile=8)
    out = tile_raster.aspect_tiles(tiles, tile=8, nty=4, ntx=4)
    px = tile_raster.pixels_from_tiles(out, tile=8, col="aspect_deg",
                                       out="aspect_deg")
    return px.select("gx", "gy", F.round("aspect_deg", 6).alias("aspect_deg"))


def sql_terrain_aspect() -> str:
    W = 32

    def v(dx: int, dy: int) -> str:
        if dx == 0 and dy == 0:
            return _band_val_sql(f"gy * {W} + gx")
        inside = (
            f"gx + ({dx}) >= 0 AND gx + ({dx}) <= {W - 1} "
            f"AND gy + ({dy}) >= 0 AND gy + ({dy}) <= {W - 1}"
        )
        return (
            f"(CASE WHEN {inside} THEN {_band_val_sql(f'(gy + ({dy})) * {W} + gx + ({dx})')} "
            f"ELSE {_band_val_sql(f'gy * {W} + gx')} END)"
        )

    dzdx = (
        f"((({v(1,-1)}) + 2 * ({v(1,0)}) + ({v(1,1)})) "
        f"- (({v(-1,-1)}) + 2 * ({v(-1,0)}) + ({v(-1,1)}))) / 8.0"
    )
    dzdy = (
        f"((({v(-1,1)}) + 2 * ({v(0,1)}) + ({v(1,1)})) "
        f"- (({v(-1,-1)}) + 2 * ({v(0,-1)}) + ({v(1,-1)}))) / 8.0"
    )
    az = f"90.0 - (atan2(dzdy, -dzdx) * (180.0 / pi()))"
    return f"""
WITH px AS (SELECT r.range % {W} AS gx, r.range // {W} AS gy FROM range({W * W}) r),
g AS (SELECT gx, gy, ({dzdx}) AS dzdx, ({dzdy}) AS dzdy FROM px)
SELECT gx, gy,
       round(CASE WHEN dzdx = 0.0 AND dzdy = 0.0 THEN -9999.0
                  WHEN ({az}) < 0.0 THEN ({az}) + 360.0
                  ELSE ({az}) END, 6) AS aspect_deg
FROM g
"""


_RELIEF_M = 2147483647.0
_RELIEF_RAMP = [
    (0.0, 0, 0, 255),
    (_RELIEF_M * 0.25, 0, 255, 255),
    (_RELIEF_M * 0.5, 0, 255, 0),
    (_RELIEF_M * 0.75, 255, 255, 0),
    (_RELIEF_M, 255, 0, 0),
]


def q_color_relief(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdaldem color-relief: 5-entry blue->red ramp linearly
    interpolated per channel with the reference's (int)(0.45 + x)
    truncation (alg/gdaldem_lib.cpp GDALColorReliefGetColor)."""
    band = raster.synth_band(spark, zoom=2, tile_px=8)
    out = raster.color_relief(band.select("gx", "gy", "value"), _RELIEF_RAMP)
    return out.select("gx", "gy", "r", "g", "b")


def sql_color_relief() -> str:
    v = f"CAST(({_band_val_sql('gy * 32 + gx')}) AS DOUBLE)"
    r, g, b = raster.color_relief_sql(v, _RELIEF_RAMP)
    return f"""
WITH px AS (SELECT r.range % 32 AS gx, r.range // 32 AS gy FROM range(1024) r)
SELECT gx, gy, {r} AS r, {g} AS g, {b} AS b FROM px
"""


def q_contour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marching-squares contour segments at the band's midpoint level
    (alg/contour.cpp; per-cell classification as column math, segments
    via filtered union — zero Python)."""
    from .operators import contour

    band = raster.synth_band(spark, zoom=2, tile_px=8)  # 32x32
    return contour.contour_segments(band, level=2**30, width=32)


def sql_contour() -> str:
    from .operators import contour

    return contour.contour_oracle_sql(2**30, 32, _band_val_sql)


def q_contour_polygonize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contour POLYGONIZE output mode (gdal_contour -p,
    alg/contour.cpp polygon writer): two-bump paraboloid band ->
    oriented marching-squares segments at level 11 (11 is not a sum of
    two squares, so no vertex sits exactly on the level) -> ring
    assembly by pointer doubling. Expect exactly two closed rings, one
    per bump, with engine-exact areas."""
    from .operators import contour

    W = 32
    band = spark.range(W * W).select(
        (F.col("id") % W).alias("gx"),
        (F.col("id") / W).cast("bigint").alias("gy"),
    )
    d1 = (F.col("gx") - 8) * (F.col("gx") - 8) + (F.col("gy") - 8) * (F.col("gy") - 8)
    d2 = (F.col("gx") - 24) * (F.col("gx") - 24) + (F.col("gy") - 24) * (F.col("gy") - 24)
    band = band.withColumn("value", F.least(d1, d2))
    segs = contour.contour_segments(band, level=11, width=W)
    return contour.contour_rings(segs, rounds=8)


def sql_contour_polygonize() -> str:
    from .operators import contour

    def bv(p: str) -> str:
        gx = f"(({p}) % 32)"
        gy = f"(({p}) // 32)"
        return (f"least(({gx} - 8) * ({gx} - 8) + ({gy} - 8) * ({gy} - 8), "
                f"({gx} - 24) * ({gx} - 24) + ({gy} - 24) * ({gy} - 24))")

    return contour.contour_rings_oracle_sql(11, 32, bv)


def q_warp_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster warp: resample the 32x32 world-mercator band onto a
    24x24 PLATE-CARREE (EPSG:4326) grid — per destination pixel,
    forward-project its lat/lon center into mercator pixel space and
    bilinear-sample the source (alg/gdalwarpoperation.cpp chunk
    semantics; dest-center inverse mapping + kernel sample). Rounded
    to 3dp: ln/tan is the one non-pinned op, and its 1-ulp wobble
    lands on ~2^31-scale values (abs error ~1e-6)."""
    from .operators import focal

    band = raster.synth_band(spark, zoom=2, tile_px=8)  # 32x32 mercator px
    W, D = 32, 24
    d = spark.range(D * D).select(
        F.col("id").alias("did"),
        (F.col("id") % D).alias("dx"),
        (F.col("id") / D).cast("bigint").alias("dy"),
    )
    lon = (F.col("dx") + F.lit(0.5)) * F.lit(360.0 / D) - F.lit(180.0)
    lat = F.lit(85.0) - (F.col("dy") + F.lit(0.5)) * F.lit(170.0 / D)
    # forward mercator -> global pixel coords at the source grid size
    mx = TF.merc_mx(lon)
    my = TF.merc_my(lat)
    os_f = TF.ORIGIN_SHIFT
    px = (mx + F.lit(os_f)) / F.lit(2.0 * os_f) * F.lit(float(W))
    py = (F.lit(os_f) - my) / F.lit(2.0 * os_f) * F.lit(float(W))
    pts = d.select("did", px.alias("px"), py.alias("py"))
    out = focal.sample_bilinear(band, pts, width=W, height=W, id_col="did")
    # normalize by 2^31 before rounding: the 1-ulp trig wobble in the
    # dest->src mapping perturbs the sampled value by ~1e-6 absolute;
    # after normalization that is ~5e-16 against a 5e-10 rounding
    # granularity — flip-proof
    return out.select(
        (F.col("did") % D).alias("dx"),
        (F.col("did") / D).cast("bigint").alias("dy"),
        F.round(F.col("value") / F.lit(2147483648.0), 9).alias("value"),
    )


def sql_warp_resample() -> str:
    W, D = 32, 24
    lon = f"(dx + 0.5) * {360.0 / D!r} - 180.0"
    lat = f"85.0 - (dy + 0.5) * {170.0 / D!r}"
    mx = derive.mercator_mx_sql(lon)
    my = derive.mercator_my_sql(lat)
    px = f"(({mx}) + {OS}) / (2.0 * {OS}) * CAST({W} AS DOUBLE)"
    py = f"({OS} - ({my})) / (2.0 * {OS}) * CAST({W} AS DOUBLE)"
    corner = lambda cx, cy: _band_val_sql(f"(_y0 + {cy}) * {W} + _x0 + {cx}")
    return f"""
WITH d AS (SELECT r.range AS did, r.range % {D} AS dx, r.range // {D} AS dy FROM range({D * D}) r),
p0 AS (
  SELECT did, dx, dy,
         least(greatest({px}, 0.5), {W - 0.5}) - 0.5 AS _fx,
         least(greatest({py}, 0.5), {W - 0.5}) - 0.5 AS _fy
  FROM d
),
p1 AS (
  SELECT did, dx, dy, _fx, _fy,
         least(CAST(floor(_fx) AS BIGINT), {W - 2}) AS _x0,
         least(CAST(floor(_fy) AS BIGINT), {W - 2}) AS _y0
  FROM p0
),
p AS (SELECT did, dx, dy, _x0, _y0, _fx - _x0 AS _wx, _fy - _y0 AS _wy FROM p1)
SELECT dx, dy,
       round((({corner(0,0)}) * (1 - _wx) * (1 - _wy)
           + ({corner(1,0)}) * _wx * (1 - _wy)
           + ({corner(0,1)}) * (1 - _wx) * _wy
           + ({corner(1,1)}) * _wx * _wy) / 2147483648.0, 9) AS value
FROM p
"""


def q_warp_resample_cubic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same warp as warp_resample but with the 4x4 cubic-convolution
    kernel (a=-0.5, alg/gdalresamplingkernels.h), sampled on the
    tile-array model (halo-2 padded tiles — one shuffle, not 16
    shifted joins)."""
    from .operators import tile_raster

    band = raster.synth_band(spark, zoom=2, tile_px=8)  # 32x32 mercator px
    W, D = 32, 24
    d = spark.range(D * D).select(
        F.col("id").alias("did"),
        (F.col("id") % D).alias("dx"),
        (F.col("id") / D).cast("bigint").alias("dy"),
    )
    lon = (F.col("dx") + F.lit(0.5)) * F.lit(360.0 / D) - F.lit(180.0)
    lat = F.lit(85.0) - (F.col("dy") + F.lit(0.5)) * F.lit(170.0 / D)
    mx = TF.merc_mx(lon)
    my = TF.merc_my(lat)
    os_f = TF.ORIGIN_SHIFT
    px = (mx + F.lit(os_f)) / F.lit(2.0 * os_f) * F.lit(float(W))
    py = (F.lit(os_f) - my) / F.lit(2.0 * os_f) * F.lit(float(W))
    pts = d.select("did", px.alias("px"), py.alias("py"))
    tiles = tile_raster.tiles_from_pixels(band, tile=8)
    out = tile_raster.sample_cubic_tiles(
        tiles, pts, tile=8, width=W, height=W, id_col="did"
    )
    # normalized like warp_resample (see comment there)
    return out.select(
        (F.col("did") % D).alias("dx"),
        (F.col("did") / D).cast("bigint").alias("dy"),
        F.round(F.col("value") / F.lit(2147483648.0), 9).alias("value"),
    )


def sql_warp_resample_cubic() -> str:
    from .operators.focal import cubic_weight_sql

    W, D = 32, 24
    lon = f"(dx + 0.5) * {360.0 / D!r} - 180.0"
    lat = f"85.0 - (dy + 0.5) * {170.0 / D!r}"
    mx = derive.mercator_mx_sql(lon)
    my = derive.mercator_my_sql(lat)
    px = f"(({mx}) + {OS}) / (2.0 * {OS}) * CAST({W} AS DOUBLE)"
    py = f"({OS} - ({my})) / (2.0 * {OS}) * CAST({W} AS DOUBLE)"

    def tap(i: int, j: int) -> str:
        cx = f"least(greatest(_x0 + ({i}), 0), {W - 1})"
        cy = f"least(greatest(_y0 + ({j}), 0), {W - 1})"
        return f"CAST({_band_val_sql(f'({cy}) * {W} + ({cx})')} AS DOUBLE)"

    row_terms = []
    for j in (-1, 0, 1, 2):
        terms = [f"({tap(i, j)} * {cubic_weight_sql('_tx', i)})" for i in (-1, 0, 1, 2)]
        row = "(((" + terms[0] + " + " + terms[1] + ") + " + terms[2] + ") + " + terms[3] + ")"
        row_terms.append(f"({row} * {cubic_weight_sql('_ty', j)})")
    total = "(((" + row_terms[0] + " + " + row_terms[1] + ") + " + row_terms[2] + ") + " + row_terms[3] + ")"
    return f"""
WITH d AS (SELECT r.range AS did, r.range % {D} AS dx, r.range // {D} AS dy FROM range({D * D}) r),
p0 AS (
  SELECT did, dx, dy,
         least(greatest({px}, 0.5), {W - 0.5}) - 0.5 AS _fx,
         least(greatest({py}, 0.5), {W - 0.5}) - 0.5 AS _fy
  FROM d
),
p1 AS (
  SELECT did, dx, dy, _fx, _fy,
         least(CAST(floor(_fx) AS BIGINT), {W - 2}) AS _x0,
         least(CAST(floor(_fy) AS BIGINT), {W - 2}) AS _y0
  FROM p0
),
p AS (SELECT did, dx, dy, _x0, _y0, _fx - _x0 AS _tx, _fy - _y0 AS _ty FROM p1)
SELECT dx, dy, round(({total}) / 2147483648.0, 9) AS value FROM p
"""


def q_warp_resample_cubicspline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same warp as warp_resample with the GRA_CubicSpline B-spline
    kernel (alg/gdalwarper.h:37-67) on the tile-array model."""
    from .operators import tile_raster

    band = raster.synth_band(spark, zoom=2, tile_px=8)  # 32x32 mercator px
    W, D = 32, 24
    d = spark.range(D * D).select(
        F.col("id").alias("did"),
        (F.col("id") % D).alias("dx"),
        (F.col("id") / D).cast("bigint").alias("dy"),
    )
    lon = (F.col("dx") + F.lit(0.5)) * F.lit(360.0 / D) - F.lit(180.0)
    lat = F.lit(85.0) - (F.col("dy") + F.lit(0.5)) * F.lit(170.0 / D)
    mx = TF.merc_mx(lon)
    my = TF.merc_my(lat)
    os_f = TF.ORIGIN_SHIFT
    px = (mx + F.lit(os_f)) / F.lit(2.0 * os_f) * F.lit(float(W))
    py = (F.lit(os_f) - my) / F.lit(2.0 * os_f) * F.lit(float(W))
    pts = d.select("did", px.alias("px"), py.alias("py"))
    tiles = tile_raster.tiles_from_pixels(band, tile=8)
    out = tile_raster.sample_cubic_tiles(
        tiles, pts, tile=8, width=W, height=W, id_col="did",
        kernel="cubicspline",
    )
    return out.select(
        (F.col("did") % D).alias("dx"),
        (F.col("did") / D).cast("bigint").alias("dy"),
        F.round(F.col("value") / F.lit(2147483648.0), 9).alias("value"),
    )


def sql_warp_resample_cubicspline() -> str:
    from .operators.focal import cubicspline_weight_sql

    W, D = 32, 24
    lon = f"(dx + 0.5) * {360.0 / D!r} - 180.0"
    lat = f"85.0 - (dy + 0.5) * {170.0 / D!r}"
    mx = derive.mercator_mx_sql(lon)
    my = derive.mercator_my_sql(lat)
    px = f"(({mx}) + {OS}) / (2.0 * {OS}) * CAST({W} AS DOUBLE)"
    py = f"({OS} - ({my})) / (2.0 * {OS}) * CAST({W} AS DOUBLE)"

    def tap(i: int, j: int) -> str:
        cx = f"least(greatest(_x0 + ({i}), 0), {W - 1})"
        cy = f"least(greatest(_y0 + ({j}), 0), {W - 1})"
        return f"CAST({_band_val_sql(f'({cy}) * {W} + ({cx})')} AS DOUBLE)"

    row_terms = []
    for j in (-1, 0, 1, 2):
        terms = [f"({tap(i, j)} * {cubicspline_weight_sql('_tx', i)})"
                 for i in (-1, 0, 1, 2)]
        row = "(((" + terms[0] + " + " + terms[1] + ") + " + terms[2] + ") + " + terms[3] + ")"
        row_terms.append(f"({row} * {cubicspline_weight_sql('_ty', j)})")
    total = "(((" + row_terms[0] + " + " + row_terms[1] + ") + " + row_terms[2] + ") + " + row_terms[3] + ")"
    return f"""
WITH d AS (SELECT r.range AS did, r.range % {D} AS dx, r.range // {D} AS dy FROM range({D * D}) r),
p0 AS (
  SELECT did, dx, dy,
         least(greatest({px}, 0.5), {W - 0.5}) - 0.5 AS _fx,
         least(greatest({py}, 0.5), {W - 0.5}) - 0.5 AS _fy
  FROM d
),
p1 AS (
  SELECT did, dx, dy, _fx, _fy,
         least(CAST(floor(_fx) AS BIGINT), {W - 2}) AS _x0,
         least(CAST(floor(_fy) AS BIGINT), {W - 2}) AS _y0
  FROM p0
),
p AS (SELECT did, dx, dy, _x0, _y0, _fx - _x0 AS _tx, _fy - _y0 AS _ty FROM p1)
SELECT dx, dy, round(({total}) / 2147483648.0, 9) AS value FROM p
"""


def q_warp_resample_lanczos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warp with the Lanczos-3 windowed-sinc kernel (6x6 taps,
    normalized weights; alg/gdalresamplingkernels.h), sampled on the
    tile-array model (halo-3 padded tiles, vectorized taps — no driver
    collect, no per-row Python)."""
    from .operators import tile_raster

    band = raster.synth_band(spark, zoom=2, tile_px=8)
    W, D = 32, 24
    d = spark.range(D * D).select(
        F.col("id").alias("did"),
        (F.col("id") % D).alias("dx"),
        (F.col("id") / D).cast("bigint").alias("dy"),
    )
    lon = (F.col("dx") + F.lit(0.5)) * F.lit(360.0 / D) - F.lit(180.0)
    lat = F.lit(85.0) - (F.col("dy") + F.lit(0.5)) * F.lit(170.0 / D)
    mx = TF.merc_mx(lon)
    my = TF.merc_my(lat)
    os_f = TF.ORIGIN_SHIFT
    px = (mx + F.lit(os_f)) / F.lit(2.0 * os_f) * F.lit(float(W))
    py = (F.lit(os_f) - my) / F.lit(2.0 * os_f) * F.lit(float(W))
    pts = d.select("did", px.alias("px"), py.alias("py"))
    tiles = tile_raster.tiles_from_pixels(band, tile=8)
    out = tile_raster.sample_lanczos_tiles(
        tiles, pts, tile=8, width=W, height=W, id_col="did"
    )
    return out.select(
        (F.col("did") % D).alias("dx"),
        (F.col("did") / D).cast("bigint").alias("dy"),
        F.round(F.col("value") / F.lit(2147483648.0), 9).alias("value"),
    )


def sql_warp_resample_lanczos() -> str:
    W, D = 32, 24
    lon = f"(dx + 0.5) * {360.0 / D!r} - 180.0"
    lat = f"85.0 - (dy + 0.5) * {170.0 / D!r}"
    mx = derive.mercator_mx_sql(lon)
    my = derive.mercator_my_sql(lat)
    px = f"(({mx}) + {OS}) / (2.0 * {OS}) * CAST({W} AS DOUBLE)"
    py = f"({OS} - ({my})) / (2.0 * {OS}) * CAST({W} AS DOUBLE)"

    def lanczos_w(d_expr: str) -> str:
        pd_ = f"(pi() * ({d_expr}))"
        return (
            f"(CASE WHEN ({d_expr}) = 0.0 THEN 1.0 ELSE "
            f"(sin({pd_}) / {pd_}) * (sin({pd_} / 3) / ({pd_} / 3)) END)"
        )

    def tap(i: int, j: int) -> str:
        cx = f"least(greatest(_x0 + ({i}), 0), {W - 1})"
        cy = f"least(greatest(_y0 + ({j}), 0), {W - 1})"
        return f"CAST({_band_val_sql(f'({cy}) * {W} + ({cx})')} AS DOUBLE)"

    taps = list(range(-2, 4))
    # row-major left folds, identical structure to the numpy loop
    row_exprs = []
    for j in taps:
        row = None
        for i in taps:
            term = f"({tap(i, j)} * {lanczos_w(f'_tx - ({i})')})"
            row = term if row is None else f"({row} + {term})"
        row_exprs.append(f"({row} * {lanczos_w(f'_ty - ({j})')})")
    num = None
    for r in row_exprs:
        num = r if num is None else f"({num} + {r})"
    sx = None
    for i in taps:
        t = lanczos_w(f"_tx - ({i})")
        sx = t if sx is None else f"({sx} + {t})"
    sy = None
    for j in taps:
        t = lanczos_w(f"_ty - ({j})")
        sy = t if sy is None else f"({sy} + {t})"
    return f"""
WITH d AS (SELECT r.range AS did, r.range % {D} AS dx, r.range // {D} AS dy FROM range({D * D}) r),
p0 AS (
  SELECT did, dx, dy,
         least(greatest({px}, 0.5), {W - 0.5}) - 0.5 AS _fx,
         least(greatest({py}, 0.5), {W - 0.5}) - 0.5 AS _fy
  FROM d
),
p AS (
  SELECT did, dx, dy,
         CAST(floor(_fx) AS BIGINT) AS _x0, CAST(floor(_fy) AS BIGINT) AS _y0,
         _fx - floor(_fx) AS _tx, _fy - floor(_fy) AS _ty
  FROM p0
)
SELECT dx, dy, round((({num}) / (({sx}) * ({sy}))) / 2147483648.0, 9) AS value FROM p
"""


def _cutline_star() -> tuple[list[float], list[float]]:
    """The cutline fixture: a non-convex 10-vertex star (5 points,
    alternating outer/inner radii) in dst lon/lat space. Vertices are
    computed ONCE here and embedded as repr() literals in BOTH the
    Spark expression and the DuckDB oracle, so the point-in-polygon
    fold is pure +,-,*,/ and compares — float-exact cross-engine."""
    import math as _m

    cx, cy, phase = 5.0, 3.0, 0.3
    vx, vy = [], []
    for k in range(10):
        rx = 140.0 if k % 2 == 0 else 55.0
        ry = 70.0 if k % 2 == 0 else 27.0
        a = phase + _m.pi * k / 5.0
        vx.append(cx + rx * _m.cos(a))
        vy.append(cy + ry * _m.sin(a))
    return vx, vy


def _pip_crossing_spark(px: str, py: str, vx: list[float], vy: list[float]) -> str:
    """Spark-SQL boolean: crossing-count PIP of (px, py) against the
    literal ring, reference rule ogrlinearring.cpp:503-531 — straddle
    ((y1>0 & y2<=0)|(y2>0 & y1<=0)) then strict 0 < cross/(y2-y1)."""
    n = len(vx)
    ax = "array(" + ", ".join(repr(v) for v in vx) + ")"
    ay = "array(" + ", ".join(repr(v) for v in vy) + ")"
    x2 = f"(element_at({ax}, j + 1) - ({px}))"
    y2 = f"(element_at({ay}, j + 1) - ({py}))"
    x1 = f"(element_at({ax}, 1 + (j + 1) % {n}) - ({px}))"
    y1 = f"(element_at({ay}, 1 + (j + 1) % {n}) - ({py}))"
    term = (
        f"CASE WHEN ((({y1} > 0) AND ({y2} <= 0)) OR (({y2} > 0) AND ({y1} <= 0)))"
        f" AND (({x1} * {y2} - {x2} * {y1}) / ({y2} - {y1})) > 0.0"
        f" THEN 1 ELSE 0 END"
    )
    return (f"aggregate(sequence(0, {n - 1}), 0, (a, j) -> a + {term}) % 2 = 1")


def _pip_crossing_duckdb(px: str, py: str, vx: list[float], vy: list[float]) -> str:
    """DuckDB twin of _pip_crossing_spark (identical op sequence)."""
    n = len(vx)
    ax = "[" + ", ".join(repr(v) for v in vx) + "]"
    ay = "[" + ", ".join(repr(v) for v in vy) + "]"
    x2 = f"({ax}[j + 1] - ({px}))"
    y2 = f"({ay}[j + 1] - ({py}))"
    x1 = f"({ax}[1 + (j + 1) % {n}] - ({px}))"
    y1 = f"({ay}[1 + (j + 1) % {n}] - ({py}))"
    term = (
        f"CASE WHEN ((({y1} > 0) AND ({y2} <= 0)) OR (({y2} > 0) AND ({y1} <= 0)))"
        f" AND (({x1} * {y2} - {x2} * {y1}) / ({y2} - {y1})) > 0.0"
        f" THEN 1 ELSE 0 END"
    )
    return (f"list_reduce(list_prepend(0, list_transform(range(0, {n}), "
            f"j -> {term})), (a, b) -> a + b) % 2 = 1")


def q_warp_cutline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdalwarp -cutline: the bilinear mercator->plate-carree warp of
    warp_resample, masked by a non-convex star cutline — a dst pixel
    survives iff its CENTER lies inside the polygon, GDAL's default
    rasterize containment (GDALWarpCutlineMaskerEx,
    alg/gdalwarper.cpp:1363, CUTLINE_ALL_TOUCHED=FALSE); outside
    pixels become dst nodata, i.e. are absent from the row table. The
    PIP is a JVM column fold over literal vertices (no UDF, no trig at
    query time), so the mask predicate is float-exact vs the oracle."""
    vx, vy = _cutline_star()
    D = 24
    out = q_warp_resample(spark, sf_dir)
    lon = f"(dx + 0.5) * {360.0 / D!r} - 180.0"
    lat = f"85.0 - (dy + 0.5) * {170.0 / D!r}"
    return out.where(F.expr(_pip_crossing_spark(lon, lat, vx, vy)))


def sql_warp_cutline() -> str:
    vx, vy = _cutline_star()
    D = 24
    lon = f"(dx + 0.5) * {360.0 / D!r} - 180.0"
    lat = f"85.0 - (dy + 0.5) * {170.0 / D!r}"
    return (f"SELECT * FROM (\n{sql_warp_resample()}\n) "
            f"WHERE {_pip_crossing_duckdb(lon, lat, vx, vy)}")


def q_viewshed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viewshed from the center of the 32x32 band (alg/viewshed):
    slope-ratio line-of-sight over bilinear ray samples — trig-free,
    so the boolean visibility map is cross-engine exact."""
    from .operators import focal

    band = raster.synth_band(spark, zoom=2, tile_px=8)
    return focal.viewshed(band.select("gx", "gy", "value"), width=32, ox=16, oy=16,
                          obs_height=2.0)


def sql_viewshed() -> str:
    return _viewshed_sweep_sql(32, 16, 16)


def _viewshed_sweep_sql(W: int, ox: int, oy: int) -> str:
    """The single-observer sweep replay, parameterized by observer
    (cumulative unions one copy per grid observer). Returns a
    standalone WITH...SELECT (gx, gy, visible) statement."""
    corner = lambda cx, cy: _band_val_sql(f"(_y0 + {cy}) * {W} + _x0 + {cx}")
    z0 = f"CAST({_band_val_sql(str(oy * W + ox))} AS DOUBLE) + 2.0"
    return f"""
WITH px AS (SELECT r.range % {W} AS gx, r.range // {W} AS gy,
                   {_band_val_sql(f"(r.range // {W}) * {W} + (r.range % {W})")} AS zp
            FROM range({W * W}) r),
s0 AS (SELECT gx, gy, zp, greatest(abs(gx - {ox}), abs(gy - {oy})) AS nsteps FROM px),
samp AS (
  SELECT gx, gy, nsteps, st.range AS stepk FROM s0 CROSS JOIN range({W}) st
  WHERE nsteps >= 2 AND st.range >= 1 AND st.range <= nsteps - 1
),
pt AS (SELECT gx, gy, CAST(stepk AS DOUBLE) / CAST(nsteps AS DOUBLE) AS t FROM samp),
sp AS (
  SELECT gx, gy, t,
         {float(ox)!r} + (gx - {ox}) * t + 0.5 AS sxx,
         {float(oy)!r} + (gy - {oy}) * t + 0.5 AS syy
  FROM pt
),
b0 AS (
  SELECT gx, gy, t,
         least(greatest(sxx, 0.5), {W - 0.5}) - 0.5 AS _fx,
         least(greatest(syy, 0.5), {W - 0.5}) - 0.5 AS _fy
  FROM sp
),
b1 AS (
  SELECT gx, gy, t, _fx, _fy,
         least(CAST(floor(_fx) AS BIGINT), {W - 2}) AS _x0,
         least(CAST(floor(_fy) AS BIGINT), {W - 2}) AS _y0
  FROM b0
),
b AS (SELECT gx, gy, t, _x0, _y0, _fx - _x0 AS _wx, _fy - _y0 AS _wy FROM b1),
zs AS (
  SELECT gx, gy, t,
         ({corner(0,0)}) * (1 - _wx) * (1 - _wy)
       + ({corner(1,0)}) * _wx * (1 - _wy)
       + ({corner(0,1)}) * (1 - _wx) * _wy
       + ({corner(1,1)}) * _wx * _wy AS zs
  FROM b
),
mx AS (SELECT gx, gy, max((zs - ({z0})) / t) AS max_s FROM zs GROUP BY 1, 2)
SELECT s0.gx, s0.gy,
       (mx.max_s IS NULL OR mx.max_s < (s0.zp - ({z0}))) AS visible
FROM s0 LEFT JOIN mx ON mx.gx = s0.gx AND mx.gy = s0.gy
"""


_VIEWSHED_PARTS = [
    ("normal", [], ["gx", "gy", "v"]),
    ("cumulative", [], ["gx", "gy", "v"]),
]

_CUMVS_SPACING = 8  # 32x32 band, observers at {0,8,16,24}^2 = 16 rays


def q_viewshed_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viewshed surface in one gate row: the single-observer NORMAL map
    (tag `normal`, the r1-r3 gate query) + the r4 cumulative viewshed
    (alg/viewshed/cumulative.cpp: grid observers, visibleVal=1 sums,
    floor((255/max)*v) 8-bit scale)."""
    from .operators import focal

    norm = q_viewshed(spark, sf_dir).select(
        "gx", "gy",
        F.when(F.col("visible"), F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("v"))
    band = raster.synth_band(spark, zoom=2, tile_px=8)
    cum = focal.cumulative_viewshed(
        band.select("gx", "gy", "value"), width=32,
        spacing=_CUMVS_SPACING, obs_height=2.0,
    ).withColumnRenamed("value", "v")
    subs = {"normal": norm, "cumulative": cum}
    return _suite(
        [(t, subs[t], sc, nc) for t, sc, nc in _VIEWSHED_PARTS],
        n_str=0, n_num=3,
    )


def sql_viewshed_suite() -> str:
    norm = (f"SELECT gx, gy, CASE WHEN visible THEN 1 ELSE 0 END AS v "
            f"FROM ({sql_viewshed()}) nv")
    copies = " UNION ALL ".join(
        f"SELECT gx, gy, CASE WHEN visible THEN 1 ELSE 0 END AS vis "
        f"FROM ({_viewshed_sweep_sql(32, ox, oy)}) o_{ox}_{oy}"
        for ox in range(0, 32, _CUMVS_SPACING)
        for oy in range(0, 32, _CUMVS_SPACING)
    )
    cum = f"""
WITH obs AS ({copies}),
s AS (SELECT gx, gy, CAST(sum(vis) AS BIGINT) AS sv FROM obs GROUP BY 1, 2),
m AS (SELECT max(sv) AS mx FROM s)
SELECT gx, gy, CAST(floor((255.0 / mx) * sv) AS BIGINT) AS v FROM s, m
"""
    subs = {"normal": norm, "cumulative": cum}
    return _suite_sql(
        [(t, subs[t], sc, nc) for t, sc, nc in _VIEWSHED_PARTS],
        n_str=0, n_num=3,
    )


def q_pansharpen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-Brovey pansharpening (alg/gdalpansharpen.cpp): two MS
    bands + a pan band, each derived from the pixel hash with distinct
    salts; exact arithmetic."""
    spark_df = spark.range(32 * 32).select(
        (F.col("id") % 32).alias("gx"),
        (F.col("id") / 32).cast("bigint").alias("gy"),
        F.col("id").alias("pid"),
    )
    ms = spark_df.select(
        "gx", "gy",
        raster._hash_col(F.col("pid"), 301).alias("b_red"),
        raster._hash_col(F.col("pid"), 302).alias("b_nir"),
    )
    pan = spark_df.select("gx", "gy", raster._hash_col(F.col("pid"), 303).alias("value"))
    out = raster.pansharpen_weighted(ms, pan, bands=["b_red", "b_nir"],
                                     weights=[0.5, 0.5])
    return out.select("gx", "gy", "b_red_sharp", "b_nir_sharp")


def sql_pansharpen() -> str:
    def hv(salt: int) -> str:
        return (
            f"(((r.range % {M31}) * {A} + {salt}) % {M31} * {A} + {salt * 7 + 13}) % {M31}"
        )

    return f"""
WITH px AS (
  SELECT r.range % 32 AS gx, r.range // 32 AS gy,
         {hv(301)} AS b_red, {hv(302)} AS b_nir, {hv(303)} AS pan
  FROM range(1024) r
),
j AS (SELECT gx, gy, b_red, b_nir, pan,
             b_red * 0.5 + b_nir * 0.5 AS pseudo FROM px)
SELECT gx, gy,
       b_red * (pan / pseudo) AS b_red_sharp,
       b_nir * (pan / pseudo) AS b_nir_sharp
FROM j
"""


# ------------------------------------------------------------ relational

def q_ogr_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUMMARY_RECORD aggregates (ogr_gensql.cpp:849) incl. the
    Welford stddevs (ogr_swq.h:357-398) in exact integer-moment form:
    n*Sx2 - Sx^2 is an exact int64, the double division and sqrt are
    single correctly-rounded IEEE ops — engine-independent for the
    integer l_quantity column. Price summed as exact integer cents."""
    li = _read(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    agg = li.agg(
        F.count("*").alias("cnt"),
        F.countDistinct("l_quantity").alias("cnt_dist_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.sum("l_quantity").alias("sum_qty"),
        F.avg("l_quantity").alias("avg_qty"),
        F.sum((q * q).cast("bigint")).alias("_s2"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint").alias("sum_price_cents"),
    )
    n = F.col("cnt")
    m = n * F.col("_s2") - F.col("sum_qty") * F.col("sum_qty")
    return agg.select(
        "cnt", "cnt_dist_qty", "min_qty", "max_qty", "sum_qty", "avg_qty",
        F.sqrt(m.cast("double") / (n * n).cast("double")).alias("stddev_pop_qty"),
        F.sqrt(m.cast("double") / (n * (n - 1)).cast("double")).alias("stddev_samp_qty"),
        "sum_price_cents",
    )


def sql_ogr_summary() -> str:
    return """
WITH a AS (
  SELECT count(*) AS cnt,
         count(DISTINCT l_quantity) AS cnt_dist_qty,
         min(l_quantity) AS min_qty,
         max(l_quantity) AS max_qty,
         sum(l_quantity) AS sum_qty,
         avg(l_quantity) AS avg_qty,
         CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS _s2,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents
  FROM lineitem
)
SELECT cnt, cnt_dist_qty, min_qty, max_qty, sum_qty, avg_qty,
       sqrt(CAST(cnt * _s2 - sum_qty * sum_qty AS DOUBLE) / CAST(cnt * cnt AS DOUBLE)) AS stddev_pop_qty,
       sqrt(CAST(cnt * _s2 - sum_qty * sum_qty AS DOUBLE) / CAST(cnt * (cnt - 1) AS DOUBLE)) AS stddev_samp_qty,
       sum_price_cents
FROM a
"""


def q_ogr_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT (SWQM_DISTINCT_LIST, swq.cpp:388-418)."""
    o = _read(spark, sf_dir, "orders")
    return relational.distinct_list(o, "o_orderpriority") \
        .select(F.col("o_orderpriority").alias("val"))


def sql_ogr_distinct() -> str:
    return "SELECT DISTINCT o_orderpriority AS val FROM orders ORDER BY val NULLS FIRST"


def q_ogr_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT/OFFSET (ogr_gensql.cpp:2201, :1862-1878)."""
    o = _read(spark, sf_dir, "orders")
    out = relational.order_limit_offset(
        o, [("o_totalprice", False), ("o_orderkey", True)], limit=10, offset=5
    )
    return out.select("o_orderkey", "o_totalprice")


def sql_ogr_orderby_limit() -> str:
    return """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC NULLS FIRST, o_orderkey ASC NULLS FIRST
LIMIT 10 OFFSET 5
"""


def q_ogr_first_match_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OGR one-to-one LEFT JOIN: first matching secondary row
    (ogr_gensql.cpp:1497-1527)."""
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "c_custkey")
    j = relational.first_match_left_join(
        c, o.select("c_custkey", "o_orderkey", "o_totalprice"),
        on="c_custkey", secondary_order="o_orderkey",
    )
    return j.select(
        "c_custkey",
        F.col("sec_o_orderkey").alias("first_orderkey"),
        F.col("sec_o_totalprice").alias("first_total"),
    )


def sql_ogr_first_match_join() -> str:
    return """
SELECT c.c_custkey, o.o_orderkey AS first_orderkey, o.o_totalprice AS first_total
FROM customer c
LEFT JOIN (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
  FROM orders
) o ON o.o_custkey = c.c_custkey AND o.rn = 1
"""


def q_ogr_like_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE with LIKE / ILIKE / BETWEEN / IN (swq_op_general.cpp
    comparison + pattern ops)."""
    p = _read(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_name").like("%a%")
            & F.col("p_brand").ilike("brand%")
            & F.col("p_size").between(10, 30)
            & F.col("p_retailprice").isNotNull()
        )
        .select("p_partkey", "p_name", "p_size")
    )


def sql_ogr_like_between() -> str:
    return """
SELECT p_partkey, p_name, p_size FROM part
WHERE p_name LIKE '%a%' AND p_brand ILIKE 'brand%'
  AND p_size BETWEEN 10 AND 30 AND p_retailprice IS NOT NULL
"""


def q_ogr_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two selects (swq_parser.y:840)."""
    c = _read(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"), F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("src"),
    )
    s = _read(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"), F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("src"),
    )
    return relational.union_all(c, s)


def sql_ogr_union_all() -> str:
    return """
SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS src FROM customer
UNION ALL
SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS src FROM supplier
"""


def q_ogr_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar expression profile: CONCAT, SUBSTR (1-based), CAST,
    arithmetic with int/float promotion (swq_op_registrar.cpp:28-62).
    floor-before-cast keeps double->int identical across engines."""
    c = _read(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.substring("c_name", 1, 8).alias("name8"),
        F.concat(F.col("c_mktsegment"), F.lit("-"), F.col("c_nationkey").cast("string")).alias("seg_nat"),
        F.floor(F.col("c_acctbal")).cast("bigint").alias("bal_floor"),
        ((F.col("c_custkey") * 3 + 7) % 97).alias("keymod"),
        F.upper(F.substring("c_mktsegment", 1, 3)).alias("seg3"),
    )


def sql_ogr_expressions() -> str:
    return """
SELECT c_custkey,
       substring(c_name, 1, 8) AS name8,
       concat(c_mktsegment, '-', CAST(c_nationkey AS VARCHAR)) AS seg_nat,
       CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
       (c_custkey * 3 + 7) % 97 AS keymod,
       upper(substring(c_mktsegment, 1, 3)) AS seg3
FROM customer
"""


def q_geom_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OGR_GEOM_AREA special field (ogr_p.h:167-174): shoelace area of
    each countries64 polygon, rounded to 6 dp."""
    polys = polygons.countries64(spark)
    area = F.expr(
        "round(abs(aggregate(sequence(0, size(xs) - 2), 0D, (a, j) -> "
        "a + (element_at(xs, j + 1) * element_at(ys, j + 2) "
        "- element_at(xs, j + 2) * element_at(ys, j + 1)))) / 2, 6)"
    )
    return polys.select("poly_id", area.alias("area"))


def sql_geom_area() -> str:
    vx = (lambda idx: f"cx + rx*cos(phase + 2*pi()*CAST({idx} AS DOUBLE)/CAST(nv AS DOUBLE))")
    vy = (lambda idx: f"cy + ry*sin(phase + 2*pi()*CAST({idx} AS DOUBLE)/CAST(nv AS DOUBLE))")
    return f"""
WITH polys AS ({derive.polygons_sql_cte()}),
edges AS (
  SELECT p, ({vx('e.range')}) * ({vy('(e.range+1)%nv')})
           - ({vx('(e.range+1)%nv')}) * ({vy('e.range')}) AS cross_term
  FROM polys CROSS JOIN range(12) e WHERE e.range < polys.nv
)
SELECT p AS poly_id, round(abs(sum(cross_term)) / 2, 6) AS area FROM edges GROUP BY p
"""


# ----------------------------------------------------- text / dedup / sim

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate groups on a 20-char text prefix key."""
    d = _read(spark, sf_dir, "documents").withColumn(
        "k", F.substring("text", 1, 20)
    )
    return dedup.exact_dedup(d, id_col="doc_id", text="k")


def sql_dedup_exact() -> str:
    return """
SELECT min(doc_id) AS keeper, count(*) AS n_members
FROM (SELECT doc_id, substring(text, 1, 20) AS k FROM documents)
GROUP BY k HAVING count(*) > 1
"""


def q_dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup THE SCALE WAY: group on sha256(content) so the
    shuffle key is 32 bytes regardless of document size (the
    at-scale form the dedup docstring prescribes; collision
    probability ~n^2/2^256 is negligible and both engines hash
    identically, so results equal text-key grouping)."""
    d = _read(spark, sf_dir, "documents").withColumn(
        "k", F.sha2(F.substring("text", 1, 20), 256)
    )
    return dedup.exact_dedup(d, id_col="doc_id", text="k")


def sql_dedup_exact_hash() -> str:
    return """
SELECT min(doc_id) AS keeper, count(*) AS n_members
FROM (SELECT doc_id, sha256(substring(text, 1, 20)) AS k FROM documents)
GROUP BY k HAVING count(*) > 1
"""


def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs: word-bigram Jaccard >= 30% via inverted-index
    join (integer arithmetic only)."""
    d = _read(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(d, id_col="doc_id", n=2, threshold_pct=30)


def sql_dedup_jaccard() -> str:
    whash = _WHASH.replace("string_split(w, '')", "string_split(tok, '')")
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
u AS (SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS i FROM t),
h AS (SELECT doc_id, i, {whash} AS wh FROM u),
g0 AS (SELECT doc_id, (wh * {dedup.GRAM_P} + lead(wh) OVER (PARTITION BY doc_id ORDER BY i)) % {M31} AS gram FROM h),
g AS (SELECT DISTINCT doc_id, gram FROM g0 WHERE gram IS NOT NULL),
sz AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY 1),
sh AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
  FROM g a JOIN g b USING (gram) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT id_a, id_b, shared, sa.ng AS na, sb.ng AS nb
FROM sh JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
WHERE 100 * shared >= 30 * (sa.ng + sb.ng - shared)
"""


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + 4-band LSH candidate pairs — fully deterministic
    portable hashing (polynomial word hash, LCG permutations)."""
    d = _read(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(d, id_col="doc_id", n_hashes=16, bands=4)


def sql_minhash_lsh() -> str:
    P = dedup.LSH_PRIME
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
w0 AS (SELECT doc_id, unnest(toks) AS w FROM t),
wh AS (SELECT DISTINCT doc_id, {_WHASH} AS h FROM w0),
j AS (
  SELECT doc_id, h, r.range AS jj,
         ((2 * r.range + 1) * 40503) % {P} AS a,
         (r.range * 1103515245 + 12345) % {P} AS b
  FROM wh CROSS JOIN range(16) r
),
sig AS (SELECT doc_id, jj, min((h * a + b) % {P}) AS mh FROM j GROUP BY 1, 2),
band AS (
  SELECT doc_id, jj // 4 AS band,
         list_reduce(list_prepend(CAST(0 AS BIGINT), list(mh ORDER BY jj)),
                     (h, x) -> (h * 131 + x) % {P}) AS key
  FROM sig GROUP BY 1, 2
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_bands_matched
FROM band a JOIN band b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprints (exact int bit votes)."""
    d = _read(spark, sf_dir, "documents")
    return dedup.simhash64(d, id_col="doc_id", bits=32)


def sql_simhash() -> str:
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
w0 AS (SELECT doc_id, unnest(toks) AS w FROM t),
wh AS (SELECT DISTINCT doc_id, {_WHASH} AS h FROM w0),
votes AS (
  SELECT doc_id, r.range AS b,
         sum(CASE WHEN (h // (CAST(1 AS BIGINT) << r.range)) % 2 = 1 THEN 1 ELSE -1 END) AS v
  FROM wh CROSS JOIN range(32) r GROUP BY 1, 2
)
SELECT doc_id AS id,
       CAST(sum(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY 1
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token stats + quality features + accept flag (integer measures)."""
    d = _read(spark, sf_dir, "documents")
    ts = text.token_stats(d, id_col="doc_id")
    qs = text.quality_score(d, id_col="doc_id").select(
        "id", "stop_hits", "uniq_ratio_pct", "accepted"
    )
    return ts.join(qs, "id")


def sql_text_quality() -> str:
    sumlen = f"CAST(list_sum(list_transform({_TOKS}, t -> length(t))) AS BIGINT)"
    ntok = f"len({_TOKS})"
    nuniq = f"len(list_distinct({_TOKS}))"
    stop = " + ".join(_count_token_sql(t) for t in text.LANG_MARKERS["en"])
    return f"""
SELECT doc_id AS id,
       length(text) AS n_chars,
       {ntok} AS n_tokens,
       {nuniq} AS n_uniq_tokens,
       (100 * coalesce({sumlen}, 0)) // greatest({ntok}, 1) AS avg_token_len_x100,
       CAST({stop} AS BIGINT) AS stop_hits,
       (100 * CAST({nuniq} AS BIGINT)) // greatest({ntok}, 1) AS uniq_ratio_pct,
       (length(text) BETWEEN 50 AND 5000) AND ({stop}) >= 1
         AND ((100 * CAST({nuniq} AS BIGINT)) // greatest({ntok}, 1)) >= 20 AS accepted
FROM documents
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID."""
    d = _read(spark, sf_dir, "documents")
    return text.lang_id(d, id_col="doc_id")


def sql_lang_id() -> str:
    hits = {
        lang: "(" + " + ".join(_count_token_sql(t) for t in toks) + ")"
        for lang, toks in text.LANG_MARKERS.items()
    }
    m = f"greatest({hits['en']}, {hits['de']}, {hits['fr']}, {hits['es']})"
    return f"""
SELECT doc_id AS id,
       CAST({hits['en']} AS BIGINT) AS hits_en,
       CAST({hits['de']} AS BIGINT) AS hits_de,
       CAST({hits['fr']} AS BIGINT) AS hits_fr,
       CAST({hits['es']} AS BIGINT) AS hits_es,
       CASE WHEN {m} = 0 THEN 'und'
            WHEN {hits['en']} = {m} THEN 'en'
            WHEN {hits['de']} = {m} THEN 'de'
            WHEN {hits['fr']} = {m} THEN 'fr'
            ELSE 'es' END AS pred_lang
FROM documents
"""


def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counting."""
    d = _read(spark, sf_dir, "documents")
    return text.token_count_bpe(d, id_col="doc_id")


def sql_token_count_bpe() -> str:
    pat = text.BPE_ISH_PATTERN
    return f"""
SELECT doc_id AS id,
       len({_TOKS}) AS n_tokens_ws,
       len(regexp_extract_all(text, '{pat}')) AS n_tokens_bpe,
       (100 * len(regexp_extract_all(text, '{pat}'))) // greatest(len({_TOKS}), 1) AS bpe_to_ws_x100
FROM documents
"""


def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-subtype field extraction (OGR JSON subtype,
    ogr_core.h:825-828 -> from_json/get_json_object): pull props.k,
    filter and aggregate on it."""
    e = _read(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select("event_id", "event_type", k.alias("k"))
        .filter(F.col("k") >= 50)
    )


def sql_events_json() -> str:
    return """
SELECT event_id, event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
"""


_EVENTS_PARTS = [
    ("json", ["event_type"], ["event_id", "k"]),
    ("buckets", ["bucket_s", "event_type"], ["cnt", "vmin", "vmax", "sum_cents"]),
]


def q_events_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events surface in one gate row: JSON-subtype extraction +
    hourly temporal buckets (each r1/r2-proven individually; bucket
    timestamps rendered as wall-clock strings so both engines compare
    timezone-free)."""
    j = q_events_json(spark, sf_dir).select("event_type", "event_id", "k")
    b = q_events_buckets(spark, sf_dir).select(
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_s"),
        "event_type", "cnt", "vmin", "vmax", "sum_cents",
    )
    return _suite(
        [("json", j, _EVENTS_PARTS[0][1], _EVENTS_PARTS[0][2]),
         ("buckets", b, _EVENTS_PARTS[1][1], _EVENTS_PARTS[1][2])],
        n_str=2, n_num=4,
    )


def sql_events_suite() -> str:
    b = (f"SELECT strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_s, "
         f"event_type, cnt, vmin, vmax, sum_cents FROM ({sql_events_buckets()})")
    return _suite_sql(
        [("json", sql_events_json(), _EVENTS_PARTS[0][1], _EVENTS_PARTS[0][2]),
         ("buckets", b, _EVENTS_PARTS[1][1], _EVENTS_PARTS[1][2])],
        n_str=2, n_num=4,
    )


def _gcp_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pixel-coordinate layer anchored on orders keys (scales with sf):
    one (px, py) on the GCP fixture's 64x48 grid per order key."""
    o = _read(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("id"),
        (F.col("o_orderkey") % 64).cast("double").alias("px"),
        ((F.col("o_orderkey") / 64).cast("bigint") % 48).cast("double").alias("py"),
    )


_GCP_PIX_CTE = ("SELECT o_orderkey AS id, "
                "CAST(o_orderkey % 64 AS DOUBLE) AS px, "
                "CAST((o_orderkey // 64) % 48 AS DOUBLE) AS py FROM orders")

_GCP_PARTS = [
    ("poly1", [], ["id", "rx", "ry"]),
    ("poly2", [], ["id", "rx", "ry"]),
    ("poly3", [], ["id", "rx", "ry"]),
    ("tps", [], ["id", "rx", "ry"]),
    ("rpc_fwd", [], ["id", "rx", "ry"]),
    ("rpc_inv", [], ["id", "rx", "ry"]),
    ("rpc_dem_fwd", [], ["id", "rx", "ry"]),
    ("rpc_dem_inv", [], ["id", "rx", "ry"]),
    ("geoloc_fwd", [], ["id", "rx", "ry"]),
    ("geoloc_inv", [], ["id", "rx", "ry"]),
]

# RPC scene coordinates anchored on orders keys — EXACT doubles in both
# engines (integer remainders scaled by power-of-2-free literals kept
# identical textually)
_RPC_LON = "2.21 + CAST(o_orderkey % 400 AS DOUBLE) * 0.00045"
_RPC_LAT = "48.78 + CAST((o_orderkey DIV 400) % 300 AS DOUBLE) * 0.00047"
_RPC_LON_DUCK = "2.21 + CAST(o_orderkey % 400 AS DOUBLE) * 0.00045"
_RPC_LAT_DUCK = "48.78 + CAST((o_orderkey // 400) % 300 AS DOUBLE) * 0.00047"


def q_gcp_warp_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GCP warp transformers (gdalwarp -order N / -tps): polynomial
    orders 1-3 (alg/gdal_crs.cpp CRS_georef basis, JVM column math)
    and thin-plate spline (alg/thinplatespline.cpp kernel r2*ln(r2),
    Arrow-batched pandas UDF). The fit runs once on the driver over
    the 12-GCP fixture — exactly where GDAL solves it — and the
    distributed APPLY is oracle-checked per row. Poly is bit-exact
    (mm-rounded); TPS rounds at 1e-6 to absorb ln() last-ulp skew."""
    from .operators import gcp_warp

    pix = _gcp_pixels(spark, sf_dir)
    gcps = gcp_warp.gcp_fixture()
    parts = []
    for order in (1, 2, 3):
        m = gcp_warp.fit_polynomial_gcps(gcps, order)
        out = gcp_warp.apply_polynomial(pix, m).select(
            "id", F.round("geo_x", 9).alias("rx"), F.round("geo_y", 9).alias("ry"))
        parts.append((f"poly{order}", out, [], ["id", "rx", "ry"]))
    mt = gcp_warp.fit_tps_gcps(gcps)
    out = gcp_warp.apply_tps(pix, mt).select(
        "id", F.round("geo_x", 6).alias("rx"), F.round("geo_y", 6).alias("ry"))
    parts.append(("tps", out, [], ["id", "rx", "ry"]))
    # RPC transformer (alg/gdal_rpc.cpp), r4: forward runs the oracle's
    # exact expression text JVM-side (bit-exact, pure rational
    # arithmetic); inverse is the 10-step masked fixed-point iteration
    # in Arrow/numpy, micro-degree-rounded (FMA-contraction drift only)
    from .operators import rpc_warp
    rpc = rpc_warp.rpc_fixture()
    o = _read(spark, sf_dir, "orders")
    scene = o.select(
        F.col("o_orderkey").alias("id"),
        F.expr(_RPC_LON).alias("lon"), F.expr(_RPC_LAT).alias("lat"))
    fwd = rpc_warp.apply_rpc_forward_sql(scene, rpc).select(
        "id", F.round("pixel", 6).alias("rx"), F.round("line", 6).alias("ry"))
    parts.append(("rpc_fwd", fwd, [], ["id", "rx", "ry"]))
    inv = rpc_warp.apply_rpc_inverse(
        fwd.select("id", F.col("rx").alias("pixel"), F.col("ry").alias("line")),
        rpc,
    ).select("id", F.round("lon", 6).alias("rx"), F.round("lat", 6).alias("ry"))
    parts.append(("rpc_inv", inv, [], ["id", "rx", "ry"]))
    # RPC_DEM (r5): per-point height from the broadcast DEM chip —
    # forward samples the DEM at (lon, lat) (gdal_rpc.cpp:1923-1948);
    # inverse is the 20-step iterative ray/DEM intersection with the
    # snap quirk, oscillation damping and x10 boost
    # (gdal_rpc.cpp:1128-1360). Scene sits strictly inside the DEM so
    # every point converges in both engines.
    dem = rpc_warp.dem_fixture()
    dfwd = rpc_warp.apply_rpc_forward_dem(scene, rpc, dem).select(
        "id", F.round("pixel", 6).alias("rx"), F.round("line", 6).alias("ry"))
    parts.append(("rpc_dem_fwd", dfwd, [], ["id", "rx", "ry"]))
    dinv = rpc_warp.apply_rpc_inverse_dem(
        dfwd.select("id", F.col("rx").alias("pixel"), F.col("ry").alias("line")),
        rpc, dem,
    ).select("id", F.round("lon", 6).alias("rx"), F.round("lat", 6).alias("ry"))
    parts.append(("rpc_dem_inv", dinv, [], ["id", "rx", "ry"]))
    # geolocation-array transformer (alg/gdalgeoloc.cpp PixelLineToXY):
    # curved-swath grid, bilinear + last-row/col extrapolation
    from .operators import geoloc_warp
    gla = geoloc_warp.swath_fixture()
    swath_pts = o.select(
        F.col("o_orderkey").alias("id"),
        (F.col("o_orderkey") % 1024).cast("double").alias("pixel"),
        ((F.col("o_orderkey") / 1024).cast("bigint") % 768)
        .cast("double").alias("line"))
    gfwd = geoloc_warp.apply_geoloc_forward(swath_pts, gla).select(
        "id", F.round("geo_x", 9).alias("rx"), F.round("geo_y", 9).alias("ry"))
    parts.append(("geoloc_fwd", gfwd, [], ["id", "rx", "ry"]))
    # geoloc inverse (r5): the Newton backmap over the same bilinear
    # surface (gdalgeoloc.cpp GenerateBackMap accuracy target) — fed
    # the rounded forward output exactly like rpc_inv
    ginv = geoloc_warp.apply_geoloc_inverse(
        gfwd.select("id", F.col("rx").alias("geo_x"),
                    F.col("ry").alias("geo_y")), gla,
    ).select("id", (F.round("pixel", 6) + F.lit(0.0)).alias("rx"),
             (F.round("line", 6) + F.lit(0.0)).alias("ry"))
    # (+ 0.0 folds IEEE -0.0 to +0.0 — the px=0 column rounds to a
    # signed zero whose repr() the gate hash distinguishes)
    parts.append(("geoloc_inv", ginv, [], ["id", "rx", "ry"]))
    return _suite(parts, n_str=0, n_num=3)


def sql_gcp_warp_suite() -> str:
    from .operators import gcp_warp

    gcps = gcp_warp.gcp_fixture()
    parts = []
    for order in (1, 2, 3):
        m = gcp_warp.fit_polynomial_gcps(gcps, order)
        xe, ye = gcp_warp.poly_sql_expr(m, "px", "py")
        sql = (f"SELECT id, round({xe}, 9) AS rx, round({ye}, 9) AS ry "
               f"FROM ({_GCP_PIX_CTE})")
        parts.append((f"poly{order}", sql, [], ["id", "rx", "ry"]))
    mt = gcp_warp.fit_tps_gcps(gcps)
    xe, ye = gcp_warp.tps_sql_expr(mt, "px", "py")
    sql = (f"SELECT id, round({xe}, 6) AS rx, round({ye}, 6) AS ry "
           f"FROM ({_GCP_PIX_CTE})")
    parts.append(("tps", sql, [], ["id", "rx", "ry"]))
    from .operators import rpc_warp
    rpc = rpc_warp.rpc_fixture()
    scene_cte = (f"SELECT o_orderkey AS id, {_RPC_LON_DUCK} AS lon, "
                 f"{_RPC_LAT_DUCK} AS lat FROM orders")
    fe, le = rpc_warp.rpc_fwd_sql_exprs(rpc, "lon", "lat")
    fwd_sql = (f"SELECT id, round({fe}, 6) AS rx, round({le}, 6) AS ry "
               f"FROM ({scene_cte})")
    parts.append(("rpc_fwd", fwd_sql, [], ["id", "rx", "ry"]))
    inv_ctes = rpc_warp.rpc_inv_sql_ctes(rpc, "rpc_scene")
    inv_sql = (f"WITH rpc_scene AS (SELECT id, rx AS px, ry AS py "
               f"FROM ({fwd_sql}) s), {inv_ctes} "
               f"SELECT id, round(lon, 6) AS rx, round(lat, 6) AS ry "
               f"FROM rpc_inv")
    parts.append(("rpc_inv", inv_sql, [], ["id", "rx", "ry"]))
    dem = rpc_warp.dem_fixture()
    dfwd_ctes = rpc_warp.rpc_dem_fwd_sql_ctes(
        rpc, dem, rpc_warp.dem_fixture_h_sql, f"({scene_cte})")
    dfwd_sql = (f"WITH {dfwd_ctes} SELECT id, round(pixel, 6) AS rx, "
                f"round(line, 6) AS ry FROM rpc_dem_fwd")
    parts.append(("rpc_dem_fwd", dfwd_sql, [], ["id", "rx", "ry"]))
    dinv_ctes = rpc_warp.rpc_dem_inv_sql_ctes(
        rpc, dem, rpc_warp.dem_fixture_h_sql, "rpc_dem_scene")
    dinv_sql = (f"WITH {dfwd_ctes}, rpc_dem_scene AS "
                f"(SELECT id, round(pixel, 6) AS px, round(line, 6) AS py "
                f"FROM rpc_dem_fwd), {dinv_ctes} "
                f"SELECT id, round(lon, 6) AS rx, round(lat, 6) AS ry "
                f"FROM rpc_dem_inv")
    parts.append(("rpc_dem_inv", dinv_sql, [], ["id", "rx", "ry"]))
    from .operators import geoloc_warp
    swath_cte = ("SELECT o_orderkey AS id, "
                 "CAST(o_orderkey % 1024 AS DOUBLE) AS px, "
                 "CAST((o_orderkey // 1024) % 768 AS DOUBLE) AS py FROM orders")
    g_ctes = geoloc_warp.swath_forward_sql("swath")
    g_sql = (f"WITH swath AS ({swath_cte}), {g_ctes.strip()} "
             f"SELECT id, round(geo_x, 9) AS rx, round(geo_y, 9) AS ry "
             f"FROM geoloc_fwd")
    parts.append(("geoloc_fwd", g_sql, [], ["id", "rx", "ry"]))
    gi_ctes = geoloc_warp.swath_inverse_sql("geoloc_scene")
    gi_sql = (f"WITH swath AS ({swath_cte}), {g_ctes.strip()}, "
              f"geoloc_scene AS (SELECT id, round(geo_x, 9) AS gx, "
              f"round(geo_y, 9) AS gy FROM geoloc_fwd), {gi_ctes} "
              f"SELECT id, round(pixel, 6) + 0.0 AS rx, "
              f"round(line, 6) + 0.0 AS ry FROM geoloc_inv")
    parts.append(("geoloc_inv", gi_sql, [], ["id", "rx", "ry"]))
    return _suite_sql(parts, n_str=0, n_num=3)


def q_raster_sieve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sieve filter: checkerboard raster with a small island burned in;
    the island (9 px < threshold 16) is absorbed by its surrounding
    component (alg/gdalsievefilter.cpp semantics)."""
    base = raster.synth_raster(spark, width=48, height=48, block=16, n_values=2)
    # burn a 3x3 island of value 7 at (20..22, 20..22)
    island = (
        F.col("px").between(20, 22) & F.col("py").between(20, 22)
    )
    px = base.withColumn("value", F.when(island, F.lit(7)).otherwise(F.col("value")))
    out = raster.sieve_filter(px, width=48, threshold=16, tile=32)
    return out.select("px", "py", F.col("value").cast("bigint").alias("value"))


def sql_raster_sieve() -> str:
    # the sieved raster equals the PLAIN checkerboard: the island is
    # absorbed back into the surrounding block (closed-form oracle)
    return """
SELECT r.range % 48 AS px, r.range // 48 AS py,
       (((r.range % 48) // 16) + ((r.range // 48) // 16)) % 2 AS value
FROM range(2304) r
"""


def q_nearblack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nearblack (apps/nearblack_lib.cpp, nMaxNonBlack=0 slice) on a
    48x48 fixture with an irregular near-black collar: per-row depths
    (5*py)%4 / (3*py)%5 and per-column depths (7*px)%4 / (11*px)%5,
    collar values hash%10 <= near_dist=15, interior 50+hash%150 > 15.
    The engine derives the trim from the DATA (row/column run bounds),
    the oracle replays the same scans in SQL — integer-exact."""
    W = 48
    base = spark.range(0, W * W).select(
        (F.col("id") % W).alias("gx"),
        (F.col("id") / W).cast("bigint").alias("gy"),
        F.col("id").alias("pid"),
    )
    h = raster._hash_col(F.col("pid"), raster.SALT_BAND)
    edge = (
        (F.col("gx") < (F.col("gy") * 5) % 4)
        | (F.col("gx") >= W - (F.col("gy") * 3) % 5)
        | (F.col("gy") < (F.col("gx") * 7) % 4)
        | (F.col("gy") >= W - (F.col("gx") * 11) % 5)
    )
    px = base.select(
        "gx", "gy",
        F.when(edge, h % 10).otherwise(F.lit(50) + h % 150).alias("value"),
    )
    out = raster.nearblack(px, near_dist=15, x_col="gx", y_col="gy")
    return out.select("gx", "gy", F.col("value").cast("bigint").alias("value"),
                      F.col("mask").cast("bigint").alias("mask"))


def sql_nearblack() -> str:
    W = 48
    h = _band_val_sql("gy * 48 + gx")
    edge = (f"(gx < (gy * 5) % 4 OR gx >= {W} - (gy * 3) % 5 "
            f"OR gy < (gx * 7) % 4 OR gy >= {W} - (gx * 11) % 5)")
    return f"""
WITH px AS (
  SELECT r.range % {W} AS gx, r.range // {W} AS gy,
         CASE WHEN {edge} THEN ({h}) % 10 ELSE 50 + ({h}) % 150 END AS value
  FROM range({W * W}) r
),
rows_ AS (
  SELECT gy, min(CASE WHEN value > 15 THEN gx END) AS rlo,
         max(CASE WHEN value > 15 THEN gx END) AS rhi
  FROM px GROUP BY gy
),
cols_ AS (
  SELECT gx, min(CASE WHEN value > 15 THEN gy END) AS clo,
         max(CASE WHEN value > 15 THEN gy END) AS chi
  FROM px GROUP BY gx
)
SELECT px.gx, px.gy,
       CASE WHEN rlo IS NULL OR px.gx < rlo OR px.gx > rhi
                 OR clo IS NULL OR px.gy < clo OR px.gy > chi
            THEN 0 ELSE value END AS value,
       CASE WHEN rlo IS NULL OR px.gx < rlo OR px.gx > rhi
                 OR clo IS NULL OR px.gy < clo OR px.gy > chi
            THEN 0 ELSE 255 END AS mask
FROM px JOIN rows_ USING (gy) JOIN cols_ USING (gx)
"""


_PCT_PALETTE = [
    (8 + 16 * k, (48 * k + 5) % 256, 250 - 15 * k) for k in range(16)
]


def q_pct_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rgb2pct nearest-entry assignment + pct2rgb expansion
    (alg/gdaldither.cpp:397 distance rule, osgeo_utils/pct2rgb.py)
    against a FIXED literal 16-color table: per pixel the nearest
    palette index (squared-RGB distance, lowest index on ties) and
    the expanded color packed as r*65536+g*256+b. Median-cut table
    DERIVATION (alg/gdalmediancut.cpp) is driver-side bounded by the
    color cube and is pinned by tests/test_palette.py; this gate row
    pins the distributed assignment/expansion, exact integer math in
    both engines."""
    from .operators import palette as P

    W = 32
    base = spark.range(0, W * W).select(
        (F.col("id") % W).alias("gx"),
        (F.col("id") / W).cast("bigint").alias("gy"),
        F.col("id").alias("pid"),
    )
    px = base.select(
        "gx", "gy",
        (raster._hash_col(F.col("pid"), 301) % 256).alias("r"),
        (raster._hash_col(F.col("pid"), 302) % 256).alias("g"),
        (raster._hash_col(F.col("pid"), 303) % 256).alias("b"),
    )
    out = P.pct2rgb(
        P.rgb2pct(px, _PCT_PALETTE).drop("r", "g", "b"),
        _PCT_PALETTE,
    )
    return out.select(
        "gx", "gy", F.col("idx").cast("bigint").alias("idx"),
        (F.col("r") * 65536 + F.col("g") * 256 + F.col("b"))
        .cast("bigint").alias("rgb"),
    )


def sql_pct_roundtrip() -> str:
    from .operators import palette as P

    W = 32
    def chan(salt: int) -> str:
        return (f"(((((gy * {W} + gx) % {M31}) * {A} + {salt}) % {M31} * {A} "
                f"+ {salt * 7 + 13}) % {M31}) % 256")
    idx = P.assign_expr_duckdb(_PCT_PALETTE, "r", "g", "b")
    pr = "[" + ", ".join(str(p[0]) for p in _PCT_PALETTE) + "]"
    pg = "[" + ", ".join(str(p[1]) for p in _PCT_PALETTE) + "]"
    pb = "[" + ", ".join(str(p[2]) for p in _PCT_PALETTE) + "]"
    return f"""
WITH px AS (
  SELECT r.range % {W} AS gx, r.range // {W} AS gy,
         {chan(301)} AS r, {chan(302)} AS g, {chan(303)} AS b
  FROM range({W * W}) r
),
ix AS (SELECT gx, gy, ({idx}) AS idx FROM px)
SELECT gx, gy, idx,
       {pr}[idx + 1] * 65536 + {pg}[idx + 1] * 256 + {pb}[idx + 1] AS rgb
FROM ix
"""


def q_retile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdal_retile on a 40x40 band, 16x16 tiles with 4 px overlap
    (stride 12, 3x3 tiles, the last stride landing exactly on the
    edge): overlap-band pixels appear in every covering tile;
    tile = (yi-1)*3 + xi linearizes the 1-based indices."""
    W = 40
    px = spark.range(0, W * W).select(
        (F.col("id") % W).alias("gx"),
        (F.col("id") / W).cast("bigint").alias("gy"),
        raster._hash_col(F.col("id"), 401).alias("value"),
    )
    out = raster.retile(px, width=W, height=W, tile_w=16, tile_h=16, overlap=4)
    return out.select(
        ((F.col("yi") - 1) * 3 + F.col("xi")).cast("bigint").alias("tile"),
        F.col("ox").cast("bigint").alias("ox"),
        F.col("oy").cast("bigint").alias("oy"),
        F.col("value").cast("bigint").alias("value"),
    )


def sql_retile() -> str:
    W = 40
    v = (f"(((((gy * {W} + gx) % {M31}) * {A} + 401) % {M31} * {A} "
         f"+ {401 * 7 + 13}) % {M31})")
    return f"""
WITH px AS (
  SELECT r.range % {W} AS gx, r.range // {W} AS gy, {v} AS value
  FROM range({W * W}) r
)
SELECT (ky.range * 3 + kx.range + 1) AS tile,
       gx - kx.range * 12 AS ox, gy - ky.range * 12 AS oy, value
FROM px
JOIN range(3) kx ON gx >= kx.range * 12 AND gx < kx.range * 12 + 16
JOIN range(3) ky ON gy >= ky.range * 12 AND gy < ky.range * 12 + 16
"""


def q_raster_calc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdal_calc-style numpy expression over pixel batches
    (osgeo_utils/gdal_calc.py): A*2 + (A % 7)."""
    band = raster.synth_band(spark, zoom=2, tile_px=8)
    out = raster.raster_calc(
        band.select("gx", "gy", "value"), "A * 2.0 + (A % 7)", value_cols={"A": "value"}
    )
    return out.select("gx", "gy", "value")


def sql_raster_calc() -> str:
    v = _band_val_sql("gy * 32 + gx")
    return f"""
WITH px AS (SELECT r.range % 32 AS gx, r.range // 32 AS gy FROM range(1024) r)
SELECT gx, gy, CAST(({v}) AS DOUBLE) * 2.0 + CAST(({v}) % 7 AS DOUBLE) AS value FROM px
"""


def q_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity map on the checkerboard: min squared distance to the
    nearest value-1 pixel within 4 px (exact euclidean, int-only)."""
    from .operators import focal

    px = raster.synth_raster(spark, width=48, height=48, block=12, n_values=2)
    band = px.select(F.col("px").alias("gx"), F.col("py").alias("gy"), "value")
    return focal.proximity(band, target=1, max_dist=4)


def sql_proximity() -> str:
    return """
WITH px AS (
  SELECT r.range % 48 AS gx, r.range // 48 AS gy,
         (((r.range % 48) // 12) + ((r.range // 48) // 12)) % 2 AS value
  FROM range(2304) r
),
t AS (SELECT gx AS tx, gy AS ty FROM px WHERE value = 1),
offs AS (
  SELECT a.range - 4 AS dx, b.range - 4 AS dy
  FROM range(9) a CROSS JOIN range(9) b
  WHERE (a.range - 4) * (a.range - 4) + (b.range - 4) * (b.range - 4) <= 16
),
served AS (
  SELECT tx + dx AS gx, ty + dy AS gy, min(dx * dx + dy * dy) AS d2
  FROM t CROSS JOIN offs GROUP BY 1, 2
)
SELECT px.gx, px.gy, served.d2 FROM px JOIN served USING (gx, gy)
"""


def q_footprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Footprint: bounding boxes + sizes of valid-data (value=1)
    components of the checkerboard mask."""
    from .operators import focal

    px = raster.synth_raster(spark, width=48, height=48, block=12, n_values=2)
    return focal.footprint(px, width=48, valid=1, tile=32)


def sql_footprint() -> str:
    # checkerboard blocks with (bx+by) odd are the value-1 components;
    # each block is its own 4-connected component (closed form)
    return """
WITH px AS (
  SELECT r.range % 48 AS gx, r.range // 48 AS gy,
         (gx // 12) AS bx, (gy // 12) AS by
  FROM range(2304) r
)
SELECT min(gy * 48 + gx) AS label,
       min(gx) AS minx, min(gy) AS miny, max(gx) AS maxx, max(gy) AS maxy,
       count(*) AS n_pixels
FROM px WHERE (bx + by) % 2 = 1
GROUP BY bx, by
"""


def q_hillshade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hillshade (gdaldem) at the default sun, on the tile-array model
    (one halo shuffle + numpy stencil); rounded to 6dp (trig)."""
    from .operators import tile_raster

    band = raster.synth_band(spark, zoom=2, tile_px=8)
    tiles = tile_raster.tiles_from_pixels(band, tile=8)
    out = tile_raster.hillshade_tiles(tiles, tile=8, nty=4, ntx=4,
                                      z_factor=1.0, azimuth_deg=315.0,
                                      altitude_deg=45.0)
    px = tile_raster.pixels_from_tiles(out, tile=8, col="shade", out="shade")
    return px.select("gx", "gy", F.round("shade", 6).alias("shade"))


def _horn_grad_sql(W: int) -> tuple[str, str]:
    """(dzdx, dzdy) Horn-gradient SQL over the synth band with the
    same 'center' edge convention as tile_raster.neighbors_3x3."""
    def v(dx: int, dy: int) -> str:
        if dx == 0 and dy == 0:
            return _band_val_sql(f"gy * {W} + gx")
        inside = (
            f"gx + ({dx}) >= 0 AND gx + ({dx}) <= {W - 1} "
            f"AND gy + ({dy}) >= 0 AND gy + ({dy}) <= {W - 1}"
        )
        return (
            f"(CASE WHEN {inside} THEN {_band_val_sql(f'(gy + ({dy})) * {W} + gx + ({dx})')} "
            f"ELSE {_band_val_sql(f'gy * {W} + gx')} END)"
        )

    dzdx = (
        f"((({v(1,-1)}) + 2 * ({v(1,0)}) + ({v(1,1)})) "
        f"- (({v(-1,-1)}) + 2 * ({v(-1,0)}) + ({v(-1,1)}))) / 8.0"
    )
    dzdy = (
        f"((({v(-1,1)}) + 2 * ({v(0,1)}) + ({v(1,1)})) "
        f"- (({v(-1,-1)}) + 2 * ({v(0,-1)}) + ({v(1,-1)}))) / 8.0"
    )
    return dzdx, dzdy


def sql_hillshade() -> str:
    import math

    W = 32
    dzdx, dzdy = _horn_grad_sql(W)
    az = math.radians(315.0)
    alt = math.radians(45.0)
    # embed the Python-computed sun constants verbatim so both engines
    # multiply by the identical doubles
    return f"""
WITH px AS (SELECT r.range % {W} AS gx, r.range // {W} AS gy FROM range({W * W}) r),
g AS (SELECT gx, gy, ({dzdx}) AS dzdx, ({dzdy}) AS dzdy FROM px),
s AS (
  SELECT gx, gy, atan(1.0 * sqrt(dzdx * dzdx + dzdy * dzdy)) AS slope,
         atan2(-(dzdy), -dzdx) AS aspect
  FROM g
)
SELECT gx, gy,
       round(greatest(0.0, 255.0 * ({math.sin(alt)!r} * cos(slope)
             + {math.cos(alt)!r} * sin(slope) * cos({az - math.pi / 2.0!r} - aspect))), 6) AS shade
FROM s
"""


def _q_hillshade_variant(spark: SparkSession, variant: str) -> DataFrame:
    """Shared fixture/pipeline for the non-default gdaldem hillshade
    flavors (combined / multidirectional / igor) on the tile model."""
    from .operators import tile_raster

    band = raster.synth_band(spark, zoom=2, tile_px=8)
    tiles = tile_raster.tiles_from_pixels(band, tile=8)
    out = tile_raster.hillshade_variant_tiles(
        tiles, tile=8, nty=4, ntx=4, variant=variant,
        z_factor=1.0, azimuth_deg=315.0, altitude_deg=45.0)
    px = tile_raster.pixels_from_tiles(out, tile=8, col="shade", out="shade")
    return px.select("gx", "gy", F.round("shade", 6).alias("shade"))


def q_hillshade_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdaldem hillshade -combined (GDALHillshadeCombinedAlg,
    apps/gdaldem_lib.cpp:1140): oblique shading modulated by slope."""
    return _q_hillshade_variant(spark, "combined")


def q_hillshade_multidir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdaldem hillshade -multidirectional (USGS OF 92-422 blend,
    apps/gdaldem_lib.cpp:1238)."""
    return _q_hillshade_variant(spark, "multidirectional")


def q_hillshade_igor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdaldem hillshade -igor (GDALHillshadeIgorAlg,
    apps/gdaldem_lib.cpp:943): shadowness ramp."""
    return _q_hillshade_variant(spark, "igor")


_HS_W = 32  # synth_band(zoom=2, tile_px=8)


def sql_hillshade_combined() -> str:
    import math

    alt = math.radians(45.0)
    az = math.radians(315.0)
    z = 1.0
    sin_alt = math.sin(alt)
    c_caz = math.cos(az) * math.cos(alt) * z
    c_saz = math.sin(az) * math.cos(alt) * z
    zsq = z * z
    inv = 1.0 / ((math.pi * math.pi) / 4.0)
    dzdx, dzdy = _horn_grad_sql(_HS_W)
    return f"""
WITH px AS (SELECT r.range % {_HS_W} AS gx, r.range // {_HS_W} AS gy FROM range({_HS_W * _HS_W}) r),
g AS (SELECT gx, gy, ({dzdx}) AS dzdx, ({dzdy}) AS dzdy FROM px),
v AS (SELECT gx, gy, -(dzdx) AS xg, -(dzdy) AS yg FROM g),
s AS (SELECT gx, gy, ((xg * xg + yg * yg) * {zsq!r}) AS slope,
             ({sin_alt!r} - (yg * {c_caz!r} - xg * {c_saz!r})) AS num
      FROM v),
c AS (SELECT gx, gy,
             (1.0 - (acos(least(1.0, greatest(-1.0, num / sqrt(1.0 + slope))))
              * atan(sqrt(slope))) * {inv!r}) AS comb
      FROM s)
SELECT gx, gy,
       round(CASE WHEN comb <= 0.0 THEN 1.0 ELSE 1.0 + 254.0 * comb END, 6) AS shade
FROM c
"""


def sql_hillshade_multidir() -> str:
    import math

    alt = math.radians(45.0)
    z = 1.0
    sin_alt = math.sin(alt)
    zsq = z * z
    s127 = 127.0 * sin_alt
    s254 = 254.0 * sin_alt
    c225 = math.cos(math.radians(225.0)) * math.cos(alt) * z * 127.0
    calt127 = math.cos(alt) * z * 127.0
    dzdx, dzdy = _horn_grad_sql(_HS_W)
    return f"""
WITH px AS (SELECT r.range % {_HS_W} AS gx, r.range // {_HS_W} AS gy FROM range({_HS_W * _HS_W}) r),
g AS (SELECT gx, gy, ({dzdx}) AS dzdx, ({dzdy}) AS dzdy FROM px),
v AS (SELECT gx, gy, -(dzdx) AS xg, -(dzdy) AS yg FROM g),
m AS (SELECT gx, gy, xg, yg, xg * xg AS xx, yg * yg AS yy, xg * xg + yg * yg AS xpy FROM v),
w AS (SELECT gx, gy, xx, yy, xpy,
             greatest(0.0, {s127!r} + (xg - yg) * {c225!r}) AS v225,
             greatest(0.0, {s127!r} - xg * {calt127!r}) AS v270,
             greatest(0.0, {s127!r} + (xg + yg) * {c225!r}) AS v315,
             greatest(0.0, {s127!r} - yg * {calt127!r}) AS v360,
             0.5 * xpy - xg * yg AS w225
      FROM m),
b AS (SELECT gx, gy, xpy,
             ((w225 * v225 + xx * v270 + (xpy - w225) * v315 + yy * v360) / xpy)
             / sqrt(1.0 + {zsq!r} * xpy) AS blend
      FROM w)
SELECT gx, gy,
       round(CASE WHEN xpy = 0.0 THEN {1.0 + s254!r} ELSE 1.0 + blend END, 6) AS shade
FROM b
"""


def sql_hillshade_igor() -> str:
    import math

    z = 1.0
    deg = 180.0 / math.pi
    two_pi = 2.0 * math.pi
    az = math.radians(315.0)
    ref_az = math.fmod(1.5 * math.pi - az, two_pi)
    if ref_az < 0.0:
        ref_az += two_pi
    dzdx, dzdy = _horn_grad_sql(_HS_W)
    return f"""
WITH px AS (SELECT r.range % {_HS_W} AS gx, r.range // {_HS_W} AS gy FROM range({_HS_W * _HS_W}) r),
g AS (SELECT gx, gy, ({dzdx}) AS dzdx, ({dzdy}) AS dzdy FROM px),
s AS (SELECT gx, gy,
             atan(sqrt(dzdx * dzdx + dzdy * dzdy) * {z!r}) * {deg!r} AS slope_deg,
             fmod(atan2(dzdy, -dzdx), {two_pi!r}) AS na0
      FROM g),
n AS (SELECT gx, gy, slope_deg,
             CASE WHEN na0 < 0.0 THEN na0 + {two_pi!r} ELSE na0 END AS na
      FROM s),
d AS (SELECT gx, gy, slope_deg, abs(na - {ref_az!r}) AS adiff FROM n),
e AS (SELECT gx, gy, slope_deg,
             CASE WHEN adiff > {math.pi!r} THEN {two_pi!r} - adiff ELSE adiff END AS adiff2
      FROM d)
SELECT gx, gy,
       round(255.0 * (1.0 - (slope_deg / 90.0) * (1.0 - adiff2 / {math.pi!r})), 6) AS shade
FROM e
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-text rolling polynomial fingerprint."""
    d = _read(spark, sf_dir, "documents")
    return text.doc_fingerprint(d, id_col="doc_id")


def sql_doc_fingerprint() -> str:
    return f"""
SELECT doc_id AS id,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
         list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
         (h, c) -> (h * 31 + c) % {M31}) AS fp
FROM documents
"""


def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 over quantized embeddings (exact int
    dot/norms; the ANN baseline)."""
    e = _read(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    out = similarity.brute_force_topk(e, q, k=5, id_col="vec_id")
    return out.select("query_id", "neighbor_id", F.col("rank").alias("rnk"))


def sql_similarity_topk() -> str:
    sc = similarity.SCALE
    return f"""
WITH qv AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {sc}) AS BIGINT)) AS v
  FROM embeddings
),
n AS (SELECT vec_id, v, CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS n2 FROM qv),
q AS (SELECT * FROM n WHERE vec_id < 20),
d0 AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid, q.n2 AS naa, c.n2 AS nbb,
         q.v AS v_q, c.v AS v_c
  FROM q CROSS JOIN n c WHERE c.vec_id != q.vec_id
),
e AS (SELECT qid, cid, naa, nbb, unnest(v_q) AS xa, unnest(v_c) AS xb FROM d0),
dp AS (SELECT qid, cid, naa, nbb, CAST(sum(xa * xb) AS BIGINT) AS dot FROM e GROUP BY 1, 2, 3, 4),
r AS (
  SELECT qid, cid, row_number() OVER (
    PARTITION BY qid
    ORDER BY (CASE WHEN dot > 0 THEN CAST(1 AS DOUBLE) WHEN dot < 0 THEN CAST(-1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END)
             * (CAST(dot * dot AS DOUBLE) / CAST(naa * nbb AS DOUBLE)) DESC,
             cid ASC) AS rnk
  FROM dp
)
SELECT qid AS query_id, cid AS neighbor_id, rnk FROM r WHERE rnk <= 5
"""


def q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN. Approximate vs brute force by construction,
    but DETERMINISTIC given the derived centroids — so it now carries a
    full exact oracle (sql_similarity_ivf replays bucketing + probe +
    ranking); recall vs brute force is measured in tests."""
    e = _read(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    out = similarity.ivf_topk(e, q, k=5, n_centroids=8, n_probe=2, id_col="vec_id")
    return out.select("query_id", "neighbor_id", F.col("rank").alias("rnk"))


def sql_similarity_ivf() -> str:
    # corpus single-assign (rn = 1); queries (vec_id < 20) probe top-2
    ctes = similarity.ivf_sql_ctes(dim=64, n_centroids=8, n_assign=1)
    key = similarity.RANK_KEY_SQL.format(dot="dot", naa="naa", nbb="nbb")
    return f"""
WITH {ctes.strip()},
probe AS (SELECT vec_id, v, n2, cent_id FROM rk WHERE rn <= 2 AND vec_id < 20),
cand AS (
  SELECT p.vec_id AS qid, c.vec_id AS cid, p.n2 AS naa, c.n2 AS nbb,
         CAST(list_sum(list_transform(range(64), i -> p.v[i+1] * c.v[i+1])) AS BIGINT) AS dot
  FROM probe p JOIN asg c ON c.cent_id = p.cent_id AND c.vec_id != p.vec_id
),
r AS (
  SELECT qid, cid,
         row_number() OVER (PARTITION BY qid ORDER BY {key} DESC, cid ASC) AS rnk
  FROM cand
)
SELECT qid AS query_id, cid AS neighbor_id, rnk FROM r WHERE rnk <= 5
"""


_FS_PARTS = [
    ("stub", ["media_ref"],
     ["doc_id", "frame_idx", "frame_off", "frame_len", "frame_checksum"]),
    ("avi", [], ["doc_id", "frame_idx", "n_frames", "width", "height"]),
]


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling in one gate row: (stub) the fixed-stride
    byte slicer over VID0 payloads, and (avi, r5) a REAL demux-decode
    path — deterministic MJPEG AVIs (own RIFF writer around own JPEG
    frames), every 2nd frame demuxed and JPEG-decoded; the oracle
    replays frame indexes/counts/dims from the closed generation rule,
    so a wrong container offset or an undecodable frame fails the
    hash."""
    d = _read(spark, sf_dir, "documents")
    m = multimodal.attach_media(d, id_col="doc_id")
    stub = multimodal.frame_sample(m, every_k=4, frame_bytes=16)
    avi = multimodal.video_frame_sample(
        multimodal.attach_avi_media(d, id_col="doc_id"), every_k=2)
    return _suite(
        [("stub", stub, _FS_PARTS[0][1], _FS_PARTS[0][2]),
         ("avi", avi, _FS_PARTS[1][1], _FS_PARTS[1][2])],
        n_str=1, n_num=5,
    )


def sql_frame_sample() -> str:
    chunk = "substring(text, fi * 16 + 1, 16)"
    csum = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({chunk}, ''), c -> CAST(ascii(c) AS BIGINT))), "
        "(a, b) -> a + b)"
    )
    stub = f"""
WITH v AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2),
f AS (
  SELECT doc_id, text, CAST(ff.range AS INT) AS fi
  FROM v CROSS JOIN range(0, 1000, 4) ff
  WHERE ff.range < length(text) // 16
)
SELECT doc_id, 'm://' || CAST(doc_id AS VARCHAR) AS media_ref,
       fi AS frame_idx,
       CAST(4 + fi * 16 AS BIGINT) AS frame_off,
       16 AS frame_len,
       {csum} AS frame_checksum
FROM f
"""
    avi = f"""
SELECT doc_id, CAST(ff.range AS BIGINT) AS frame_idx,
       CAST(3 + doc_id % 4 AS BIGINT) AS n_frames,
       CAST({multimodal.AVI_W} AS BIGINT) AS width,
       CAST({multimodal.AVI_H} AS BIGINT) AS height
FROM documents CROSS JOIN range(0, 7, 2) ff
WHERE ff.range < 3 + doc_id % 4
"""
    return _suite_sql(
        [("stub", stub, _FS_PARTS[0][1], _FS_PARTS[0][2]),
         ("avi", avi, _FS_PARTS[1][1], _FS_PARTS[1][2])],
        n_str=1, n_num=5,
    )


_MM_PARTS = [
    ("meta", ["media_ref", "magic", "kind"],
     ["doc_id", "n_bytes", "width", "height", "checksum"]),
    ("png", [], ["doc_id", "width", "height", "px_sum", "px_min", "px_max"]),
    ("wav", [], ["doc_id", "n_samples", "sample_rate", "s_sum", "s_min",
                 "s_max", "zero_cross"]),
]


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal surface in one gate row: (meta) synth payloads +
    Arrow-batched metadata extraction through the decode stub, and
    (png, r5) a REAL image decode — deterministic grayscale PNGs
    encoded with the engine's own stdlib-zlib codec, decoded back and
    feature-extracted; the oracle grades the round-trip from the
    closed-form pixel rule, so a single wrong byte anywhere in
    encode/decode fails the hash."""
    d = _read(spark, sf_dir, "documents")
    m = multimodal.attach_media(d, id_col="doc_id")
    meta = multimodal.extract_media_meta(m)
    png = multimodal.image_features(
        multimodal.attach_png_media(d, id_col="doc_id"))
    wav = multimodal.audio_features(
        multimodal.attach_wav_media(d, id_col="doc_id"))
    return _suite(
        [("meta", meta, _MM_PARTS[0][1], _MM_PARTS[0][2]),
         ("png", png, _MM_PARTS[1][1], _MM_PARTS[1][2]),
         ("wav", wav, _MM_PARTS[2][1], _MM_PARTS[2][2])],
        n_str=3, n_num=7,
    )


def sql_multimodal_meta() -> str:
    kind = "CASE doc_id % 3 WHEN 0 THEN 'IMG0' WHEN 1 THEN 'AUD0' ELSE 'VID0' END"
    nb = "4 + length(text)"
    meta = f"""
SELECT doc_id,
       'm://' || CAST(doc_id AS VARCHAR) AS media_ref,
       CAST({nb} AS BIGINT) AS n_bytes,
       {kind} AS magic,
       {kind} AS kind,
       CAST(16 + ({nb}) % 64 AS INTEGER) AS width,
       CAST(16 + (({nb}) * 7) % 64 AS INTEGER) AS height,
       CAST(list_sum(list_transform(string_split({kind} || text, ''),
            c -> CAST(ascii(c) AS BIGINT))) AS BIGINT) AS checksum
FROM documents
"""
    # png decode round-trip graded from the closed-form pixel rule
    # pixel(k) = (doc_id*31 + k) % 256 over n = w*h pixels:
    # sum_{j=b}^{b+n-1} (j % 256) = S(b+n) - S(b),
    # S(m) = (m // 256) * 32640 + t*(t-1)/2 with t = m % 256
    s_of = ("(({m}) // 256) * 32640"
            " + ((({m}) % 256) * ((({m}) % 256) - 1)) // 2")
    png = f"""
SELECT doc_id,
       CAST(8 + doc_id % 9 AS BIGINT) AS width,
       CAST(8 + (doc_id * 3) % 7 AS BIGINT) AS height,
       CAST({s_of.format(m='b + n')} - ({s_of.format(m='b')}) AS BIGINT)
         AS px_sum,
       CAST(CASE WHEN b + n > 256 THEN 0 ELSE b END AS BIGINT) AS px_min,
       CAST(CASE WHEN b + n >= 256 THEN 255 ELSE b + n - 1 END AS BIGINT)
         AS px_max
FROM (SELECT doc_id, (doc_id * 31) % 256 AS b,
             (8 + doc_id % 9) * (8 + (doc_id * 3) % 7) AS n
      FROM documents)
"""
    # wav decode round-trip graded sample-exactly: the oracle
    # regenerates every PCM sample ((b + 13k) % 65536) - 32768 via a
    # CROSS JOIN range(N) and aggregates; zero crossings via lag()
    wav = f"""
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST({multimodal.WAV_RATE} AS BIGINT) AS sample_rate,
       CAST(sum(v) AS BIGINT) AS s_sum,
       CAST(min(v) AS BIGINT) AS s_min,
       CAST(max(v) AS BIGINT) AS s_max,
       CAST(sum(CASE WHEN prev_nonneg IS NOT NULL
                      AND (v >= 0) <> prev_nonneg THEN 1 ELSE 0 END)
            AS BIGINT) AS zero_cross
FROM (
  SELECT doc_id, k, v,
         lag(v >= 0) OVER (PARTITION BY doc_id ORDER BY k) AS prev_nonneg
  FROM (
    SELECT doc_id, r.range AS k,
           ((doc_id * 17 + 13 * r.range) % 65536) - 32768 AS v
    FROM documents CROSS JOIN range({multimodal.WAV_N}) r
  )
)
GROUP BY doc_id
"""
    return _suite_sql(
        [("meta", meta, _MM_PARTS[0][1], _MM_PARTS[0][2]),
         ("png", png, _MM_PARTS[1][1], _MM_PARTS[1][2]),
         ("wav", wav, _MM_PARTS[2][1], _MM_PARTS[2][2])],
        n_str=3, n_num=7,
    )


# ================================================================ registry

def q_ogr_like_escape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE with an explicit ESCAPE character (OGR SQL swq LIKE
    semantics, ogr/swq_op_general.cpp): literal % and _ matched via
    escape — the previously-unpinned corner of the LIKE surface."""
    o = _read(spark, sf_dir, "orders")
    s = F.concat(
        F.lit("a"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("%")).otherwise(F.lit("x")),
        F.lit("b_"),
        F.col("o_orderkey").cast("string"),
    )
    d = o.select(F.col("o_orderkey").alias("id"), s.alias("s"))
    return d.select(
        "id",
        F.expr(r"s LIKE 'a!%b!_%' ESCAPE '!'").alias("lit_both"),
        F.expr(r"s LIKE 'a_b!_%' ESCAPE '!'").alias("any_then_lit"),
        F.expr(r"s LIKE 'a%b\_%' ESCAPE '\\'").alias("backslash_esc"),
    )


def sql_ogr_like_escape() -> str:
    return r"""
SELECT o_orderkey AS id,
       s LIKE 'a!%b!_%' ESCAPE '!' AS lit_both,
       s LIKE 'a_b!_%' ESCAPE '!' AS any_then_lit,
       s LIKE 'a%b\_%' ESCAPE '\' AS backslash_esc
FROM (
  SELECT o_orderkey,
         'a' || (CASE WHEN o_orderkey % 3 = 0 THEN '%' ELSE 'x' END)
             || 'b_' || CAST(o_orderkey AS VARCHAR) AS s
  FROM orders
)
"""


def _lcc_pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-derived points inside the Lambert-93 validity box."""
    c = _read(spark, sf_dir, "customer")
    i = F.col("c_custkey")
    return c.select(
        i.alias("id"),
        (F.lit(-4.0) + F.lit(11.0) * docs.hash01_col(i, 91)).alias("lon"),
        (F.lit(42.5) + F.lit(8.0) * docs.hash01_col(i, 92)).alias("lat"),
    )


def _ps_pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arctic points for the EPSG:3413 polar stereographic path."""
    c = _read(spark, sf_dir, "customer")
    i = F.col("c_custkey")
    return c.select(
        i.alias("id"),
        (F.lit(-180.0) + F.lit(360.0) * docs.hash01_col(i, 93)).alias("lon"),
        (F.lit(61.0) + F.lit(27.0) * docs.hash01_col(i, 94)).alias("lat"),
    )


def _proj_roundtrip(pts: DataFrame, epsg: int) -> DataFrame:
    """4326 -> epsg -> 4326 through the reproject_udf closed-form
    dispatch; emits mm-rounded projected + nano-degree round-trip."""
    from .operators import reproject

    fwd = reproject.reproject_udf(pts, 4326, epsg).select(
        "id", F.col("x_dst").alias("e"), F.col("y_dst").alias("n")
    )
    rt = reproject.reproject_udf(fwd, epsg, 4326, lon="e", lat="n")
    return rt.select(
        "id",
        F.round("e", 3).alias("e_mm"), F.round("n", 3).alias("n_mm"),
        F.round("x_dst", 9).alias("lon_rt"), F.round("y_dst", 9).alias("lat_rt"),
    )


_LCC_COLS = ["id", "e_mm", "n_mm", "lon_rt", "lat_rt"]


def q_reproject_lcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form conic reprojection (ogrct.cpp:2254 batch semantics
    without PROJ): Lambert-93 (EPSG:2154, LCC 2SP on GRS80) and NSIDC
    polar stereographic north (EPSG:3413, variant B) — forward
    mm-rounded + nano-degree round-trip, executed through the
    reproject_udf closed-form dispatch (kernels.conic re-derives
    Snyder 15-1..15-11 / 21-33..21-41; constants shared as float
    literals with the SQL oracle, fixed 8-round inverse iteration)."""
    lcc = _proj_roundtrip(_lcc_pts(spark, sf_dir), 2154)
    ps = _proj_roundtrip(_ps_pts(spark, sf_dir), 3413)
    return _suite([("lcc", lcc, [], _LCC_COLS), ("stereo", ps, [], _LCC_COLS)],
                  n_str=0, n_num=5)


def sql_reproject_lcc() -> str:
    from .kernels import conic

    lcc_pts = (
        f"SELECT c_custkey AS id, "
        f"-4.0 + 11.0 * ({derive.hash01_sql('c_custkey', 91)}) AS lon, "
        f"42.5 + 8.0 * ({derive.hash01_sql('c_custkey', 92)}) AS lat FROM customer"
    )
    ps_pts = (
        f"SELECT c_custkey AS id, "
        f"-180.0 + 360.0 * ({derive.hash01_sql('c_custkey', 93)}) AS lon, "
        f"61.0 + 27.0 * ({derive.hash01_sql('c_custkey', 94)}) AS lat FROM customer"
    )
    sel = ("SELECT f.id, round(f.easting, 3) AS e_mm, round(f.northing, 3) AS n_mm, "
           "round(i.lon, 9) AS lon_rt, round(i.lat, 9) AS lat_rt")
    lcc_sql = f"""
WITH pts AS ({lcc_pts}),
{conic.lcc_forward_sql_ctes('pts', conic.LAMBERT93).strip()},
fe2 AS (SELECT id, easting, northing FROM lcc_fwd),
{conic.lcc_inverse_sql_ctes('fe2', conic.LAMBERT93).strip()}
{sel} FROM fe2 f JOIN lcc_inv i USING (id)
"""
    ps_sql = f"""
WITH pts AS ({ps_pts}),
{conic.ps_forward_sql_ctes('pts', conic.NSIDC_NORTH).strip()},
fe2 AS (SELECT id, easting, northing FROM ps_fwd),
{conic.ps_inverse_sql_ctes('fe2', conic.NSIDC_NORTH).strip()}
{sel} FROM fe2 f JOIN ps_inv i USING (id)
"""
    return _suite_sql(
        [("lcc", lcc_sql, [], _LCC_COLS), ("stereo", ps_sql, [], _LCC_COLS)],
        n_str=0, n_num=5,
    )


def q_ogr_special_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OGR special fields OGR_GEOM_WKT + OGR_STYLE + OGR_GEOM_AREA
    (ogr/ogr_p.h:167-174 SpecialFieldNames): per supplier, an
    axis-aligned rectangle with a deterministic PEN style string —
    the WKT text, the style and the shoelace area as selectable
    columns, the swq special-field projection surface."""
    from .functions import geometry as G

    s = _read(spark, sf_dir, "supplier")
    i = F.col("s_suppkey")
    x0 = F.lit(-160.0) + F.lit(300.0) * docs.hash01_col(i, 101)
    y0 = F.lit(-70.0) + F.lit(120.0) * docs.hash01_col(i, 102)
    w = F.lit(2.0) + F.lit(6.0) * docs.hash01_col(i, 103)
    h = F.lit(1.5) + F.lit(4.0) * docs.hash01_col(i, 104)
    d = s.select(
        i.alias("id"),
        F.array(x0, x0 + w, x0 + w, x0).alias("xs"),
        F.array(y0, y0, y0 + h, y0 + h).alias("ys"),
    )
    style = F.expr(
        "concat('PEN(c:#', format_string('%06x', (id * 2654435761) % 16777216), "
        "',w:', cast(1 + id % 5 as string), 'px)')"
    )
    # OGR_GEOMETRY (ogr_p.h SPF_OGR_GEOMETRY) = getGeometryName() of
    # the feature's geometry; the fixture tags each id with a wkb flat
    # code (1 + id%3) the way a mixed layer would carry wkbType
    gname = G.ogr_geometry_name_expr("1 + id % 3")
    return d.select(
        "id",
        G.wkt_polygon_expr().alias("geom_wkt"),
        style.alias("ogr_style"),
        gname.alias("ogr_geometry"),
        F.round(G.shoelace_area_expr(), 9).alias("area"),
    )


def sql_ogr_special_fields() -> str:
    from .functions import geometry as G

    hx = lambda s: derive.hash01_sql("s_suppkey", s)
    wkt = G.wkt_polygon_sql("xs", "ys")
    shoelace = (
        "abs(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(range(1, len(xs) + 1), i -> "
        "xs[i] * ys[1 + i % len(xs)] - xs[1 + i % len(xs)] * ys[i])), "
        "(a, b) -> a + b)) / 2"
    )
    return f"""
WITH k AS (
  SELECT s_suppkey AS id,
         -160.0 + 300.0 * ({hx(101)}) AS x0,
         -70.0 + 120.0 * ({hx(102)}) AS y0,
         2.0 + 6.0 * ({hx(103)}) AS w,
         1.5 + 4.0 * ({hx(104)}) AS h
  FROM supplier
),
g AS (
  SELECT id, [x0, x0 + w, x0 + w, x0] AS xs, [y0, y0, y0 + h, y0 + h] AS ys
  FROM k
)
SELECT id,
       {wkt} AS geom_wkt,
       'PEN(c:#' || printf('%06x', (id * 2654435761) % 16777216)
         || ',w:' || CAST(1 + id % 5 AS VARCHAR) || 'px)' AS ogr_style,
       CASE 1 + id % 3 WHEN 1 THEN 'POINT' WHEN 2 THEN 'LINESTRING'
            ELSE 'POLYGON' END AS ogr_geometry,
       round({shoelace}, 9) AS area
FROM g
"""


_GF_K, _GF_M = 12, 6   # outer ellipse vertices / strict-interior points


def q_geometry_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_ConvexHull + ST_Centroid + geodesic area
    (ogrgeometry.cpp:4188, :6108; ogrsqlitesqlfunctions.cpp): per
    supplier, a 12-vertex ellipse ring plus 6 strictly interior
    points. The monotone-chain hull must recover exactly the 12 outer
    vertices (nv_hull pins it); hull area, area-weighted centroid and
    Chamberlain-Duquette spherical area have closed-form oracles
    (inscribed-polygon area (K/2) rx ry sin(2pi/K); centroid = the
    center by symmetry; the spherical fold replayed term-by-term)."""
    import math as _m

    from .functions import geometry as G

    s = _read(spark, sf_dir, "supplier")
    i = F.col("s_suppkey")
    cx = F.lit(-150.0) + F.lit(300.0) * docs.hash01_col(i, 95)
    cy = F.lit(-55.0) + F.lit(110.0) * docs.hash01_col(i, 96)
    rx = F.lit(2.0) + F.lit(3.0) * docs.hash01_col(i, 97)
    ry = F.lit(1.5) + F.lit(2.0) * docs.hash01_col(i, 98)
    outer_x = [cx + rx * F.cos(F.lit(2.0 * _m.pi * j / _GF_K)) for j in range(_GF_K)]
    outer_y = [cy + ry * F.sin(F.lit(2.0 * _m.pi * j / _GF_K)) for j in range(_GF_K)]
    inner_x = [cx + rx * F.lit(0.35) * F.cos(F.lit(0.3 + 2.0 * _m.pi * j / _GF_M))
               for j in range(_GF_M)]
    inner_y = [cy + ry * F.lit(0.35) * F.sin(F.lit(0.3 + 2.0 * _m.pi * j / _GF_M))
               for j in range(_GF_M)]
    # point-on-surface fixture: an axis-aligned U (non-convex, TWO
    # prong intervals on the bisector line; left prong strictly wider)
    # — the engine runs the full GEOS InteriorPointArea scanline, the
    # oracle emits the closed form (ux0 + a1/2, (b + hgt)-midline)
    ux0 = F.lit(-170.0) + F.lit(300.0) * docs.hash01_col(i, 121)
    uy0 = F.lit(-60.0) + F.lit(100.0) * docs.hash01_col(i, 122)
    uw = F.lit(8.0) + F.lit(4.0) * docs.hash01_col(i, 123)
    uh = F.lit(6.0) + F.lit(3.0) * docs.hash01_col(i, 124)
    a1 = F.lit(2.0) + F.lit(1.0) * docs.hash01_col(i, 125)
    a2 = F.lit(1.0) + F.lit(0.5) * docs.hash01_col(i, 126)
    ub = F.lit(1.0) + F.lit(0.5) * docs.hash01_col(i, 127)
    # ST_Distance fixture: two diagonally-separated disjoint rectangles
    # — the nearest features are opposing corners, so the closed-form
    # oracle is the corner gap while the engine runs the full
    # segment-pair clamped-projection kernel
    ax0 = F.lit(-100.0) + F.lit(150.0) * docs.hash01_col(i, 131)
    ay0 = F.lit(-40.0) + F.lit(60.0) * docs.hash01_col(i, 132)
    wa = F.lit(2.0) + F.lit(2.0) * docs.hash01_col(i, 133)
    ha = F.lit(2.0) + F.lit(2.0) * docs.hash01_col(i, 134)
    gpx = F.lit(1.0) + F.lit(3.0) * docs.hash01_col(i, 135)
    gpy = F.lit(1.0) + F.lit(3.0) * docs.hash01_col(i, 136)
    bx0 = ax0 + wa + gpx
    by0 = ay0 + ha + gpy
    wb = F.lit(2.0) + docs.hash01_col(i, 137)
    hb = F.lit(2.0) + docs.hash01_col(i, 138)
    d = s.select(
        i.alias("id"),
        F.array(*outer_x, *inner_x).alias("xs"),
        F.array(*outer_y, *inner_y).alias("ys"),
        F.array(*outer_x).alias("oxs"),
        F.array(*outer_y).alias("oys"),
        F.array(ux0, ux0 + uw, ux0 + uw, ux0 + uw - a2, ux0 + uw - a2,
                ux0 + a1, ux0 + a1, ux0).alias("uxs"),
        F.array(uy0, uy0, uy0 + uh, uy0 + uh, uy0 + ub,
                uy0 + ub, uy0 + uh, uy0 + uh).alias("uys"),
        F.array(ax0, ax0 + wa, ax0 + wa, ax0).alias("daxs"),
        F.array(ay0, ay0, ay0 + ha, ay0 + ha).alias("days"),
        F.array(bx0, bx0 + wb, bx0 + wb, bx0).alias("dbxs"),
        F.array(by0, by0, by0 + hb, by0 + hb).alias("dbys"),
    )
    # ogrlineref fixture: L-shaped polyline (horizontal then vertical
    # edge); a probe point above the first edge (measure = its
    # projection), and a substring between measures inside edge 1 and
    # edge 2. The oracle replays the identical float op order
    # (sqrt(x*x) == |x| exactly, so the engine's cum-length array
    # equals the closed forms bitwise).
    lx0 = F.lit(-150.0) + F.lit(280.0) * docs.hash01_col(i, 141)
    ly0 = F.lit(-60.0) + F.lit(100.0) * docs.hash01_col(i, 142)
    lw = F.lit(8.0) + F.lit(4.0) * docs.hash01_col(i, 143)
    lh = F.lit(6.0) + F.lit(3.0) * docs.hash01_col(i, 144)
    fpx = F.lit(0.1) + F.lit(0.5) * docs.hash01_col(i, 145)
    fm0 = F.lit(0.1) + F.lit(0.3) * docs.hash01_col(i, 146)
    fm1 = F.lit(0.2) + F.lit(0.5) * docs.hash01_col(i, 147)
    d = d.join(
        s.select(
            i.alias("id"),
            F.array(lx0, lx0 + lw, lx0 + lw).alias("lxs"),
            F.array(ly0, ly0, ly0 + lh).alias("lys"),
            (lx0 + fpx * lw).alias("_lpx"),
            (ly0 + F.lit(2.0)).alias("_lpy"),
            (fm0 * lw).alias("_lm0"),
            (lw + fm1 * lh).alias("_lm1"),
        ), "id")
    h = G.point_on_surface_cols(G.convex_hull_cols(d), "uxs", "uys")
    h = h.withColumn("m_loc", G.line_locate_point_expr(
        "lxs", "lys", "_lpx", "_lpy"))
    h = G.line_substring_cols(h, "_lm0", "_lm1", xs="lxs", ys="lys")
    sub_len = F.expr(
        "aggregate(sequence(1, size(sub_xs) - 1), 0D, (a, i) -> a + "
        "sqrt((element_at(sub_xs, i + 1) - element_at(sub_xs, i)) * "
        "(element_at(sub_xs, i + 1) - element_at(sub_xs, i)) + "
        "(element_at(sub_ys, i + 1) - element_at(sub_ys, i)) * "
        "(element_at(sub_ys, i + 1) - element_at(sub_ys, i))))")
    # WKT ROUNDTRIP (ST_AsText -> ST_GeomFromText): render the U ring
    # at the pinned %.6f, parse it back with the pure-JVM parser, and
    # re-derive vertex count + shoelace area from the PARSED arrays —
    # the oracle computes the same area directly over printf-rounded
    # coordinates, so any parser defect breaks the hash
    h = h.withColumn("_wkt", G.wkt_polygon_expr("uxs", "uys"))
    pxs, pys = G.wkt_parse_polygon_exprs("_wkt")
    h = h.withColumn("_pxs", pxs).withColumn("_pys", pys)
    h = h.withColumn("nv_parse", F.size("_pxs")) \
         .withColumn("parse_area", G.shoelace_area_expr("_pxs", "_pys"))
    ccx, ccy = G.centroid_exprs("oxs", "oys")
    return h.select(
        "id",
        F.size("hull_xs").alias("nv_hull"),
        F.round(G.shoelace_area_expr("hull_xs", "hull_ys"), 5).alias("hull_area"),
        F.round(ccx, 6).alias("cx_c"),
        F.round(ccy, 6).alias("cy_c"),
        F.round(G.geodesic_area_expr("oxs", "oys") / F.lit(1.0e12), 6)
        .alias("gd_area"),
        F.round(G.ring_length_expr("oxs", "oys"), 6).alias("perim"),
        F.round(G.geodesic_length_expr("oxs", "oys") / F.lit(1.0e3), 6)
        .alias("gd_len"),
        F.round("pos_x", 6).alias("pos_x"),
        F.round("pos_y", 6).alias("pos_y"),
        F.col("nv_parse").alias("nv_parse"),
        F.round("parse_area", 6).alias("parse_area"),
        F.round(G.st_distance_rings_expr("daxs", "days", "dbxs", "dbys"), 9)
        .alias("dist_ab"),
        F.round("m_loc", 9).alias("m_loc"),
        F.size("sub_xs").alias("sub_nv"),
        F.round(sub_len, 9).alias("sub_len"),
    )


def sql_geometry_functions() -> str:
    import math as _m

    from .functions import geometry as G

    hx = lambda s: derive.hash01_sql("s_suppkey", s)
    ox = ", ".join(f"cx + rx * cos({2.0 * _m.pi * j / _GF_K!r})"
                   for j in range(_GF_K))
    oy = ", ".join(f"cy + ry * sin({2.0 * _m.pi * j / _GF_K!r})"
                   for j in range(_GF_K))
    gd = G.geodesic_area_sql("oxs", "oys")
    perim = G.ring_length_sql("oxs", "oys")
    gd_len = G.geodesic_length_sql("oxs", "oys")
    hull_area = f"0.5 * {float(_GF_K)!r} * rx * ry * sin({2.0 * _m.pi / _GF_K!r})"
    return f"""
WITH k AS (
  SELECT s_suppkey AS id,
         -150.0 + 300.0 * ({hx(95)}) AS cx,
         -55.0 + 110.0 * ({hx(96)}) AS cy,
         2.0 + 3.0 * ({hx(97)}) AS rx,
         1.5 + 2.0 * ({hx(98)}) AS ry,
         -170.0 + 300.0 * ({hx(121)}) AS ux0,
         -60.0 + 100.0 * ({hx(122)}) AS uy0,
         8.0 + 4.0 * ({hx(123)}) AS uw,
         6.0 + 3.0 * ({hx(124)}) AS uh,
         2.0 + 1.0 * ({hx(125)}) AS a1,
         1.0 + 0.5 * ({hx(126)}) AS a2,
         1.0 + 0.5 * ({hx(127)}) AS ub,
         -100.0 + 150.0 * ({hx(131)}) AS dax0,
         -40.0 + 60.0 * ({hx(132)}) AS day0,
         2.0 + 2.0 * ({hx(133)}) AS dwa,
         2.0 + 2.0 * ({hx(134)}) AS dha,
         1.0 + 3.0 * ({hx(135)}) AS dgx,
         1.0 + 3.0 * ({hx(136)}) AS dgy,
         -150.0 + 280.0 * ({hx(141)}) AS lx0,
         -60.0 + 100.0 * ({hx(142)}) AS ly0,
         8.0 + 4.0 * ({hx(143)}) AS lwid,
         6.0 + 3.0 * ({hx(144)}) AS lhgt,
         0.1 + 0.5 * ({hx(145)}) AS fpx,
         0.1 + 0.3 * ({hx(146)}) AS fm0,
         0.2 + 0.5 * ({hx(147)}) AS fm1
  FROM supplier
),
lref AS (
  -- bit-exact replay of the engine's lineref arithmetic on the
  -- L-polyline: dxe/dy2 are the engine's fl-computed edge deltas;
  -- sqrt(x*x) == |x| makes the cum-length array equal these forms
  SELECT id,
         (lx0 + lwid) - lx0 AS dxe,
         (ly0 + lhgt) - ly0 AS dy2,
         lx0 + fpx * lwid AS lpx,
         fm0 * lwid AS lm0,
         lwid + fm1 * lhgt AS lm1,
         lx0, ly0, lwid, lhgt
  FROM k
),
lref2 AS (
  SELECT id,
         (((lpx - lx0) * dxe) / (dxe * dxe)) * dxe AS m_loc_raw,
         lx0 + (lm0 / dxe) * dxe AS sx,
         ly0 + (((lm1 - dxe) / ((dxe + dy2) - dxe)) * dy2) AS ey,
         lx0, ly0, lwid
  FROM lref
),
r AS (SELECT id, cx, cy, rx, ry, ux0, uy0, uh, a1, ub,
      dax0 + dwa AS daxr, day0 + dha AS dayt,
      (dax0 + dwa) + dgx AS dbx0, (day0 + dha) + dgy AS dby0,
      [{ox}] AS oxs, [{oy}] AS oys,
      list_transform(
        [ux0, ux0 + uw, ux0 + uw, ux0 + uw - a2, ux0 + uw - a2,
         ux0 + a1, ux0 + a1, ux0],
        v -> CAST(printf('%.6f', v) AS DOUBLE)) AS pxs,
      list_transform(
        [uy0, uy0, uy0 + uh, uy0 + uh, uy0 + ub,
         uy0 + ub, uy0 + uh, uy0 + uh],
        v -> CAST(printf('%.6f', v) AS DOUBLE)) AS pys
      FROM k)
SELECT id,
       {_GF_K} AS nv_hull,
       round({hull_area}, 5) AS hull_area,
       round(cx, 6) AS cx_c,
       round(cy, 6) AS cy_c,
       round(({gd}) / 1.0e12, 6) AS gd_area,
       round({perim}, 6) AS perim,
       round(({gd_len}) / 1.0e3, 6) AS gd_len,
       round((ux0 + (ux0 + a1)) / 2.0, 6) AS pos_x,
       round(((uy0 + ub) + (uy0 + uh)) / 2.0, 6) AS pos_y,
       8 AS nv_parse,
       round(abs(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         list_transform(range(1, len(pxs) + 1), i ->
           pxs[i] * pys[1 + i % len(pxs)] - pxs[1 + i % len(pxs)] * pys[i])),
         (a, b) -> a + b)) / 2, 6) AS parse_area,
       round(sqrt((daxr - dbx0) * (daxr - dbx0)
                  + (dayt - dby0) * (dayt - dby0)), 9) AS dist_ab,
       round(l2.m_loc_raw, 9) AS m_loc,
       3 AS sub_nv,
       round(((l2.lx0 + l2.lwid) - l2.sx) + (l2.ey - l2.ly0), 9) AS sub_len
FROM r JOIN lref2 l2 USING (id)
"""


def q_polygon_buffer_reflex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NON-CONVEX polygon buffer (GEOS BufferOp round joins,
    ogrgeometry.cpp:4528): L-shaped fixture with one reflex right
    angle — 5 convex corners emit quarter arcs (8 quadrant segments),
    the reflex corner emits the offset-edge intersection point. The
    oracle replays the identical vertex construction closed-form
    (axis-aligned edges -> all arc angles are exact multiples of pi/2,
    trig ulp absorbed at 9dp)."""
    from .operators import vector_pipeline as VP

    s = _read(spark, sf_dir, "supplier")
    i = F.col("s_suppkey")
    x0 = F.lit(-160.0) + F.lit(300.0) * docs.hash01_col(i, 81)
    y0 = F.lit(-70.0) + F.lit(120.0) * docs.hash01_col(i, 82)
    w = F.lit(6.0) + F.lit(4.0) * docs.hash01_col(i, 83)
    h = F.lit(5.0) + F.lit(3.0) * docs.hash01_col(i, 84)
    w1 = w * F.lit(0.5)
    h1 = h * F.lit(0.5)
    d = s.select(
        i.alias("id"),
        F.array(x0, x0 + w, x0 + w, x0 + w1, x0 + w1, x0).alias("xs"),
        F.array(y0, y0, y0 + h1, y0 + h1, y0 + h, y0 + h).alias("ys"),
        (F.lit(0.6) + F.lit(0.8) * docs.hash01_col(i, 85)).alias("bd"),
    )
    buf = VP.buffer_reflex(d, "bd", quadrant_segments=8)
    return buf.select(
        "id", F.posexplode(F.arrays_zip("xs", "ys")).alias("k", "_p")
    ).select(
        "id", "k",
        F.round(F.col("_p.xs"), 9).alias("vx"),
        F.round(F.col("_p.ys"), 9).alias("vy"),
    )


def sql_polygon_buffer_reflex() -> str:
    hs = lambda s: derive.hash01_sql("s_suppkey", s)
    cxs = ("CASE c WHEN 0 THEN x0 WHEN 1 THEN x0 + w WHEN 2 THEN x0 + w "
           "WHEN 3 THEN x0 + w * 0.5 WHEN 4 THEN x0 + w * 0.5 ELSE x0 END")
    cys = ("CASE c WHEN 0 THEN y0 WHEN 1 THEN y0 WHEN 2 THEN y0 + h * 0.5 "
           "WHEN 3 THEN y0 + h * 0.5 WHEN 4 THEN y0 + h ELSE y0 + h END")
    # arc start angle per convex corner (axis-aligned edges -> exact
    # quadrant constants, the same doubles numpy's atan2 returns)
    t1 = ("CASE c WHEN 0 THEN -pi() WHEN 1 THEN -pi()/2 WHEN 2 THEN 0.0 "
          "WHEN 4 THEN 0.0 ELSE pi()/2 END")
    th = f"({t1}) + ((pi()/2) * j) / 8"
    kbase = ("CASE c WHEN 0 THEN 0 WHEN 1 THEN 9 WHEN 2 THEN 18 "
             "WHEN 3 THEN 27 WHEN 4 THEN 28 ELSE 37 END")
    return f"""
WITH k AS (
  SELECT s_suppkey AS id,
         -160.0 + 300.0 * ({hs(81)}) AS x0,
         -70.0 + 120.0 * ({hs(82)}) AS y0,
         6.0 + 4.0 * ({hs(83)}) AS w,
         5.0 + 3.0 * ({hs(84)}) AS h,
         0.6 + 0.8 * ({hs(85)}) AS bd
  FROM supplier
),
e AS (
  SELECT id, x0, y0, w, h, bd,
         CAST(cc.range AS BIGINT) AS c, CAST(jj.range AS BIGINT) AS j
  FROM k CROSS JOIN range(6) cc CROSS JOIN range(9) jj
  WHERE cc.range != 3 OR jj.range = 0
)
SELECT id, ({kbase}) + j AS k,
       round(CASE WHEN c = 3 THEN ({cxs}) + bd ELSE ({cxs}) + bd * cos({th}) END, 9) AS vx,
       round(CASE WHEN c = 3 THEN ({cys}) + bd ELSE ({cys}) + bd * sin({th}) END, 9) AS vy
FROM e
"""


_L_UX = [0.0, 4.0, 4.0, 1.0, 1.0, 0.0]
_L_UY = [0.0, 0.0, 1.0, 1.0, 3.0, 3.0]


def _dwithin_member_expr(px: str, py: str, vxs: list[str], vys: list[str],
                         d: str) -> str:
    """Engine-portable SQL (valid verbatim in Spark SQL AND DuckDB —
    only CASE/least/greatest/arithmetic): 1 iff point (px, py) lies
    within distance d of the polygon given by vertex-coordinate
    expressions — inside by the reference crossing rule
    (ogrlinearring.cpp:503-531) OR min point-segment distance^2 <=
    d^2. Pure +,-,*,/ and compares, so both engines evaluate an
    identical float sequence: no rounding needed. This is the
    definitional membership field of the buffered region (gdalwarp /
    GEOS BufferOp semantics) valid at ANY distance."""
    n = len(vxs)
    pip_terms, d2s = [], []
    for k in range(n):
        ax, ay = vxs[k], vys[k]
        bx, by = vxs[(k + 1) % n], vys[(k + 1) % n]
        x2, y2 = f"(({ax}) - ({px}))", f"(({ay}) - ({py}))"
        x1, y1 = f"(({bx}) - ({px}))", f"(({by}) - ({py}))"
        pip_terms.append(
            f"CASE WHEN ((({y1}) > 0 AND ({y2}) <= 0) OR "
            f"(({y2}) > 0 AND ({y1}) <= 0)) AND "
            f"((({x1}) * ({y2}) - ({x2}) * ({y1})) / (({y2}) - ({y1}))) > 0.0 "
            f"THEN 1 ELSE 0 END"
        )
        ex, ey = f"(({bx}) - ({ax}))", f"(({by}) - ({ay}))"
        L2 = f"({ex} * {ex} + {ey} * {ey})"
        t = (f"least(greatest(((({px}) - ({ax})) * {ex} + "
             f"(({py}) - ({ay})) * {ey}) / {L2}, 0.0), 1.0)")
        dx = f"(({px}) - (({ax}) + {t} * {ex}))"
        dy = f"(({py}) - (({ay}) + {t} * {ey}))"
        d2s.append(f"({dx} * {dx} + {dy} * {dy})")
    pip = f"(({' + '.join(pip_terms)}) % 2 = 1)"
    dw = f"(least({', '.join(d2s)}) <= ({d}) * ({d}))"
    return f"CASE WHEN {pip} OR {dw} THEN 1 ELSE 0 END"


def q_buffer_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oversized-distance buffer membership field: per supplier an
    L-shaped polygon (scaled/placed by hash01) buffered at d = 2*sx —
    ABOVE the notch's local feature size, the regime buffer_reflex
    excludes and buffer_union covers (whose ring output is tied to
    this exact field by tests/test_vector_pipeline.py) — probed on a
    12x9 pixel-center grid over the dilated bbox. Exact cross-engine:
    the member expression is the same SQL text in both engines."""
    s = _read(spark, sf_dir, "supplier")
    i = F.col("s_suppkey")
    base = s.select(
        i.alias("id"),
        (F.lit(-100.0) + F.lit(200.0) * docs.hash01_col(i, 101)).alias("ox"),
        (F.lit(-50.0) + F.lit(100.0) * docs.hash01_col(i, 102)).alias("oy"),
        (F.lit(0.5) + F.lit(1.5) * docs.hash01_col(i, 103)).alias("sx"),
    )
    g = base.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(107))).alias("g")
    ).selectExpr("id", "ox", "oy", "sx",
                 "CAST(g % 12 AS BIGINT) AS gi",
                 "CAST(g / 12 AS BIGINT) AS gj")
    px = "(ox + sx * (-2.0 + (gi + 0.5) * (8.0 / 12.0)))"
    py = "(oy + sx * (-2.0 + (gj + 0.5) * (7.0 / 9.0)))"
    vxs = [f"(ox + {u!r} * sx)" for u in _L_UX]
    vys = [f"(oy + {u!r} * sx)" for u in _L_UY]
    mem = _dwithin_member_expr(px, py, vxs, vys, "(2.0 * sx)")
    return g.selectExpr("id", "gi", "gj", f"{mem} AS member")


def sql_buffer_field() -> str:
    px = "(ox + sx * (-2.0 + (gi + 0.5) * (8.0 / 12.0)))"
    py = "(oy + sx * (-2.0 + (gj + 0.5) * (7.0 / 9.0)))"
    vxs = [f"(ox + {u!r} * sx)" for u in _L_UX]
    vys = [f"(oy + {u!r} * sx)" for u in _L_UY]
    mem = _dwithin_member_expr(px, py, vxs, vys, "(2.0 * sx)")
    return f"""
WITH base AS (
  SELECT s_suppkey AS id,
         -100.0 + 200.0 * ({derive.hash01_sql("s_suppkey", 101)}) AS ox,
         -50.0 + 100.0 * ({derive.hash01_sql("s_suppkey", 102)}) AS oy,
         0.5 + 1.5 * ({derive.hash01_sql("s_suppkey", 103)}) AS sx
  FROM supplier
),
g AS (
  SELECT base.*, CAST(r.range % 12 AS BIGINT) AS gi,
         CAST(r.range // 12 AS BIGINT) AS gj
  FROM base CROSS JOIN range(108) r
)
SELECT id, gi, gj, {mem} AS member FROM g
"""


def q_boolean_degenerate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean geometry on GENERIC-POSITION-VIOLATING pairs — the
    shapes autotest/ogr/ogr_geom.py exercises against GEOS: shared
    edges (cfg 0), T-vertices (cfg 1), shared corners (cfg 2),
    collinear overlapping edges (cfg 3). Runs the snap-rounding
    clip_pair_robust path (grid=1, integer fixture coordinates), so
    areas and canonical ring/vertex counts are exact and the oracle is
    closed-form per configuration. Reference: ogrgeometry.cpp:3924
    MakeValid / GEOS fixed-precision boolean semantics."""
    from .operators import boolean_geom

    s = _read(spark, sf_dir, "supplier")
    i = F.col("s_suppkey")
    x0 = F.lit(2.0) * F.floor(F.lit(50.0) * docs.hash01_col(i, 71))
    y0 = F.lit(2.0) * F.floor(F.lit(35.0) * docs.hash01_col(i, 72))
    w = F.lit(2.0) * (F.lit(1) + F.floor(F.lit(4.0) * docs.hash01_col(i, 73)))
    h = F.lit(2.0) * (F.lit(1) + F.floor(F.lit(3.0) * docs.hash01_col(i, 74)))
    cfg = (i % 4).cast("int")

    def rect(ax0, ay0, ax1, ay1):
        return (F.array(ax0, ax1, ax1, ax0), F.array(ay0, ay0, ay1, ay1))

    xs_a, ys_a = rect(x0, y0, x0 + w, y0 + h)
    bx = {}
    bx[0] = rect(x0 + w, y0, x0 + w + w, y0 + h)
    bx[1] = (F.array(x0 + w, x0 + w + F.lit(4.0), x0 + w + F.lit(4.0)),
             F.array(y0 + h / 2, y0, y0 + h))
    bx[2] = rect(x0 + w, y0 + h, x0 + w + F.lit(4.0), y0 + h + F.lit(4.0))
    bx[3] = rect(x0 + w / 2, y0, x0 + w + w / 2, y0 + h)
    xs_b = (F.when(cfg == 0, bx[0][0]).when(cfg == 1, bx[1][0])
            .when(cfg == 2, bx[2][0]).otherwise(bx[3][0]))
    ys_b = (F.when(cfg == 0, bx[0][1]).when(cfg == 1, bx[1][1])
            .when(cfg == 2, bx[2][1]).otherwise(bx[3][1]))
    pairs = s.select(
        i.alias("pair_id"), cfg.alias("cfg"),
        xs_a.alias("xs_a"), ys_a.alias("ys_a"),
        xs_b.alias("xs_b"), ys_b.alias("ys_b"),
    )
    out = boolean_geom.degenerate_metrics(
        pairs.select("pair_id", "xs_a", "ys_a", "xs_b", "ys_b"), grid=1.0
    )
    return out.join(pairs.select("pair_id", "cfg"), "pair_id").select(
        "pair_id", "cfg", "area_i", "nv_i", "nr_i", "area_u", "nv_u", "nr_u"
    )


def sql_boolean_degenerate() -> str:
    hx = lambda s: derive.hash01_sql("s_suppkey", s)
    return f"""
WITH k AS (
  SELECT s_suppkey AS pair_id,
         CAST(s_suppkey % 4 AS INTEGER) AS cfg,
         2.0 * floor(50.0 * ({hx(71)})) AS x0,
         2.0 * floor(35.0 * ({hx(72)})) AS y0,
         2.0 * (1 + floor(4.0 * ({hx(73)}))) AS w,
         2.0 * (1 + floor(3.0 * ({hx(74)}))) AS h
  FROM supplier
)
SELECT pair_id, cfg,
       CASE WHEN cfg = 3 THEN (w / 2) * h ELSE 0.0 END AS area_i,
       CASE WHEN cfg = 3 THEN 4 ELSE 0 END AS nv_i,
       CASE WHEN cfg = 3 THEN 1 ELSE 0 END AS nr_i,
       CASE cfg WHEN 0 THEN 2 * (w * h)
                WHEN 1 THEN w * h + 2 * h
                WHEN 2 THEN w * h + 16.0
                ELSE (w + w / 2) * h END AS area_u,
       CASE cfg WHEN 0 THEN 4 WHEN 1 THEN 8 WHEN 2 THEN 8 ELSE 4 END AS nv_u,
       1 AS nr_u
FROM k
"""


# ===================================================== compound suites
#
# The driver gate checks at most 50 queries per round; r2 left 27 of
# 77 registry entries unchecked (VERDICT r3 item 1). Related queries
# whose semantics were individually proven in r1/r2 are therefore
# UNIONED into compound "suite" entries: each sub-query keeps its own
# q_*/sql_* definition (reused verbatim), and both engines conform the
# sub-results to a shared (tag, s1..sN string, d1..dM double) schema
# before a UNION ALL. int->double casts are exact (< 2^53 values);
# string slots are untouched; null padding is NULL on both sides —
# so a suite hash-matches iff every member hash-matches, and the whole
# registry fits the gate every round.

def _conform(df: DataFrame, tag: str, strcols: list[str],
             numcols: list[str], n_str: int, n_num: int) -> DataFrame:
    cols = [F.lit(tag).alias("tag")]
    for k in range(n_str):
        c = (F.col(strcols[k]).cast("string") if k < len(strcols)
             else F.lit(None).cast("string"))
        cols.append(c.alias(f"s{k + 1}"))
    for k in range(n_num):
        c = (F.col(numcols[k]).cast("double") if k < len(numcols)
             else F.lit(None).cast("double"))
        cols.append(c.alias(f"d{k + 1}"))
    return df.select(*cols)


def _suite(parts, n_str: int, n_num: int) -> DataFrame:
    out = None
    for tag, df, strcols, numcols in parts:
        c = _conform(df, tag, strcols, numcols, n_str, n_num)
        out = c if out is None else out.unionByName(c)
    return out


def _conform_sql(tag: str, subsql: str, strcols: list[str],
                 numcols: list[str], n_str: int, n_num: int) -> str:
    sel = [f"'{tag}' AS tag"]
    for k in range(n_str):
        e = (f"CAST({strcols[k]} AS VARCHAR)" if k < len(strcols)
             else "CAST(NULL AS VARCHAR)")
        sel.append(f"{e} AS s{k + 1}")
    for k in range(n_num):
        e = (f"CAST({numcols[k]} AS DOUBLE)" if k < len(numcols)
             else "CAST(NULL AS DOUBLE)")
        sel.append(f"{e} AS d{k + 1}")
    return "SELECT " + ", ".join(sel) + f" FROM (\n{subsql}\n)"


def _suite_sql(parts, n_str: int, n_num: int) -> str:
    return "\nUNION ALL\n".join(
        _conform_sql(tag, sql, strcols, numcols, n_str, n_num)
        for tag, sql, strcols, numcols in parts
    )


_OGR_SQL_PARTS = [
    ("distinct", ["val"], []),
    ("orderby", [], ["o_orderkey", "o_totalprice"]),
    ("first_match", [], ["c_custkey", "first_orderkey", "first_total"]),
    ("like_between", ["p_name"], ["p_partkey", "p_size"]),
    ("union_all", ["name", "src"], ["acctbal"]),
    ("expressions", ["name8", "seg_nat", "seg3"], ["c_custkey", "bal_floor", "keymod"]),
    ("like_escape", [], ["id", "lit_both", "any_then_lit", "backslash_esc"]),
    ("geom_area", [], ["poly_id", "area"]),
    ("special_fields", ["geom_wkt", "ogr_style", "ogr_geometry"], ["id", "area"]),
]


def q_ogr_sql_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OGR SQL surface in one gate row: DISTINCT / ORDER BY+LIMIT+OFFSET
    / first-match LEFT JOIN / LIKE+ILIKE+BETWEEN+IN / UNION ALL /
    scalar expressions / LIKE ESCAPE / OGR_GEOM_AREA (each r1/r2-proven
    individually; tags keep the sub-results disjoint)."""
    subs = {
        "distinct": q_ogr_distinct, "orderby": q_ogr_orderby_limit,
        "first_match": q_ogr_first_match_join, "like_between": q_ogr_like_between,
        "union_all": q_ogr_union_all, "expressions": q_ogr_expressions,
        "like_escape": q_ogr_like_escape, "geom_area": q_geom_area,
        "special_fields": q_ogr_special_fields,
    }
    return _suite(
        [(t, subs[t](spark, sf_dir), sc, nc) for t, sc, nc in _OGR_SQL_PARTS],
        n_str=3, n_num=4,
    )


def sql_ogr_sql_suite() -> str:
    subs = {
        "distinct": sql_ogr_distinct, "orderby": sql_ogr_orderby_limit,
        "first_match": sql_ogr_first_match_join, "like_between": sql_ogr_like_between,
        "union_all": sql_ogr_union_all, "expressions": sql_ogr_expressions,
        "like_escape": sql_ogr_like_escape, "geom_area": sql_geom_area,
        "special_fields": sql_ogr_special_fields,
    }
    return _suite_sql(
        [(t, subs[t](), sc, nc) for t, sc, nc in _OGR_SQL_PARTS],
        n_str=3, n_num=4,
    )


_TEXT_PARTS = [
    ("bpe", [], ["id", "n_tokens_ws", "n_tokens_bpe", "bpe_to_ws_x100"]),
    ("quality", [], ["id", "n_chars", "n_tokens", "n_uniq_tokens",
                     "avg_token_len_x100", "stop_hits", "uniq_ratio_pct", "accepted"]),
    ("lang", ["pred_lang"], ["id", "hits_en", "hits_de", "hits_fr", "hits_es"]),
    ("fingerprint", [], ["id", "fp"]),
]


def q_text_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-pipeline surface in one gate row: BPE-ish token counts,
    quality features + accept flag, stopword lang-id, rolling
    fingerprint (r1-proven individually)."""
    subs = {
        "bpe": q_token_count_bpe, "quality": q_text_quality,
        "lang": q_lang_id, "fingerprint": q_doc_fingerprint,
    }
    return _suite(
        [(t, subs[t](spark, sf_dir), sc, nc) for t, sc, nc in _TEXT_PARTS],
        n_str=1, n_num=8,
    )


def sql_text_suite() -> str:
    subs = {
        "bpe": sql_token_count_bpe, "quality": sql_text_quality,
        "lang": sql_lang_id, "fingerprint": sql_doc_fingerprint,
    }
    return _suite_sql(
        [(t, subs[t](), sc, nc) for t, sc, nc in _TEXT_PARTS],
        n_str=1, n_num=8,
    )


_TILE_ASSIGN_PARTS = [
    ("mercator", ["quadkey"], ["id", "tx", "ty_xyz"]),
    ("geodetic", [], ["id", "gtx", "gty_tms"]),
]


def q_tile_assign_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile assignment in BOTH gdal2tiles global profiles (mercator z12
    + quadkey; geodetic 2:1 z10) in one gate row."""
    subs = {"mercator": q_tile_assign, "geodetic": q_tile_assign_geodetic}
    return _suite(
        [(t, subs[t](spark, sf_dir), sc, nc) for t, sc, nc in _TILE_ASSIGN_PARTS],
        n_str=1, n_num=3,
    )


def sql_tile_assign_suite() -> str:
    subs = {"mercator": sql_tile_assign, "geodetic": sql_tile_assign_geodetic}
    return _suite_sql(
        [(t, subs[t](), sc, nc) for t, sc, nc in _TILE_ASSIGN_PARTS],
        n_str=1, n_num=3,
    )


_BASE_TILE_COLS = ["tz", "tx", "ty", "checksum", "n_px"]
_BASE_TILES_PARTS = [
    ("near_plus_overview", [], _BASE_TILE_COLS),
    ("average", [], _BASE_TILE_COLS),
    ("geodetic", [], _BASE_TILE_COLS),
    ("bilinear", [], _BASE_TILE_COLS),
]


def q_base_tiles_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdal2tiles base-tile pipeline, all four r2-proven flavors in one
    gate row: nearest (+one overview level), average (4x supersample),
    geodetic profile, bilinear (2x querysize)."""
    subs = {
        "near_plus_overview": q_base_tiles, "average": q_base_tiles_avg,
        "geodetic": q_base_tiles_geodetic, "bilinear": q_base_tiles_bilinear,
    }
    return _suite(
        [(t, subs[t](spark, sf_dir), sc, nc) for t, sc, nc in _BASE_TILES_PARTS],
        n_str=0, n_num=5,
    )


def sql_base_tiles_suite() -> str:
    subs = {
        "near_plus_overview": sql_base_tiles, "average": sql_base_tiles_avg,
        "geodetic": sql_base_tiles_geodetic, "bilinear": sql_base_tiles_bilinear,
    }
    return _suite_sql(
        [(t, subs[t](), sc, nc) for t, sc, nc in _BASE_TILES_PARTS],
        n_str=0, n_num=5,
    )


_REPROJECT_PARTS = [
    ("merc_roundtrip", [], ["n", "n_ok"]),
    ("utm31", [], ["id", "easting_mm", "northing_mm", "lon_rt", "lat_rt"]),
    ("osgb", [], ["id", "easting_mm", "northing_mm", "lon_rt", "lat_rt"]),
    ("gridshift", [], ["id", "lon_sh", "lat_sh", "lon_rt", "lat_rt"]),
]

# grid-shift scene: eastern-US points strictly inside the synthetic
# NTv2 sub-grid (38..46N, 70..80W) — exact integer-derived doubles,
# textually identical in both engines
_GS_LON = "-79.5 + CAST(o_orderkey % 300 AS DOUBLE) * 0.03"
_GS_LAT = "38.3 + CAST((o_orderkey DIV 300) % 250 AS DOUBLE) * 0.03"
_GS_LON_DUCK = "-79.5 + CAST(o_orderkey % 300 AS DOUBLE) * 0.03"
_GS_LAT_DUCK = "38.3 + CAST((o_orderkey // 300) % 250 AS DOUBLE) * 0.03"


def q_reproject_gridshift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-based datum shift (PROJ hgridshift / NTv2 — the path
    NAD27-family CRS take through ogr/ogrct.cpp:2254): forward bilinear
    arcsec shift + the reverse fixed-point iteration, over the
    deterministic synthetic sub-grid (kernels.gridshift fixture; no
    real .gsb in the sandbox — the round's synthesise-at-small-scale
    rule). Nano-degree rounding; the oracle replays the bilinear and
    every masked iteration from the closed-form node values."""
    from .kernels import gridshift as GS
    from .operators import reproject

    g = GS.gridshift_fixture()
    o = _read(spark, sf_dir, "orders")
    pts = o.select(
        F.col("o_orderkey").alias("id"),
        F.expr(_GS_LON).alias("lon"), F.expr(_GS_LAT).alias("lat"))
    fwd = reproject.gridshift_forward_cols(pts, g)
    rt = reproject.gridshift_inverse_cols(fwd, g)
    return rt.select(
        "id",
        F.round("lon_sh", 9).alias("lon_sh"),
        F.round("lat_sh", 9).alias("lat_sh"),
        F.round("lon_inv", 9).alias("lon_rt"),
        F.round("lat_inv", 9).alias("lat_rt"),
    )


def sql_reproject_gridshift() -> str:
    from .kernels import gridshift as GS

    g = GS.gridshift_fixture()
    pts = (f"SELECT o_orderkey AS id, {_GS_LON_DUCK} AS lon, "
           f"{_GS_LAT_DUCK} AS lat FROM orders")
    fwd = GS.gridshift_fwd_sql_ctes(g, f"({pts})")
    inv = GS.gridshift_inv_sql_ctes(
        g, "(SELECT id, lon AS tlon, lat AS tlat FROM gs_fwd)")
    return (f"WITH {fwd}, {inv} "
            f"SELECT f.id, round(f.lon, 9) AS lon_sh, "
            f"round(f.lat, 9) AS lat_sh, "
            f"round(i.lon, 9) AS lon_rt, round(i.lat, 9) AS lat_rt "
            f"FROM gs_fwd f JOIN gs_inv i USING (id)")


def q_reproject_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reprojection surface in one gate row: 4326<->3857 round-trip
    error census + the Krueger-series 4326<->32631 forward/inverse
    (the reference's own benchmark CRS pair) + the datum-shifted
    4326<->27700 Helmert chain (r4) + the NTv2 grid-shift datum path
    (r5)."""
    subs = {"merc_roundtrip": q_reproject_roundtrip,
            "utm31": q_reproject_utm, "osgb": q_reproject_osgb,
            "gridshift": q_reproject_gridshift}
    return _suite(
        [(t, subs[t](spark, sf_dir), sc, nc) for t, sc, nc in _REPROJECT_PARTS],
        n_str=0, n_num=5,
    )


def sql_reproject_suite() -> str:
    subs = {"merc_roundtrip": sql_reproject_roundtrip,
            "utm31": sql_reproject_utm, "osgb": sql_reproject_osgb,
            "gridshift": sql_reproject_gridshift}
    return _suite_sql(
        [(t, subs[t](), sc, nc) for t, sc, nc in _REPROJECT_PARTS],
        n_str=0, n_num=5,
    )


def q_band_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-band statistics (GDALRasterBand::ComputeStatistics /
    gdalinfo -stats): min/max/mean/stddev over the synthetic band in
    the exact integer-moment form (n*Sx2 - Sx^2 — the engine-exact
    equivalent of the reference's streaming accumulation)."""
    band = raster.synth_band(spark, zoom=3, tile_px=16)  # 128x128
    v = F.col("value")
    agg = band.agg(
        F.count("*").alias("cnt"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
        F.sum(v).alias("_s1"),
        F.sum((v * v).cast("decimal(38,0)")).alias("_s2"),
    )
    n = F.col("cnt")
    m = (n.cast("decimal(38,0)") * F.col("_s2")
         - F.col("_s1").cast("decimal(38,0)") * F.col("_s1"))
    return agg.select(
        "cnt", "vmin", "vmax",
        (F.col("_s1").cast("double") / n.cast("double")).alias("mean"),
        F.round(
            F.sqrt(m.cast("double") / (n * n).cast("double")), 6
        ).alias("stddev"),
    )


def sql_band_stats() -> str:
    val = _band_val_sql("r.range")
    return f"""
WITH px AS (SELECT ({val}) AS value FROM range(16384) r),
a AS (
  SELECT count(*) AS cnt, min(value) AS vmin, max(value) AS vmax,
         sum(value) AS _s1,
         sum(CAST(value AS HUGEINT) * value) AS _s2
  FROM px
)
SELECT cnt, vmin, vmax,
       CAST(_s1 AS DOUBLE) / CAST(cnt AS DOUBLE) AS mean,
       round(sqrt(CAST(cnt * _s2 - CAST(_s1 AS HUGEINT) * _s1 AS DOUBLE)
             / CAST(cnt * cnt AS DOUBLE)), 6) AS stddev
FROM a
"""


_OVERVIEW_PARTS = [
    ("average", [], ["gx", "gy", "value"]),
    ("order_stats", [], ["gx", "gy", "mode", "med", "q1", "q3", "rms"]),
    ("band_stats", [], ["cnt", "vmin", "vmax", "mean", "stddev"]),
]


def q_overview_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overview reduction in one gate row: 2x2 average + the
    order-statistic kernels (mode/med/q1/q3/rms)."""
    subs = {"average": q_overview_avg, "order_stats": q_overview_stats,
            "band_stats": q_band_stats}
    return _suite(
        [(t, subs[t](spark, sf_dir), sc, nc) for t, sc, nc in _OVERVIEW_PARTS],
        n_str=0, n_num=7,
    )


def sql_overview_suite() -> str:
    subs = {"average": sql_overview_avg, "order_stats": sql_overview_stats,
            "band_stats": sql_band_stats}
    return _suite_sql(
        [(t, subs[t](), sc, nc) for t, sc, nc in _OVERVIEW_PARTS],
        n_str=0, n_num=7,
    )


_HIST_CFGS = [
    # (cfg, vmin, vmax, buckets, include_out_of_range, value modulus)
    (0, -0.5, 255.5, 256, False, 256),   # the GetDefaultHistogram shape
    (1, 10.5, 200.5, 10, True, 256),     # clamped out-of-range tails
]


def q_band_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDALRasterBand::GetHistogram bucket rule
    (gdalrasterband.cpp:4420-4434) in two configs: the
    GDALGetDefaultHistogram -0.5..255.5 x 256 shape, and a coarse
    10-bucket window with include_out_of_range clamping the tails into
    the first/last bucket."""
    out = None
    for cfg, lo, hi, nb, inc, mod in _HIST_CFGS:
        band = raster.synth_band(spark, zoom=2, tile_px=8).select(
            (F.col("value") % mod).alias("value"))
        h = raster.band_histogram(
            band, vmin=lo, vmax=hi, buckets=nb, include_out_of_range=inc,
        ).select(F.lit(cfg).cast("long").alias("cfg"), "bucket", "cnt")
        out = h if out is None else out.unionByName(h)
    return out


def sql_band_histogram() -> str:
    parts = []
    for cfg, lo, hi, nb, inc, mod in _HIST_CFGS:
        scale = float(nb) / (float(hi) - float(lo))
        idx = f"floor((CAST(value AS DOUBLE) - {float(lo)!r}) * {scale!r})"
        if inc:
            bexpr = (f"CASE WHEN {idx} < 0 THEN 0 "
                     f"WHEN {idx} >= {nb} THEN {nb - 1} "
                     f"ELSE CAST({idx} AS BIGINT) END")
            flt = ""
        else:
            bexpr = f"CAST({idx} AS BIGINT)"
            flt = f"WHERE {idx} >= 0 AND {idx} < {nb}"
        parts.append(f"""
SELECT {cfg} AS cfg, b.range AS bucket,
       CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
FROM range({nb}) b LEFT JOIN (
  SELECT {bexpr} AS bucket, count(*) AS cnt
  FROM (SELECT ({_band_val_sql('r.range')}) % {mod} AS value
        FROM range(1024) r) px {flt}
  GROUP BY 1
) c ON c.bucket = b.range""")
    return " UNION ALL ".join(parts)


_CM_SALTS = (411, 412, 413, 414)  # r, g, b, gray


def q_color_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`gdal raster color-merge`
    (apps/gdalalg_raster_color_merge.cpp:130-229): HSV merge of an RGB
    raster with a grayscale VALUE raster, in the reference's exact
    float32 arithmetic — pure codegen column math in Spark, bit-exact
    float32 replay in the oracle (both engines keep FLOAT ops in
    float32). Channels packed as r*65536 + g*256 + b."""
    sr, sg, sb, sv = _CM_SALTS
    base = spark.range(32 * 32).select(
        (F.col("id") % 32).alias("gx"),
        (F.col("id") / 32).cast("bigint").alias("gy"),
        F.col("id").alias("pid"))
    color = base.select(
        "gx", "gy",
        (raster._hash_col(F.col("pid"), sr) % 256).alias("r"),
        (raster._hash_col(F.col("pid"), sg) % 256).alias("g"),
        (raster._hash_col(F.col("pid"), sb) % 256).alias("b"))
    gray = base.select(
        "gx", "gy", (raster._hash_col(F.col("pid"), sv) % 256).alias("value"))
    out = raster.hsv_color_merge(color, gray)
    return out.select(
        "gx", "gy",
        (F.col("r2") * 65536 + F.col("g2") * 256 + F.col("b2")).alias("rgb"))


def sql_color_merge() -> str:
    sr, sg, sb, sv = _CM_SALTS

    def hv(salt: int) -> str:
        return (f"((((r.range % {M31}) * {A} + {salt}) % {M31} * {A} "
                f"+ {salt * 7 + 13}) % {M31}) % 256")

    src = (f"SELECT r.range % 32 AS gx, r.range // 32 AS gy, "
           f"{hv(sr)} AS r, {hv(sg)} AS g, {hv(sb)} AS b, {hv(sv)} AS _v "
           f"FROM range(1024) r")
    ctes = raster.hsv_merge_sql_ctes("cm_src")
    return f"""
WITH cm_src AS ({src}),
{ctes}
SELECT gx, gy, r2 * 65536 + g2 * 256 + b2 AS rgb FROM hsv_out
"""


_RASTER_UTIL_PARTS = [
    ("sieve", [], ["px", "py", "value"]),
    ("calc", [], ["gx", "gy", "value"]),
    ("reclassify", [], ["gx", "gy", "value"]),
    ("mosaic", [], ["gx", "gy", "v_last", "v_mean"]),
    ("stack_resize", [], ["dx", "dy", "value"]),
    ("fill_nodata", [], ["gx", "gy", "value"]),
    ("pansharpen", [], ["gx", "gy", "b_red_sharp", "b_nir_sharp"]),
    ("nearblack", [], ["gx", "gy", "value", "mask"]),
    ("pct", [], ["gx", "gy", "idx", "rgb"]),
    ("retile", [], ["tile", "ox", "oy", "value"]),
    ("checksum", [], ["band", "checksum"]),
    ("histogram", [], ["cfg", "bucket", "cnt"]),
    ("color_merge", [], ["gx", "gy", "rgb"]),
]


def q_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDALChecksumImage (alg/gdalchecksum.cpp:48) over the 32x32
    synthetic band: integer path (band 0) and floating path with the
    GDALCopyWords floor(v+0.5) conversion (band 1)."""
    band = raster.synth_band(spark, zoom=2, tile_px=8).select("gx", "gy", "value")
    a = raster.checksum_image(band, width=32).select(
        F.lit(0).cast("bigint").alias("band"), "checksum")
    fb = band.withColumn("value", F.col("value").cast("double") / F.lit(7.0))
    b = raster.checksum_image(fb, width=32, floating=True).select(
        F.lit(1).cast("bigint").alias("band"), "checksum")
    return a.unionByName(b)


def sql_checksum() -> str:
    v = _band_val_sql("gy * 32 + gx")
    px = (f"SELECT r.range % 32 AS gx, r.range // 32 AS gy, ({v}) AS value "
          f"FROM range(1024) r")
    ints = raster.checksum_sql(px, width=32)
    fl = raster.checksum_sql(
        f"SELECT gx, gy, CAST(value AS DOUBLE) / 7.0 AS value FROM ({px})",
        width=32, floating=True)
    return (f"SELECT CAST(0 AS BIGINT) AS band, checksum FROM ({ints})\n"
            f"UNION ALL\nSELECT CAST(1 AS BIGINT) AS band, checksum FROM ({fl})")


def q_raster_utility_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster utility surface in one gate row: sieve, gdal_calc,
    reclassify, mosaic (last+mean), stack+resize+scale, fill-nodata,
    weighted-Brovey pansharpen (each r1/r2-proven individually)."""
    subs = {
        "sieve": q_raster_sieve, "calc": q_raster_calc,
        "reclassify": q_raster_reclassify, "mosaic": q_raster_mosaic,
        "stack_resize": q_raster_stack_resize, "fill_nodata": q_fill_nodata,
        "pansharpen": q_pansharpen, "nearblack": q_nearblack,
        "pct": q_pct_roundtrip, "retile": q_retile, "checksum": q_checksum,
        "histogram": q_band_histogram, "color_merge": q_color_merge,
    }
    return _suite(
        [(t, subs[t](spark, sf_dir), sc, nc) for t, sc, nc in _RASTER_UTIL_PARTS],
        n_str=0, n_num=4,
    )


def sql_raster_utility_suite() -> str:
    subs = {
        "sieve": sql_raster_sieve, "calc": sql_raster_calc,
        "reclassify": sql_raster_reclassify, "mosaic": sql_raster_mosaic,
        "stack_resize": sql_raster_stack_resize, "fill_nodata": sql_fill_nodata,
        "pansharpen": sql_pansharpen, "nearblack": sql_nearblack,
        "pct": sql_pct_roundtrip, "retile": sql_retile, "checksum": sql_checksum,
        "histogram": sql_band_histogram, "color_merge": sql_color_merge,
    }
    return _suite_sql(
        [(t, subs[t](), sc, nc) for t, sc, nc in _RASTER_UTIL_PARTS],
        n_str=0, n_num=4,
    )


def q_tindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdaltindex (apps/gdaltindex_lib.cpp): normalized extent per
    raster from literal geotransforms (one north-up negative-psy
    source per k, so the min/max normalization is exercised)."""
    cat = spark.range(0, 3).select(
        F.col("id").alias("rid"),
        (F.lit(-180.0) + F.lit(37.5) * F.col("id")).alias("x0"),
        (F.lit(80.0) - F.lit(21.25) * F.col("id")).alias("y0"),
        (F.lit(0.1) * (F.col("id") + 1)).alias("psx"),
        (F.lit(-0.05) * (F.col("id") + 1)).alias("psy"),
        (F.lit(32) + F.lit(8) * F.col("id")).cast("bigint").alias("w"),
        (F.lit(24) + F.lit(4) * F.col("id")).cast("bigint").alias("h"),
    )
    return raster.tile_index(cat)


def sql_tindex() -> str:
    return """
WITH cat AS (
  SELECT r.range AS rid,
         -180.0 + 37.5 * r.range AS x0,
         80.0 - 21.25 * r.range AS y0,
         0.1 * (r.range + 1) AS psx,
         -0.05 * (r.range + 1) AS psy,
         CAST(32 + 8 * r.range AS BIGINT) AS w,
         CAST(24 + 4 * r.range AS BIGINT) AS h
  FROM range(3) r
)
SELECT rid,
       least(x0, x0 + w * psx) AS minx,
       least(y0, y0 + h * psy) AS miny,
       greatest(x0, x0 + w * psx) AS maxx,
       greatest(y0, y0 + h * psy) AS maxy,
       w, h
FROM cat
"""


_FOOTPRINT_PARTS = [
    ("bbox", [], ["label", "minx", "miny", "maxx", "maxy", "n_pixels"]),
    ("rings", [], ["label", "ring_idx", "nv", "area", "minx", "miny", "maxx", "maxy"]),
    ("tindex", [], ["rid", "minx", "miny", "maxx", "maxy", "w", "h"]),
]


def q_footprint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Footprint in one gate row: component bboxes + traced pixel-edge
    outline rings."""
    subs = {"bbox": q_footprint, "rings": q_footprint_rings,
            "tindex": q_tindex}
    return _suite(
        [(t, subs[t](spark, sf_dir), sc, nc) for t, sc, nc in _FOOTPRINT_PARTS],
        n_str=0, n_num=8,
    )


def sql_footprint_suite() -> str:
    subs = {"bbox": sql_footprint, "rings": sql_footprint_rings,
            "tindex": sql_tindex}
    return _suite_sql(
        [(t, subs[t](), sc, nc) for t, sc, nc in _FOOTPRINT_PARTS],
        n_str=0, n_num=8,
    )


_TERRAIN_PARTS = [
    ("slope", [], ["gx", "gy", "slope_deg"]),
    ("aspect", [], ["gx", "gy", "aspect_deg"]),
    ("hillshade", [], ["gx", "gy", "shade"]),
    ("hs_combined", [], ["gx", "gy", "shade"]),
    ("hs_multidir", [], ["gx", "gy", "shade"]),
    ("hs_igor", [], ["gx", "gy", "shade"]),
    ("tpi_tri_rough", [], ["gx", "gy", "tpi", "tri", "roughness"]),
    ("color_relief", [], ["gx", "gy", "r", "g", "b"]),
]


def q_terrain_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdaldem family on the tile-array (halo) model in one gate row:
    Horn slope, aspect, all four hillshade flavors (standard /
    combined / multidirectional / igor), TPI/TRI/roughness,
    color-relief."""
    subs = {
        "slope": q_focal_slope, "aspect": q_terrain_aspect,
        "hillshade": q_hillshade, "hs_combined": q_hillshade_combined,
        "hs_multidir": q_hillshade_multidir, "hs_igor": q_hillshade_igor,
        "tpi_tri_rough": q_terrain_metrics,
        "color_relief": q_color_relief,
    }
    return _suite(
        [(t, subs[t](spark, sf_dir), sc, nc) for t, sc, nc in _TERRAIN_PARTS],
        n_str=0, n_num=5,
    )


def sql_terrain_suite() -> str:
    subs = {
        "slope": sql_focal_slope, "aspect": sql_terrain_aspect,
        "hillshade": sql_hillshade, "hs_combined": sql_hillshade_combined,
        "hs_multidir": sql_hillshade_multidir, "hs_igor": sql_hillshade_igor,
        "tpi_tri_rough": sql_terrain_metrics,
        "color_relief": sql_color_relief,
    }
    return _suite_sql(
        [(t, subs[t](), sc, nc) for t, sc, nc in _TERRAIN_PARTS],
        n_str=0, n_num=5,
    )


_WARP_PARTS = [
    ("bilinear", [], ["dx", "dy", "value"]),
    ("cubic", [], ["dx", "dy", "value"]),
    ("cubicspline", [], ["dx", "dy", "value"]),
    ("lanczos", [], ["dx", "dy", "value"]),
    ("cutline", [], ["dx", "dy", "value"]),
    ("point_bilinear", [], ["sid", "value"]),
]


def q_warp_kernels_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warp/resample kernel surface in one gate row: the
    mercator->plate-carree warp with bilinear, cubic (a=-0.5) and
    Lanczos-3 kernels, plus bilinear point sampling."""
    subs = {
        "bilinear": q_warp_resample, "cubic": q_warp_resample_cubic,
        "cubicspline": q_warp_resample_cubicspline,
        "lanczos": q_warp_resample_lanczos, "cutline": q_warp_cutline,
        "point_bilinear": q_sample_bilinear,
    }
    return _suite(
        [(t, subs[t](spark, sf_dir), sc, nc) for t, sc, nc in _WARP_PARTS],
        n_str=0, n_num=3,
    )


def sql_warp_kernels_suite() -> str:
    subs = {
        "bilinear": sql_warp_resample, "cubic": sql_warp_resample_cubic,
        "cubicspline": sql_warp_resample_cubicspline,
        "lanczos": sql_warp_resample_lanczos, "cutline": sql_warp_cutline,
        "point_bilinear": sql_sample_bilinear,
    }
    return _suite_sql(
        [(t, subs[t](), sc, nc) for t, sc, nc in _WARP_PARTS],
        n_str=0, n_num=3,
    )


_GRID_PARTS = [
    ("idw", [], ["i", "j", "value"]),
    ("metrics", [], ["i", "j", "cnt", "vmin", "vmax", "vrange", "avg_dist", "nearest_v"]),
    ("linear", [], ["i", "j", "value"]),
    ("invdist_full", [], ["i", "j", "value"]),
]


def q_grid_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdal_grid surface in one gate row: IDW (circular), the FULL
    invdist parameter set (rotated ellipse + smoothing + min/max
    points), data metrics, Delaunay linear interpolation."""
    subs = {"idw": q_idw_grid, "metrics": q_grid_metrics,
            "linear": q_grid_linear, "invdist_full": q_idw_grid_full}
    return _suite(
        [(t, subs[t](spark, sf_dir), sc, nc) for t, sc, nc in _GRID_PARTS],
        n_str=0, n_num=8,
    )


def sql_grid_suite() -> str:
    subs = {"idw": sql_idw_grid, "metrics": sql_grid_metrics,
            "linear": sql_grid_linear, "invdist_full": sql_idw_grid_full}
    return _suite_sql(
        [(t, subs[t](), sc, nc) for t, sc, nc in _GRID_PARTS],
        n_str=0, n_num=8,
    )


_VECTOR_PIPE_PARTS = [
    ("point_buffer", [], ["id", "k", "vx", "vy"]),
    ("polygon_buffer", [], ["id", "k", "vx", "vy"]),
    ("compound_curve", [], ["id", "k", "vx", "vy"]),
    ("explode_make_valid", [], ["id", "part_idx", "nv", "signed_area"]),
    ("simplify_chain", [], ["id", "k", "vx", "vy"]),
    ("buffer_field", [], ["id", "gi", "gj", "member"]),
    ("wrapdateline", [], ["id", "part_idx", "k2", "vx", "vy"]),
    ("simplify_coverage", [], ["id", "k", "vx", "vy"]),
]


def q_vector_pipeline_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ogr2ogr pipeline-step surface in one gate row: point buffer,
    convex polygon buffer, CompoundCurve linearization,
    explode-collections + make-valid, segmentize+simplify chain,
    within-distance buffer field, antimeridian wrapdateline split."""
    subs = {
        "point_buffer": q_vector_buffer, "polygon_buffer": q_polygon_buffer,
        "compound_curve": q_compound_curve, "explode_make_valid": q_explode_make_valid,
        "simplify_chain": q_simplify_chain, "buffer_field": q_buffer_field,
        "wrapdateline": q_wrapdateline,
        "simplify_coverage": q_simplify_coverage,
    }
    return _suite(
        [(t, subs[t](spark, sf_dir), sc, nc) for t, sc, nc in _VECTOR_PIPE_PARTS],
        n_str=0, n_num=5,
    )


def sql_vector_pipeline_suite() -> str:
    subs = {
        "point_buffer": sql_vector_buffer, "polygon_buffer": sql_polygon_buffer,
        "compound_curve": sql_compound_curve, "explode_make_valid": sql_explode_make_valid,
        "simplify_chain": sql_simplify_chain, "buffer_field": sql_buffer_field,
        "wrapdateline": sql_wrapdateline,
        "simplify_coverage": sql_simplify_coverage,
    }
    return _suite_sql(
        [(t, subs[t](), sc, nc) for t, sc, nc in _VECTOR_PIPE_PARTS],
        n_str=0, n_num=5,
    )


_DEDUP_EXACT_PARTS = [
    ("text_key", [], ["keeper", "n_members"]),
    ("sha256_key", [], ["keeper", "n_members"]),
]


def q_dedup_exact_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup in one gate row: raw text-prefix key + the at-scale
    sha256 32-byte shuffle key (identical groups)."""
    subs = {"text_key": q_dedup_exact, "sha256_key": q_dedup_exact_hash}
    return _suite(
        [(t, subs[t](spark, sf_dir), sc, nc) for t, sc, nc in _DEDUP_EXACT_PARTS],
        n_str=0, n_num=2,
    )


def sql_dedup_exact_suite() -> str:
    subs = {"text_key": sql_dedup_exact, "sha256_key": sql_dedup_exact_hash}
    return _suite_sql(
        [(t, subs[t](), sc, nc) for t, sc, nc in _DEDUP_EXACT_PARTS],
        n_str=0, n_num=2,
    )


# Registry. <= 50 entries BY CONSTRUCTION so the driver's 50-slot
# correctness gate re-verifies every entry every round (VERDICT r3
# item 1); related proven queries ride in compound suites above. The
# all-pairs dedup_embedding yardstick sits last — everything before it
# is the scale-safe surface.
QUERIES = {
    # --- tiling core
    "tile_assign_suite": q_tile_assign_suite,
    "base_tiles_suite": q_base_tiles_suite,
    "base_tiles_rgba": q_base_tiles_rgba,
    "base_tiles_antialias": q_base_tiles_antialias,
    "pyramid_counts": q_pyramid_counts,
    # --- spatial join / filter
    "spatial_join": q_spatial_join,
    "spatial_join_wkb": q_spatial_join_wkb,
    "spatial_join_skew": q_spatial_join_skew,
    "spatial_join_bigring": q_spatial_join_bigring,
    "spatial_filter": q_spatial_filter,
    "spatial_erase": q_spatial_erase,
    "spatial_identity": q_spatial_identity,
    "span_invariant": q_span_invariant,
    "knn": q_knn,
    # --- layer algebra / boolean geometry
    "layer_algebra_areas": q_layer_algebra_areas,
    "boolean_areas_nonconvex": q_boolean_areas,
    "boolean_geometry": q_boolean_geometry,
    "boolean_update": q_boolean_update,
    "boolean_degenerate": q_boolean_degenerate,
    # --- reprojection
    "reproject_suite": q_reproject_suite,
    "reproject_lcc": q_reproject_lcc,
    # --- raster
    "overview_suite": q_overview_suite,
    "rasterize_suite": q_rasterize_suite,
    "polygonize": q_polygonize,
    "raster_utility_suite": q_raster_utility_suite,
    "proximity": q_proximity,
    "footprint_suite": q_footprint_suite,
    "terrain_suite": q_terrain_suite,
    "viewshed_suite": q_viewshed_suite,
    "contour": q_contour,
    "contour_polygonize": q_contour_polygonize,
    "warp_kernels_suite": q_warp_kernels_suite,
    "gcp_warp_suite": q_gcp_warp_suite,
    "grid_suite": q_grid_suite,
    # --- vector pipeline
    "vector_pipeline_suite": q_vector_pipeline_suite,
    "polygon_buffer_reflex": q_polygon_buffer_reflex,
    "geometry_functions": q_geometry_functions,
    # --- LLM-pipeline operators
    "dedup_exact_suite": q_dedup_exact_suite,
    "dedup_jaccard": q_dedup_jaccard,
    "minhash_lsh": q_minhash_lsh,
    "simhash": q_simhash,
    "dedup_embedding_ivf": q_dedup_embedding_ivf,
    "similarity_topk": q_similarity_topk,
    "similarity_ivf": q_similarity_ivf,
    "multimodal_meta": q_multimodal_meta,
    "frame_sample": q_frame_sample,
    # --- relational / text / events
    "ogr_summary": q_ogr_summary,
    "ogr_sql_suite": q_ogr_sql_suite,
    "text_suite": q_text_suite,
    "events_suite": q_events_suite,
    # the all-pairs dedup_embedding yardstick was rotated OUT of the
    # 50-slot registry in r4 (VERDICT r3 item 2) — it survives as
    # tests/test_dedup_embedding_yardstick.py; its slot gates the
    # 4096-vertex big-ring join (both exact-stage engines) instead.
}

ORACLES = {
    "tile_assign_suite": sql_tile_assign_suite,
    "base_tiles_suite": sql_base_tiles_suite,
    "base_tiles_rgba": sql_base_tiles_rgba,
    "base_tiles_antialias": sql_base_tiles_antialias,
    "pyramid_counts": sql_pyramid_counts,
    "spatial_join": sql_spatial_join,
    "spatial_join_wkb": sql_spatial_join_wkb,
    "spatial_join_skew": sql_spatial_join_skew,
    "spatial_join_bigring": sql_spatial_join_bigring,
    "spatial_filter": sql_spatial_filter,
    "spatial_erase": sql_spatial_erase,
    "spatial_identity": sql_spatial_identity,
    "span_invariant": sql_span_invariant,
    "knn": sql_knn,
    "layer_algebra_areas": sql_layer_algebra_areas,
    "boolean_areas_nonconvex": sql_boolean_areas,
    "boolean_geometry": sql_boolean_geometry,
    "boolean_update": sql_boolean_update,
    "boolean_degenerate": sql_boolean_degenerate,
    "reproject_suite": sql_reproject_suite,
    "reproject_lcc": sql_reproject_lcc,
    "overview_suite": sql_overview_suite,
    "rasterize_suite": sql_rasterize_suite,
    "polygonize": sql_polygonize,
    "raster_utility_suite": sql_raster_utility_suite,
    "proximity": sql_proximity,
    "footprint_suite": sql_footprint_suite,
    "terrain_suite": sql_terrain_suite,
    "viewshed_suite": sql_viewshed_suite,
    "contour": sql_contour,
    "contour_polygonize": sql_contour_polygonize,
    "warp_kernels_suite": sql_warp_kernels_suite,
    "gcp_warp_suite": sql_gcp_warp_suite,
    "grid_suite": sql_grid_suite,
    "vector_pipeline_suite": sql_vector_pipeline_suite,
    "polygon_buffer_reflex": sql_polygon_buffer_reflex,
    "geometry_functions": sql_geometry_functions,
    "dedup_exact_suite": sql_dedup_exact_suite,
    "dedup_jaccard": sql_dedup_jaccard,
    "minhash_lsh": sql_minhash_lsh,
    "simhash": sql_simhash,
    "dedup_embedding_ivf": sql_dedup_embedding_ivf,
    "similarity_topk": sql_similarity_topk,
    "similarity_ivf": sql_similarity_ivf,
    "multimodal_meta": sql_multimodal_meta,
    "frame_sample": sql_frame_sample,
    "ogr_summary": sql_ogr_summary,
    "ogr_sql_suite": sql_ogr_sql_suite,
    "text_suite": sql_text_suite,
    "events_suite": sql_events_suite,
}


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """Spatial join + tile assignment in one pipeline — the north-star
    workload shape (cell join -> PIP -> tile columns)."""
    pts = _points(spark, sf_dir)
    cov = polygons.countries64_cover(spark, res=6)
    joined = spatial_join_points_in_polygons(
        pts, cov, res=6, strategy="broadcast", keep_point_cols=["id", "lon", "lat"]
    )
    t = tiling.assign_tiles(joined, zoom=8)
    return t.select("id", "poly_id", "tx", "ty_xyz", "quadkey")
