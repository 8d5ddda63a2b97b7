"""The interleaved text+media document table (BASELINE input_hint shape).

Schema: (doc_id string, spans array<struct<kind,text,media_ref,offset>>)
plus engine-derived lon/lat (id-hash functions from derive.py).

Per FIXTURES.md F1: spans are 1..5 per doc, kind cycles
{text,image,audio} by (i+j)%3, text='t-<i>-<j>', media_ref='m://<i>/<j>'
when kind != text else '', offset=j.

The span column is the analog of OGR's per-feature native data, which
OGR SQL preserves verbatim through execution
(/root/reference/ogr/ogrsf_frmts/generic/ogr_gensql.cpp:1536-1538) —
the engine NEVER explodes or reorders it; the invariant checker below
asserts exact per-doc span-sequence equality after any pipeline.

Everything is pure Column math (no Python UDF): synthesis of 10^12 rows
is embarrassingly parallel over spark.range partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import derive


def hash01_col(i: Column, salt: int) -> Column:
    """Column twin of derive.hash01_np (quadratic-mixed int64 hash;
    pre-reduce keeps i*A inside int64 at 10^12-row id ranges)."""
    i0 = i % derive.M31
    h1 = (i0 * derive.A + F.lit(salt * 16807 + 12345)) % derive.M31
    h2 = (h1 * h1 + h1) % derive.M31
    h3 = (h2 * derive.A + i0 + F.lit(salt)) % derive.M31
    h4 = (h3 * h3 + h2) % derive.M31
    return h4.cast("double") / F.lit(float(derive.M31))


def lon_col(i: Column) -> Column:
    return F.lit(-180.0) + F.lit(360.0) * hash01_col(i, derive.SALT_LON)


def lat_col(i: Column) -> Column:
    return F.lit(-85.05) + F.lit(170.1) * hash01_col(i, derive.SALT_LAT)


def spans_col(i: Column) -> Column:
    """array<struct<kind,text,media_ref,offset>> derived from doc index i."""
    nspans = (i % 5 + 1).cast("int")
    kinds = F.array(F.lit("text"), F.lit("image"), F.lit("audio"))

    def mk(j: Column):
        kind = F.element_at(kinds, ((i + j.cast("bigint")) % 3 + 1).cast("int"))
        text = F.concat(F.lit("t-"), i.cast("string"), F.lit("-"), j.cast("string"))
        media = F.when(kind == "text", F.lit("")).otherwise(
            F.concat(F.lit("m://"), i.cast("string"), F.lit("/"), j.cast("string"))
        )
        return F.struct(
            kind.alias("kind"), text.alias("text"),
            media.alias("media_ref"), j.cast("int").alias("offset"),
        )

    return F.transform(F.sequence(F.lit(0), nspans - 1), mk)


def synth_docs(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """n interleaved docs with derived geometry. Scales to any n (the
    10^12-row production table is the same expression over a bigger
    range / an Iceberg snapshot — see io.py seam)."""
    rng = spark.range(0, n, 1, partitions) if partitions else spark.range(0, n)
    i = F.col("id")
    return rng.select(
        F.concat(F.lit("doc-"), F.lpad(i.cast("string"), 12, "0")).alias("doc_id"),
        i.alias("doc_index"),
        spans_col(i).alias("spans"),
        lon_col(i).alias("lon"),
        lat_col(i).alias("lat"),
    )


def docs_from_table(df: DataFrame, id_col: str) -> DataFrame:
    """Derive the doc-point view from an existing integer-keyed table
    (used to anchor correctness queries on the driver's parquet views)."""
    i = F.col(id_col).cast("bigint")
    return df.withColumn("lon", lon_col(i)).withColumn("lat", lat_col(i))


def span_fingerprint(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive fingerprint of each doc's span sequence — equal
    before/after an engine op iff (kind, text, media_ref, order) are
    preserved (the ogr_gensql native-data invariant)."""
    fp = F.md5(
        F.concat_ws(
            "\x1f",
            F.transform(
                F.col("spans"),
                lambda s: F.concat_ws("\x1e", s["kind"], s["text"], s["media_ref"], s["offset"].cast("string")),
            ),
        )
    )
    return df.select(F.col(id_col), fp.alias("span_fp"))
