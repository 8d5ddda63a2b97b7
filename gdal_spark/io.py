"""Table IO seam: Iceberg when available, plain parquet otherwise.

The production deployment reads/writes Iceberg (snapshot isolation is
what checkpoint/resume anchors to, BASELINE north_rule); the sandbox
has no Iceberg runtime jars, so the same API falls back to parquet
directories with an explicit `snapshot` column standing in for the
snapshot id. Everything above this seam is format-agnostic.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def have_iceberg(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: B018
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a named table from an sf directory (driver testdata layout)
    or an Iceberg catalog identifier of the form 'catalog.db.table'."""
    if "." in name and "/" not in name:
        return spark.read.table(name)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def write_table(df: DataFrame, path_or_ident: str, *, mode: str = "overwrite",
                partition_by: list[str] | None = None) -> None:
    """Append/overwrite through the seam. Iceberg identifiers use
    writeTo (appends become snapshots -> resumable); paths use parquet.
    """
    if "/" not in path_or_ident:
        w = df.writeTo(path_or_ident)
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path_or_ident)


def write_range_partitioned(df: DataFrame, path_or_ident: str, *,
                            prefix_col: str = "quadkey",
                            prefix_len: int = 4,
                            n_files: int | None = None,
                            mode: str = "overwrite") -> None:
    """Range-partition the output by CELL PREFIX before writing (the
    north-star layout rule: co-located tiles/cells land in the same
    files, so a downstream cell- or tile-range scan prunes to a
    contiguous file subset).

    quadkey prefixes order tiles along the Z-order curve, so
    repartitionByRange on the prefix gives spatial file clustering
    without a custom partitioner; within each range Spark range-samples
    the ACTUAL key distribution, which is what keeps skewed cell
    populations balanced across files at 100 TB (static hash buckets
    would not). `n_files` defaults to spark.sql.shuffle.partitions."""
    from pyspark.sql import functions as F

    key = F.substring(F.col(prefix_col).cast("string"), 1, prefix_len)
    d = df.withColumn("_range_key", key)
    if n_files:
        d = d.repartitionByRange(n_files, "_range_key", prefix_col)
    else:
        d = d.repartitionByRange("_range_key", prefix_col)
    write_table(d.drop("_range_key"), path_or_ident, mode=mode)
