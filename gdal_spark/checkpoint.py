"""Per-partition checkpoint manifests: resumable jobs + lineage/metrics.

North-rule requirement: jobs over the 10^12-row table must be resumable
from a snapshot + per-partition checkpoint manifest, with lineage and
throughput metrics emitted per partition.

Design (no Spark-internal hooks, pure dataflow):
- Work is keyed by an explicit `part_key` column (cell prefix, quadkey
  prefix, or doc_id range bucket — any type; stored as STRING in the
  manifest) — the unit of resume.
- `run_partitioned` processes only part_keys NOT already present in the
  manifest (anti-join on the string form), writes results partitioned
  by the part key with DYNAMIC PARTITION OVERWRITE, then appends one
  manifest row per part_key. The overwrite makes re-runs idempotent: a
  kill between the output write and the manifest append leaves
  partitions that the resume simply overwrites — no duplicate rows
  (with plain parquet; on Iceberg the same structure rides snapshot
  atomicity).
- Lineage = the manifest chain: every output partition maps to a
  manifest row naming the input snapshot it was derived from, with
  rows-out and wall-time metrics.

The mechanism mirrors how the reference resumes tiling work at the tile
level (gdal2tiles `--resume` checks tile file existence) — existence
checks become manifest anti-joins.
"""
from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "job_id string, part_key string, input_snapshot string, "
    "n_rows_out bigint, wall_ms bigint, finished_at timestamp"
)


def manifest_path(base_dir: str) -> str:
    return os.path.join(base_dir, "_manifest")


def read_manifest(spark: SparkSession, base_dir: str, job_id: str) -> DataFrame:
    """Manifest rows for `job_id`. A missing manifest (first run) is
    empty; any OTHER read failure propagates — swallowing a transient
    FS error here would silently restart the whole job and duplicate
    output.

    Existence is probed through Spark's Hadoop FileSystem so the check
    is correct on the production targets (s3a://, hdfs://, abfs://),
    not just the driver-local disk — a driver-local os.path.exists
    would report False for every remote path and silently disable
    resume."""
    p = manifest_path(base_dir)
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(p)
    fs = hpath.getFileSystem(hconf)
    if not fs.exists(hpath):
        return spark.createDataFrame([], MANIFEST_SCHEMA)
    return spark.read.parquet(p).filter(F.col("job_id") == job_id)


def pending_partitions(
    spark: SparkSession, base_dir: str, job_id: str, all_parts: DataFrame
) -> DataFrame:
    """all_parts(part_key, any type) minus finished manifest entries
    (compared on the canonical string form)."""
    done = read_manifest(spark, base_dir, job_id).select(
        F.col("part_key").alias("_done_key")
    )
    keyed = all_parts.withColumn("_pk_str", F.col("part_key").cast("string"))
    return (
        keyed.join(done, keyed["_pk_str"] == done["_done_key"], "left_anti")
        .drop("_pk_str")
    )


def run_partitioned(
    spark: SparkSession,
    *,
    base_dir: str,
    job_id: str,
    input_df: DataFrame,
    part_key_col: str,
    process: Callable[[DataFrame], DataFrame],
    input_snapshot: str = "parquet:static",
    parts_per_round: int = 64,
) -> dict:
    """Resumable partitioned run. Returns metrics dict.

    input_df must carry `part_key_col`; `process` maps a slice of input
    to output rows and must KEEP the part key column (it becomes the
    output partition directory). Rounds of `parts_per_round` partitions
    give checkpoint granularity: a kill mid-round loses at most that
    round's work, and the dynamic-partition overwrite makes re-running
    it idempotent.
    """
    all_parts = input_df.select(F.col(part_key_col).alias("part_key")).distinct()
    todo = pending_partitions(spark, base_dir, job_id, all_parts)
    part_keys = [r["part_key"] for r in todo.collect()]
    out_path = os.path.join(base_dir, "out")
    total_rows = 0
    t0 = time.time()

    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        for i in range(0, len(part_keys), parts_per_round):
            batch = part_keys[i : i + parts_per_round]
            t1 = time.time()
            slice_df = input_df.filter(F.col(part_key_col).isin(batch))
            result = process(slice_df).persist()
            # per-part counts from THIS round's result (not a re-read of
            # the shared output dir, which would be O(rounds^2) and
            # contaminated by other jobs sharing base_dir)
            per_part = result.groupBy(part_key_col).agg(
                F.count("*").alias("n")
            ).collect()
            counts = {str(r[part_key_col]): r["n"] for r in per_part}
            result.write.mode("overwrite").partitionBy(part_key_col).parquet(out_path)
            result.unpersist()
            wall = int((time.time() - t1) * 1000)
            rows = [
                (job_id, str(pk), input_snapshot, int(counts.get(str(pk), 0)),
                 wall, None)
                for pk in batch
            ]
            mdf = spark.createDataFrame(rows, MANIFEST_SCHEMA).withColumn(
                "finished_at", F.current_timestamp()
            )
            mdf.write.mode("append").parquet(manifest_path(base_dir))
            total_rows += sum(counts.values())
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    return {
        "job_id": job_id,
        "partitions_processed": len(part_keys),
        "rows_out": total_rows,
        "wall_sec": time.time() - t0,
    }
