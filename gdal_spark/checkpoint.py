"""Per-partition checkpoint manifests: resumable jobs + lineage/metrics.

North-rule requirement: jobs over the 10^12-row table must be resumable
from a snapshot + per-partition checkpoint manifest, with lineage and
throughput metrics emitted per partition.

Design (no Spark-internal hooks, pure dataflow):
- Work is keyed by an explicit `part_key` column (e.g. cell prefix,
  quadkey prefix, or doc_id range bucket) — the unit of resume.
- `run_partitioned` processes only part_keys NOT already present in the
  manifest (anti-join), appends results, then appends one manifest row
  per part_key: (job_id, part_key, input_snapshot, n_rows_out,
  wall_ms, finished_at). A killed job re-run with the same job_id
  picks up exactly the missing partitions.
- Lineage = the manifest chain: every output row's part_key maps to a
  manifest row naming the input snapshot it was derived from.

The mechanism mirrors how the reference resumes tiling work at the tile
level (gdal2tiles `--resume` checks tile file existence,
swig/python/gdal-utils/osgeo_utils/gdal2tiles.py options) — existence
checks become manifest anti-joins.
"""
from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "job_id string, part_key bigint, input_snapshot string, "
    "n_rows_out bigint, wall_ms bigint, finished_at timestamp"
)


def manifest_path(base_dir: str) -> str:
    return os.path.join(base_dir, "_manifest")


def read_manifest(spark: SparkSession, base_dir: str, job_id: str) -> DataFrame:
    p = manifest_path(base_dir)
    try:
        m = spark.read.parquet(p)
    except Exception:
        return spark.createDataFrame([], MANIFEST_SCHEMA)
    return m.filter(F.col("job_id") == job_id)


def pending_partitions(
    spark: SparkSession, base_dir: str, job_id: str, all_parts: DataFrame
) -> DataFrame:
    """all_parts(part_key) minus already-finished manifest entries."""
    done = read_manifest(spark, base_dir, job_id).select("part_key")
    return all_parts.join(done, "part_key", "left_anti")


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
    to output rows (output keeps the part key for lineage). Rounds of
    `parts_per_round` partitions give checkpoint granularity: a kill
    between rounds loses at most one round of work.
    """
    all_parts = input_df.select(F.col(part_key_col).alias("part_key")).distinct()
    todo = pending_partitions(spark, base_dir, job_id, all_parts)
    part_keys = [r["part_key"] for r in todo.collect()]
    out_path = os.path.join(base_dir, "out")
    total_rows = 0
    t0 = time.time()
    for i in range(0, len(part_keys), parts_per_round):
        batch = part_keys[i : i + parts_per_round]
        t1 = time.time()
        slice_df = input_df.filter(F.col(part_key_col).isin(batch))
        result = process(slice_df)
        result.write.mode("append").parquet(out_path)
        # rows per part for the manifest (one small agg on the output)
        per_part = (
            spark.read.parquet(out_path)
            .filter(F.col(part_key_col).isin(batch))
            .groupBy(part_key_col)
            .agg(F.count("*").alias("n_rows_out"))
        ).collect()
        counts = {r[part_key_col]: r["n_rows_out"] for r in per_part}
        wall = int((time.time() - t1) * 1000)
        rows = [
            (job_id, int(pk), input_snapshot, int(counts.get(pk, 0)),
             wall, None)
            for pk in batch
        ]
        mdf = spark.createDataFrame(rows, MANIFEST_SCHEMA).withColumn(
            "finished_at", F.current_timestamp()
        )
        mdf.write.mode("append").parquet(manifest_path(base_dir))
        total_rows += sum(counts.values())
    return {
        "job_id": job_id,
        "partitions_processed": len(part_keys),
        "rows_out": total_rows,
        "wall_sec": time.time() - t0,
    }
