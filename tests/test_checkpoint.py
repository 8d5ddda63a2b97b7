"""Checkpoint-manifest resume semantics (north_rule resumability)."""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gdal_spark import checkpoint


def _input(spark, n=1000, parts=8):
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % parts).alias("pk"),
        (F.col("id") * 3).alias("v"),
    )


def test_run_then_resume_skips_done_partitions(spark, tmp_path):
    base = str(tmp_path / "job")
    inp = _input(spark)

    def process(df):
        return df.withColumn("out", F.col("v") + 1)

    m1 = checkpoint.run_partitioned(
        spark, base_dir=base, job_id="j1", input_df=inp,
        part_key_col="pk", process=process, parts_per_round=3,
    )
    assert m1["partitions_processed"] == 8
    assert m1["rows_out"] == 1000

    # resume: nothing left to do
    m2 = checkpoint.run_partitioned(
        spark, base_dir=base, job_id="j1", input_df=inp,
        part_key_col="pk", process=process,
    )
    assert m2["partitions_processed"] == 0
    assert m2["rows_out"] == 0

    # output rows are complete and not duplicated
    out = spark.read.parquet(os.path.join(base, "out"))
    assert out.count() == 1000
    assert out.select("id").distinct().count() == 1000


def test_partial_manifest_resumes_only_missing(spark, tmp_path):
    base = str(tmp_path / "job2")
    inp = _input(spark)

    def process(df):
        return df

    # simulate a killed job: manifest rows exist for partitions 0-4 only
    full = checkpoint.run_partitioned(
        spark, base_dir=base, job_id="j2",
        input_df=inp.filter(F.col("pk") < 5),
        part_key_col="pk", process=process,
    )
    assert full["partitions_processed"] == 5

    resumed = checkpoint.run_partitioned(
        spark, base_dir=base, job_id="j2", input_df=inp,
        part_key_col="pk", process=process,
    )
    assert resumed["partitions_processed"] == 3  # 5, 6, 7 only

    m = checkpoint.read_manifest(spark, base, "j2")
    assert m.count() == 8
    # lineage: every partition's manifest row carries rows_out
    per = {r["part_key"]: r["n_rows_out"] for r in m.collect()}
    assert all(v == 125 for v in per.values())


def test_manifests_isolated_by_job_id(spark, tmp_path):
    base = str(tmp_path / "job3")
    inp = _input(spark, n=100, parts=4)
    checkpoint.run_partitioned(
        spark, base_dir=base, job_id="a", input_df=inp,
        part_key_col="pk", process=lambda d: d,
    )
    m_other = checkpoint.read_manifest(spark, base, "b")
    assert m_other.count() == 0
    todo_b = checkpoint.pending_partitions(
        spark, base, "b", inp.select(F.col("pk").alias("part_key")).distinct()
    )
    assert todo_b.count() == 4
