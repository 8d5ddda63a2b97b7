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


def test_crash_between_output_and_manifest_is_idempotent(spark, tmp_path):
    """A kill AFTER the output write but BEFORE the manifest append must
    not duplicate rows on resume: the dynamic partition overwrite
    replaces the orphaned partitions."""
    base = str(tmp_path / "job_crash")
    inp = _input(spark)

    def process(df):
        return df

    # simulate the crash: partition pk=3's output exists, no manifest row
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        inp.filter(F.col("pk") == 3).write.mode("overwrite").partitionBy("pk") \
            .parquet(str(tmp_path / "job_crash" / "out"))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    m = checkpoint.run_partitioned(
        spark, base_dir=base, job_id="jc", input_df=inp,
        part_key_col="pk", process=process,
    )
    assert m["partitions_processed"] == 8  # pk=3 had no manifest -> redone
    out = spark.read.parquet(os.path.join(base, "out"))
    assert out.count() == 1000             # overwritten, NOT duplicated
    assert out.select("id").distinct().count() == 1000


def test_string_part_keys(spark, tmp_path):
    """Quadkey-prefix-style STRING part keys survive the manifest round
    trip without numeric coercion ('023' stays distinct from '23')."""
    base = str(tmp_path / "job_str")
    inp = spark.createDataFrame(
        [(1, "023"), (2, "23"), (3, "023"), (4, "1")],
        "id bigint, pk string",
    )
    m = checkpoint.run_partitioned(
        spark, base_dir=base, job_id="js", input_df=inp,
        part_key_col="pk", process=lambda d: d,
    )
    assert m["partitions_processed"] == 3
    man = checkpoint.read_manifest(spark, base, "js")
    keys = sorted(r["part_key"] for r in man.collect())
    assert keys == ["023", "1", "23"]
    # resume: nothing pending
    m2 = checkpoint.run_partitioned(
        spark, base_dir=base, job_id="js", input_df=inp,
        part_key_col="pk", process=lambda d: d,
    )
    assert m2["partitions_processed"] == 0


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
