"""Shared pytest fixtures: one SparkSession per test session.

Mirrors the reference's autotest layout (one pytest corpus,
/root/reference/autotest/conftest.py) — golden-value unit tests over
deterministic fixtures, plus Spark-vs-numpy-oracle cross checks.
"""
from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # small for test latency


@pytest.fixture(scope="session")
def spark():
    from gdal_spark.session import get_spark

    s = get_spark(app="gdal_spark-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
