"""All-pairs embedding-dedup yardstick, kept OUT of the 50-slot
registry (VERDICT r3 item 2: its slot now gates the 4096-vertex
big-ring join). The crossJoin form exists to calibrate the IVF scale
path's recall, not to run at scale — this pytest pins its exactness
against the same DuckDB oracle the gate used through r3."""
from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gdal_spark.queries import q_dedup_embedding, sql_dedup_embedding  # noqa: E402


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    return c


def test_all_pairs_yardstick_matches_oracle(spark, sf_dir, con):
    got = q_dedup_embedding(spark, sf_dir).toPandas()
    exp = con.execute(sql_dedup_embedding()).df()
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    for c in cols:
        assert a[c].astype(str).tolist() == b[c].astype(str).tolist(), c
    # IVF recall vs this yardstick is pinned separately in
    # tests/test_similarity_recall.py::test_ivf_dedup_recall_vs_all_pairs
