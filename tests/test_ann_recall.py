"""ANN quality gates: the approximate indexes must actually find the
true neighbors, not just run. Recall@K is measured against the q40
brute-force cosine ground truth on the same embeddings; bands sit
well under the measured values (LSH 0.70 @ sf0.001 / 0.83 @ sf0.01,
IVF 0.90 / 0.83) so VM noise can't flake them, but far above what a
broken index produces (the round-1 single-table LSH measured 0.03 —
a bug this test would have caught).
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r.query_id, r.vec_id) for r in df.collect()}


@pytest.fixture(scope="module")
def ground_truth(spark):
    from prox_spark.queries.similarity import q40_cosine_topk

    return _pairs(q40_cosine_topk(spark, SF_DIR))


def test_lsh_ann_recall_band(spark, ground_truth):
    from prox_spark.queries.similarity import q41_lsh_ann

    got = _pairs(q41_lsh_ann(spark, SF_DIR))
    recall = len(ground_truth & got) / len(ground_truth)
    assert recall >= 0.6, f"LSH recall@3 collapsed: {recall:.3f}"


def test_ivf_ann_recall_band(spark, ground_truth):
    from prox_spark.queries.similarity import q45_ivf_ann

    got = _pairs(q45_ivf_ann(spark, SF_DIR))
    recall = len(ground_truth & got) / len(ground_truth)
    assert recall >= 0.7, f"IVF recall@3 collapsed: {recall:.3f}"


@pytest.fixture(scope="module")
def l2_ground_truth(spark):
    """Exact L2 top-3 (the PQ family approximates Euclidean distance,
    so its ground truth is L2, not q40's cosine)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from prox_spark.queries.similarity import N_QUERIES, SQDIST_SPARK, TOP_K, _emb

    emb = _emb(spark, SF_DIR)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("dd").alias("qv")
    )
    scored = (
        emb.select("vec_id", "dd")
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("d2", F.expr(SQDIST_SPARK.format(a="qv", b="dd")))
    )
    w = W.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("vec_id"))
    return _pairs(
        scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= TOP_K)
    )


def test_pq_adc_recall_band(spark, l2_ground_truth):
    """q111's ADC-shortlist + exact-re-rank vs exact L2 top-3.
    Measured 0.97 @ sf0.001 and sf0.01 with the data-sampled 16x16
    codebook; a distribution-blind random codebook measured 0.03 —
    the failure mode this band exists to catch."""
    from prox_spark.queries.similarity import q111_pq_adc_search

    got = _pairs(q111_pq_adc_search(spark, SF_DIR))
    recall = len(l2_ground_truth & got) / len(l2_ground_truth)
    assert recall >= 0.7, f"PQ-ADC recall@3 collapsed: {recall:.3f}"


def test_ivfpq_recall_band(spark, l2_ground_truth):
    """q113's IVF-routed ADC search vs exact L2 top-3. Strictly harder
    than q111 (a true neighbor outside the NPROBE probed cells is
    unreachable); band sits under the measured value so the gate
    catches collapse (broken routing or codebook), not noise."""
    from prox_spark.queries.similarity import q113_ivfpq_search

    got = _pairs(q113_ivfpq_search(spark, SF_DIR))
    recall = len(l2_ground_truth & got) / len(l2_ground_truth)
    assert recall >= 0.6, f"IVF-PQ recall@3 collapsed: {recall:.3f}"
