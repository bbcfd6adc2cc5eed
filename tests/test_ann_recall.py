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


def test_pq_adc_recall_band(spark):
    """q111's ADC-shortlist + exact-re-rank vs exact L2 top-3 (ADC
    approximates Euclidean distance, so the ground truth here is L2,
    not q40's cosine). Measured 0.97 @ sf0.001 and sf0.01 with the
    data-sampled 16x16 codebook; a distribution-blind random codebook
    measured 0.03 — the failure mode this band exists to catch."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from prox_spark.queries.similarity import (
        N_QUERIES,
        SQDIST_SPARK,
        TOP_K,
        _emb,
        q111_pq_adc_search,
    )

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
    gt = _pairs(
        scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= TOP_K)
    )
    got = _pairs(q111_pq_adc_search(spark, SF_DIR))
    recall = len(gt & got) / len(gt)
    assert recall >= 0.7, f"PQ-ADC recall@3 collapsed: {recall:.3f}"
