"""Connected-components fixpoint (min_label_clusters): correctness on
shapes that exercise multi-round propagation, and the bounded-lineage
guarantee the 100 TB path depends on (localCheckpoint every
CC_CHECKPOINT_EVERY rounds — without it a 15-round run carries a
~30-join logical plan whose analysis cost grows per round)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prox_spark.queries.text import CC_CHECKPOINT_EVERY, min_label_clusters


def _chain_pairs(spark, n):
    # path graph 0-1-2-...-n: diameter n, needs ~n rounds — the
    # worst case for label propagation
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc1 long, doc2 long"
    )


def test_chain_converges_to_single_component(spark):
    labels = min_label_clusters(_chain_pairs(spark, 12))
    rows = {r.doc_id: r.label for r in labels.collect()}
    assert len(rows) == 13
    assert set(rows.values()) == {0}


def test_disjoint_components_keep_min_labels(spark):
    pairs = spark.createDataFrame(
        [(1, 5), (5, 3), (10, 11), (20, 21), (21, 22)], "doc1 long, doc2 long"
    )
    labels = min_label_clusters(pairs)
    rows = {r.doc_id: r.label for r in labels.collect()}
    assert rows == {1: 1, 5: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_lineage_is_truncated_across_rounds(spark):
    # Multi-round convergence crosses checkpoint boundaries. Each round
    # references the label frame three times (neighbor-min join, update
    # join, pointer-jump self-join), so the un-truncated plan TREE
    # grows 3x per round: J(k) = 3*J(k-1) + 3 = (3^(k+1) - 3) / 2.
    # With checkpoints every CC_CHECKPOINT_EVERY rounds the final frame
    # may carry at most CC_CHECKPOINT_EVERY un-truncated rounds.
    labels = min_label_clusters(_chain_pairs(spark, 12))
    plan = labels._jdf.queryExecution().analyzed().toString()
    n_joins = plan.count("Join ")
    bound = (3 ** (CC_CHECKPOINT_EVERY + 1) - 3) // 2
    assert n_joins <= bound, f"plan carries {n_joins} joins (bound {bound}):\n{plan}"
    # and the truncated frame still computes correctly after the fact
    assert labels.agg(F.max("label")).collect()[0][0] == 0
