"""Physical-plan assertions: the scale properties SURVEY.md §4 claims
(pushdown, pruning, broadcast, true top-k, sub-quadratic dedup, single
Arrow stage) must be visible in `explain`, not just hoped for."""

from __future__ import annotations

import contextlib
import io

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q01_pushdown_and_pruning(spark):
    from prox_spark.queries.relational import q01_pricing_summary

    plan = _plan(q01_pricing_summary(spark, SF_DIR))
    assert "LessThan(l_shipdate" in plan  # predicate reached the scan
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_comment" not in read_schema  # wide columns pruned
    assert "l_orderkey" not in read_schema


def test_q02_broadcast_and_topk(spark):
    from prox_spark.queries.relational import q02_top5_suppliers

    plan = _plan(q02_top5_suppliers(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan  # dim side broadcast, no shuffle join
    assert "TakeOrderedAndProject" in plan  # top-k without full sort


def test_q14_constant_folded_pushdown(spark):
    from prox_spark.queries.relational import q14_orders_since_week

    plan = _plan(q14_orders_since_week(spark, SF_DIR))
    # date_trunc('week', lit) folds to a literal that reaches the scan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_q36_minhash_is_subquadratic(spark):
    from prox_spark.queries.text import q36_minhash_lsh

    plan = _plan(q36_minhash_lsh(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q42_neardup_is_subquadratic(spark):
    from prox_spark.queries.similarity import q42_embed_neardup

    plan = _plan(q42_embed_neardup(spark, SF_DIR))
    # corpus x corpus must never cross-join (the only cross join in the
    # plan is the 20-row hyperplane broadcast); candidate pairs must
    # come from an equality join on the bucket key
    assert "CartesianProduct" not in plan
    assert "bkt" in plan  # bucket equi-join key present
    assert any(op in plan for op in ("SortMergeJoin Inner", "ShuffledHashJoin Inner", "BroadcastHashJoin Inner"))


def test_q39_single_arrow_stage(spark):
    from prox_spark.queries.text import q39_sentiment

    plan = _plan(q39_sentiment(spark, SF_DIR))
    # exactly one ArrowEvalPython node — "formatted" prints each node
    # once in the tree ("ArrowEvalPython (3)") and once in the detail
    assert plan.count("ArrowEvalPython (") == 1  # UDF not duplicated


def test_q17_semi_anti_operators(spark):
    from prox_spark.queries.relational import q17_customers_without_orders

    plan = _plan(q17_customers_without_orders(spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
