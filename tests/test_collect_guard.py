"""Driver-collect byte-budget guard (prox_spark/upsert._collect_capped):
the budget must be enforced BEFORE a large collect lands driver-side —
a sub-cap batch of wide rows is rejected from a 64-row pre-sample, not
after materializing every row."""
from __future__ import annotations

import prox_spark.upsert as U


def test_fixed_width_schema_skips_sampling(spark):
    df = spark.createDataFrame([(i, i * 2) for i in range(500)], "a long, b long")
    rows = U._collect_capped(df, cap=1000)
    assert rows is not None and len(rows) == 500


def test_wide_rows_rejected_without_full_collect(spark, monkeypatch):
    """4k rows of ~64KB strings ≈ 256MB — over the 128MB budget while
    far under the 50k row cap: the old guard collected them all first;
    the new one must bail from the pre-sample's width estimate."""
    wide = spark.range(4096).selectExpr(
        "id", "repeat('x', 65536) AS payload"
    )
    assert U._collect_capped(wide) is None


def test_small_wide_batch_still_lands(spark):
    """A handful of wide rows is within budget: the pre-sample IS the
    whole batch and returns in one job."""
    df = spark.range(10).selectExpr("id", "repeat('x', 65536) AS payload")
    rows = U._collect_capped(df)
    assert rows is not None and len(rows) == 10


def test_sample_shortcut_honors_small_cap(spark):
    """Tests shrink _KEY_SET_CAP; a sub-64-row sample must still honor
    an explicit cap below the sample size."""
    df = spark.range(10).selectExpr("id", "repeat('x', 8) AS payload")
    assert U._collect_capped(df, cap=3) is None
    assert len(U._collect_capped(df, cap=10)) == 10
