"""salted_join: identical results to the plain equi-join (that is the
whole contract) plus salt plumbing visible in the plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prox_spark.joins import salted_join


def _frames(spark):
    # one pathological hot key (k=1) and some cold ones
    fact = spark.createDataFrame(
        [(i, 1 if i % 3 else i % 7, float(i)) for i in range(1, 101)],
        "row_id long, k long, v double",
    )
    dim = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(0, 7)], "k long, label string"
    )
    return fact, dim


def test_salted_inner_matches_plain(spark):
    fact, dim = _frames(spark)
    plain = fact.join(dim, "k").select("row_id", "k", "v", "label")
    salted = salted_join(fact, dim, "k", salt_buckets=5).select("row_id", "k", "v", "label")
    assert sorted(salted.collect()) == sorted(plain.collect())


def test_salted_left_keeps_unmatched_fact_rows(spark):
    fact, dim = _frames(spark)
    dim_missing = dim.filter(F.col("k") != 1)  # drop the hot key's dim row
    plain = fact.join(dim_missing, "k", "left").select("row_id", "k", "v", "label")
    salted = salted_join(fact, dim_missing, "k", salt_buckets=5, how="left").select(
        "row_id", "k", "v", "label"
    )
    assert sorted(salted.collect(), key=str) == sorted(plain.collect(), key=str)


def test_salted_rejects_outer_shapes(spark):
    fact, dim = _frames(spark)
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(fact, dim, "k", how="full")


def test_salt_in_join_keys(spark):
    import contextlib
    import io

    fact, dim = _frames(spark)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        salted_join(fact, dim, "k", salt_buckets=5).explain("formatted")
    plan = buf.getvalue()
    assert "__salt" in plan   # join condition carries the salt
    assert "Generate" in plan  # dim replication via explode
