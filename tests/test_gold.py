from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from prox_spark.gold import build_star_schema, dim_date, write_gold


@pytest.fixture(scope="module")
def gold(spark, silver):
    return build_star_schema(spark, silver)


def test_fact_booking_covers_all_bookings(gold, silver):
    # left join preserves every deduped booking
    assert gold["fact_booking"].count() == silver["bookings"].count()


def test_fact_booking_measures_joined(gold):
    f = gold["fact_booking"]
    # every booking got its quote amounts (fixtures have quote per booking)
    assert f.filter(F.col("total_amount").isNull()).count() == 0
    cols = set(f.columns)
    assert {"booking_id", "date_key", "amount_before_tax", "tax_amount",
            "total_amount", "booking_status", "year", "month"} <= cols


def test_dim_date_bijective_date_key(spark):
    dd = dim_date(spark, "2024-01-01", "2024-12-31")
    assert dd.count() == 366  # 2024 is a leap year
    assert dd.select("date_key").distinct().count() == 366
    # date_key reconstructs the date (bijectivity)
    bad = dd.filter(
        F.to_date(F.col("date_key").cast("string"), "yyyyMMdd") != F.col("date")
    )
    assert bad.count() == 0


def test_dim_date_weekend_flag(spark):
    dd = dim_date(spark, "2024-01-01", "2024-01-14")
    weekend = {r.full_date for r in dd.filter("is_weekend").collect()}
    assert weekend == {"2024-01-06", "2024-01-07", "2024-01-13", "2024-01-14"}


def test_dim_user_full_name_derived(gold):
    du = gold["dim_user"]
    assert "full_name" not in ("first_name", "last_name")
    assert {"first_name", "last_name"}.isdisjoint(du.columns)
    row = du.filter(F.col("full_name").isNotNull()).first()
    assert " " in row.full_name


def test_dim_location_distinct(gold, silver):
    dl = gold["dim_location"]
    assert dl.count() == dl.distinct().count()
    assert dl.count() <= silver["service_providers"].count()


def test_dim_review_sentiment_joined(gold):
    dr = gold["dim_review"]
    assert dr.filter(F.col("sentiment_label").isNotNull()).count() > 0


def test_write_gold_partition_layout(gold, tmp_path):
    write_gold({"fact_booking": gold["fact_booking"]}, str(tmp_path))
    parts = os.listdir(tmp_path / "fact_booking")
    assert any(p.startswith("year=") for p in parts)
    inner = os.listdir(
        tmp_path / "fact_booking" / next(p for p in parts if p.startswith("year="))
    )
    assert any(p.startswith("month=") for p in inner)


def test_partition_pruning_plan(spark, gold, tmp_path):
    """A year/month filter must prune partitions at the scan."""
    write_gold({"fact_booking": gold["fact_booking"]}, str(tmp_path))
    df = spark.read.parquet(str(tmp_path / "fact_booking"))
    plan = (
        df.filter((F.col("year") == 2024) & (F.col("month") == 3))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan
    assert "year" in plan.split("PartitionFilters")[1][:200]
