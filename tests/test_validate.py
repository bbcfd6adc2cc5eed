from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from prox_spark.validate import (
    SchemaMismatch,
    assert_schema,
    dedup_by_key,
    enforce_schema,
    fk_orphans,
)

SCHEMA = StructType([
    StructField("id", LongType(), False),
    StructField("name", StringType(), True),
])


def test_enforce_schema_casts_and_orders(spark):
    df = spark.createDataFrame([("1", "a", "x"), ("2", "b", "y")], ["id", "name", "extra"])
    out = enforce_schema(df, SCHEMA)
    assert [f.name for f in out.schema.fields] == ["id", "name"]
    assert dict(out.dtypes)["id"] == "bigint"
    assert out.count() == 2


def test_enforce_schema_missing_column_raises(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    with pytest.raises(SchemaMismatch, match="missing"):
        enforce_schema(df, SCHEMA)


def test_enforce_schema_strict_extra(spark):
    df = spark.createDataFrame([(1, "a", "x")], ["id", "name", "extra"])
    with pytest.raises(SchemaMismatch, match="unexpected"):
        enforce_schema(df, SCHEMA, strict_extra=True)


def test_enforce_schema_check_catches_badcast(spark):
    # "abc" can't become bigint: a bare cast silently nulls it; the
    # check=True audit must refuse instead
    df = spark.createDataFrame([("1", "a"), ("abc", "b")], ["id", "name"])
    with pytest.raises(SchemaMismatch, match=r"badcast\[id\]"):
        enforce_schema(df, SCHEMA, check=True)


def test_enforce_schema_check_catches_null_pk(spark):
    df = spark.createDataFrame([(None, "a"), ("2", "b")], ["id", "name"])
    with pytest.raises(SchemaMismatch, match=r"null\[id\]"):
        enforce_schema(df, SCHEMA, check=True)


def test_enforce_schema_check_passes_clean(spark):
    df = spark.createDataFrame([("1", "a"), ("2", None)], ["id", "name"])
    out = enforce_schema(df, SCHEMA, check=True)
    assert out.count() == 2


def test_audit_conformance_counts(spark):
    from prox_spark.validate import audit_conformance

    df = spark.createDataFrame(
        [("1", "a"), ("abc", "b"), ("xyz", "c"), (None, "d")], ["id", "name"]
    )
    audit = audit_conformance(df, SCHEMA)
    assert audit == {"badcast[id]": 2, "null[id]": 3}


def test_assert_schema_type_mismatch(spark):
    df = spark.createDataFrame([("1", "a")], ["id", "name"])  # id is string
    with pytest.raises(SchemaMismatch, match="expected bigint"):
        assert_schema(df, SCHEMA)


def test_dedup_by_key_idempotent(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], ["id", "name"])
    once = dedup_by_key(df, ["id"])
    assert once.count() == 2
    # property: f(f(x)) == f(x)
    assert dedup_by_key(once, ["id"]).count() == once.count()


def test_fk_orphans_catches_injected(spark):
    parent = spark.createDataFrame([(1,), (2,)], ["pid"])
    child = spark.createDataFrame([(10, 1), (11, 2), (12, 99), (13, None)], ["cid", "pid"])
    orphans = fk_orphans(child, "pid", parent, "pid")
    rows = [r.cid for r in orphans.collect()]
    assert rows == [12]  # the null FK is not an orphan


def test_fk_checker_on_fixtures(silver):
    from prox_spark.schemas import FOREIGN_KEYS
    from prox_spark.validate import check_foreign_keys

    violations = check_foreign_keys(silver, FOREIGN_KEYS)
    # fixtures inject ~1% orphan bookings.service_id
    assert any(
        v.child_table == "bookings" and v.child_col == "service_id" for v in violations
    )
    # and nothing else should be violated
    assert all(
        (v.child_table, v.child_col) == ("bookings", "service_id") for v in violations
    )


def test_silver_dedup_and_schema(silver):
    from prox_spark.schemas import PRIMARY_KEYS, SILVER_SCHEMAS

    for name, df in silver.items():
        keys = PRIMARY_KEYS[name]
        assert df.groupBy(*keys).count().filter(F.col("count") > 1).count() == 0, name
        assert_schema(df, SILVER_SCHEMAS[name])


def test_observed_write_metrics_without_second_scan(spark, tmp_path):
    """observed_write must report row/null counts from the write pass
    itself and the written data must round-trip."""
    from prox_spark.validate import observed_write

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)], "id long, name string"
    )
    out = str(tmp_path / "obs")
    metrics = observed_write(df, out, qc_cols=["name"])
    assert metrics == {"rows": 4, "nulls[name]": 2}
    assert spark.read.parquet(out).count() == 4
