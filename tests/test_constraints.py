from __future__ import annotations

import atexit
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from prox_spark.table import (
    ConstraintViolationError,
    add_constraint,
    clone_table,
    commit_delta,
    commit_snapshot,
    compact_table,
    drop_constraint,
    list_constraints,
    read_manifest,
    read_table,
    table_versions,
)
from prox_spark.upsert import upsert_parquet


def _scratch() -> str:
    d = tempfile.mkdtemp(prefix="prox_constraint_test_")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def _seed(spark, path: str) -> None:
    commit_snapshot(
        spark, path,
        spark.range(100).select(
            "id", (F.col("id") % 10).alias("score"),
            F.lit("x").alias("note"),
        ),
        stat_cols=["id"], n_files=2,
    )


def test_violating_append_rejected_atomically(spark):
    s = _scratch()
    t = f"{s}/t"
    _seed(spark, t)
    add_constraint(spark, t, "score_range", "score BETWEEN 0 AND 9")
    assert list_constraints(spark, t) == {
        "score_range": "score BETWEEN 0 AND 9"
    }
    head = read_manifest(spark, t)["version"]
    prev = read_manifest(spark, t)
    bad = spark.range(100, 105).select(
        "id", F.lit(42).cast("long").alias("score"), F.lit("x").alias("note")
    )
    with pytest.raises(ConstraintViolationError, match="score_range"):
        commit_delta(spark, t, bad, list(prev["files"]), update_key_ranges={})
    # nothing published, nothing half-written
    assert read_manifest(spark, t)["version"] == head
    assert read_table(spark, t).count() == 100


def test_valid_append_passes_and_constraint_carries(spark):
    s = _scratch()
    t = f"{s}/t"
    _seed(spark, t)
    add_constraint(spark, t, "score_range", "score BETWEEN 0 AND 9")
    prev = read_manifest(spark, t)
    ok = spark.range(100, 110).select(
        "id", (F.col("id") % 10).alias("score"), F.lit("y").alias("note")
    )
    commit_delta(spark, t, ok, list(prev["files"]), update_key_ranges={})
    assert read_table(spark, t).count() == 110
    assert "score_range" in list_constraints(spark, t)


def test_null_passes_sql_check_semantics(spark):
    s = _scratch()
    t = f"{s}/t"
    _seed(spark, t)
    add_constraint(spark, t, "note_nonempty", "length(note) > 0")
    prev = read_manifest(spark, t)
    with_null = spark.range(200, 203).select(
        "id", F.lit(1).cast("long").alias("score"),
        F.lit(None).cast("string").alias("note"),
    )
    commit_delta(
        spark, t, with_null, list(prev["files"]), update_key_ranges={}
    )
    assert read_table(spark, t).filter("note IS NULL").count() == 3


def test_add_constraint_validates_existing_rows(spark):
    s = _scratch()
    t = f"{s}/t"
    _seed(spark, t)
    with pytest.raises(ConstraintViolationError, match="existing"):
        add_constraint(spark, t, "small", "score < 5")
    assert list_constraints(spark, t) == {}


def test_drop_constraint_lifts_enforcement(spark):
    s = _scratch()
    t = f"{s}/t"
    _seed(spark, t)
    add_constraint(spark, t, "score_range", "score BETWEEN 0 AND 9")
    drop_constraint(spark, t, "score_range")
    assert list_constraints(spark, t) == {}
    prev = read_manifest(spark, t)
    commit_delta(
        spark, t,
        spark.range(100, 101).select(
            "id", F.lit(99).cast("long").alias("score"),
            F.lit("x").alias("note"),
        ),
        list(prev["files"]), update_key_ranges={},
    )
    assert read_table(spark, t).filter("score = 99").count() == 1
    with pytest.raises(ValueError, match="no constraint"):
        drop_constraint(spark, t, "score_range")


def test_compaction_exempt_but_carries_constraints(spark):
    s = _scratch()
    t = f"{s}/t"
    _seed(spark, t)
    add_constraint(spark, t, "score_range", "score BETWEEN 0 AND 9")
    v = compact_table(spark, t)
    assert v in table_versions(spark, t)
    assert "score_range" in list_constraints(spark, t)
    assert read_table(spark, t).count() == 100


def test_upsert_enforces_through_merge_path(spark):
    s = _scratch()
    t = f"{s}/t"
    _seed(spark, t)
    add_constraint(spark, t, "score_range", "score BETWEEN 0 AND 9")
    bad = spark.range(5).select(
        "id", F.lit(-1).cast("long").alias("score"), F.lit("x").alias("note")
    )
    with pytest.raises(ConstraintViolationError):
        upsert_parquet(spark, t, bad, ["id"])
    assert read_table(spark, t).filter("score < 0").count() == 0


def test_clone_carries_constraints(spark):
    s = _scratch()
    src, dst = f"{s}/src", f"{s}/dst"
    _seed(spark, src)
    add_constraint(spark, src, "score_range", "score BETWEEN 0 AND 9")
    clone_table(spark, src, dst)
    assert "score_range" in list_constraints(spark, dst)
    prev = read_manifest(spark, dst)
    with pytest.raises(ConstraintViolationError):
        commit_delta(
            spark, dst,
            spark.range(500, 501).select(
                "id", F.lit(77).cast("long").alias("score"),
                F.lit("x").alias("note"),
            ),
            list(prev["files"]), update_key_ranges={},
        )
