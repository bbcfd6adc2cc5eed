"""Change-data-feed reader (prox_spark/cdf.py): signed-row change
feeds reconstructed from the manifest log — insert/delete/update
commits, merge-on-read precision, rewrite echoes cancelling, skipped
compactions, rollback, vacuum guards, and schema evolution."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from prox_spark.cdf import read_table_changes
from prox_spark.table import (
    commit_delta,
    commit_snapshot,
    compact_table,
    maintain_table,
    read_manifest,
    read_table,
    rollback_table,
)
from prox_spark.upsert import delete_keys_mor, upsert_parquet


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("src"),
        (F.col("id") * 10).alias("chars"),
    )


def _stage(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _docs(spark, 0, 10), stat_cols=["doc_id"], n_files=2)
    prev = read_manifest(spark, t)
    commit_delta(
        spark, t, _docs(spark, 10, 15), list(prev["files"]), update_key_ranges={}
    )
    return t


def _apply(spark, t, start, end):
    """Replay the feed onto the start snapshot; must equal the end
    snapshot as a multiset (net-exactness, the IVM contract)."""
    feed = read_table_changes(spark, t, start, end)
    base = read_table(spark, t, version=start).withColumn(
        "_sign", F.lit(1)
    ) if start else None
    signed = feed.select(
        "doc_id", "src", "chars",
        F.when(F.col("_change_type") == "insert", 1).otherwise(-1).alias("_sign"),
    )
    allr = signed if base is None else base.unionByName(signed)
    net = (
        allr.groupBy("doc_id", "src", "chars")
        .agg(F.sum("_sign").alias("m"))
        .filter(F.col("m") != 0)
    )
    assert net.filter(F.col("m") != 1).count() == 0, "negative/dup multiplicity"
    expect = read_table(spark, t, version=end)
    got = {tuple(r) for r in net.select("doc_id", "src", "chars").collect()}
    want = {tuple(r) for r in expect.collect()}
    assert got == want


def test_appends_are_pure_inserts(spark, tmp_path):
    t = _stage(spark, tmp_path)
    feed = read_table_changes(spark, t, 1, 2)
    rows = feed.collect()
    assert {r["_change_type"] for r in rows} == {"insert"}
    assert {r["_commit_version"] for r in rows} == {2}
    assert sorted(r["doc_id"] for r in rows) == list(range(10, 15))
    # whole history from 0: v1 rows stamped 1, v2 rows stamped 2
    full = read_table_changes(spark, t, 0)
    assert full.count() == 15
    assert full.filter("_commit_version = 1").count() == 10


def test_mor_delete_is_precise(spark, tmp_path):
    """A merge-on-read delete emits EXACTLY the deleted keys' visible
    rows — no rewrite echo (zero files moved)."""
    t = _stage(spark, tmp_path)
    delete_keys_mor(
        spark, t, spark.createDataFrame([(3,), (12,)], "doc_id long"), ["doc_id"]
    )
    feed = read_table_changes(spark, t, 2, 3)
    rows = feed.collect()
    assert {r["_change_type"] for r in rows} == {"delete"}
    assert sorted(r["doc_id"] for r in rows) == [3, 12]
    # payload columns carry the deleted rows' full content
    assert {r["chars"] for r in rows} == {30, 120}
    _apply(spark, t, 2, 3)
    # a second delete of an ALREADY-deleted key emits nothing for it
    delete_keys_mor(
        spark, t, spark.createDataFrame([(3,), (4,)], "doc_id long"), ["doc_id"]
    )
    again = read_table_changes(spark, t, 3, 4).collect()
    assert sorted(r["doc_id"] for r in again) == [4]


def test_upsert_rewrite_nets_exactly(spark, tmp_path):
    """An upsert (rewrite path) may echo co-rewritten unchanged rows as
    delete+insert pairs — the NET must equal the logical update."""
    t = _stage(spark, tmp_path)
    ups = spark.createDataFrame(
        [(2, "9", 999), (20, "9", 2000)], "doc_id long, src string, chars long"
    )
    upsert_parquet(spark, t, ups, ["doc_id"])
    _apply(spark, t, 2, 3)
    _apply(spark, t, 0, 3)


def test_compaction_is_skipped(spark, tmp_path):
    """data_change=false commits add nothing to the feed; the feed
    spanning them still nets to the final state."""
    t = _stage(spark, tmp_path)
    compact_table(spark, t)  # v3: rewrite-only
    assert read_manifest(spark, t).get("data_change") is False
    assert read_table_changes(spark, t, 2, 3).count() == 0
    prev = read_manifest(spark, t)
    commit_delta(
        spark, t, _docs(spark, 20, 22), list(prev["files"]), update_key_ranges={}
    )  # v4
    feed = read_table_changes(spark, t, 2, 4)
    assert sorted(r["doc_id"] for r in feed.collect()) == [20, 21]
    _apply(spark, t, 0, 4)


def test_delete_fold_is_skipped(spark, tmp_path):
    """maintain_table's delete fold is a rewrite-only commit: the MoR
    delete itself feeds, the fold doesn't."""
    t = _stage(spark, tmp_path)
    for k in range(5):
        delete_keys_mor(
            spark, t, spark.createDataFrame([(k,)], "doc_id long"), ["doc_id"]
        )
    r = maintain_table(spark, t, max_pending_deletes=4, keep_versions=100)
    assert r["folded_deletes"]
    head = read_manifest(spark, t)["version"]
    feed = read_table_changes(spark, t, 2, head)
    rows = feed.collect()
    assert {x["_change_type"] for x in rows} == {"delete"}
    assert sorted(x["doc_id"] for x in rows) == [0, 1, 2, 3, 4]
    _apply(spark, t, 0, head)


def test_rollback_feeds_the_restore(spark, tmp_path):
    """A rollback's feed row set is the inverse of the rolled-back
    commits — here: deletes of the bad batch."""
    t = _stage(spark, tmp_path)  # v2 head
    prev = read_manifest(spark, t)
    commit_delta(
        spark, t, _docs(spark, 50, 53), list(prev["files"]), update_key_ranges={}
    )  # v3: the bad batch
    v4 = rollback_table(spark, t, 2)
    feed = read_table_changes(spark, t, 3, v4)
    rows = feed.collect()
    assert {r["_change_type"] for r in rows} == {"delete"}
    assert sorted(r["doc_id"] for r in rows) == [50, 51, 52]
    _apply(spark, t, 0, v4)


def test_vacuumed_range_raises(spark, tmp_path):
    from prox_spark.table import vacuum

    t = _stage(spark, tmp_path)
    prev = read_manifest(spark, t)
    commit_delta(
        spark, t, _docs(spark, 20, 22), list(prev["files"]), update_key_ranges={}
    )  # v3
    vacuum(spark, t, keep_last=1, retention_minutes=0.0)
    with pytest.raises(ValueError, match="vacuumed"):
        read_table_changes(spark, t, 0, 3)
    with pytest.raises(ValueError, match="not in"):
        read_table_changes(spark, t, 1, 2)


def test_add_column_evolution_backfills_null(spark, tmp_path):
    t = str(tmp_path / "t")
    commit_snapshot(
        spark, t,
        spark.range(3).select(F.col("id").alias("doc_id")),
        stat_cols=["doc_id"],
    )
    prev = read_manifest(spark, t)
    commit_delta(
        spark, t,
        spark.range(3, 5).select(
            F.col("id").alias("doc_id"), F.lit("en").alias("lang")
        ),
        list(prev["files"]), update_key_ranges={},
    )
    feed = read_table_changes(spark, t, 0, 2)
    assert set(feed.columns) == {"doc_id", "lang", "_change_type", "_commit_version"}
    rows = {r["doc_id"]: r["lang"] for r in feed.collect()}
    assert rows == {0: None, 1: None, 2: None, 3: "en", 4: "en"}
