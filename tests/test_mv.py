from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import functions as F

from prox_spark.mv import COUNT_COL, create_mv, mv_info, refresh_mv
from prox_spark.table import (
    commit_delta,
    commit_snapshot,
    read_manifest,
    read_table,
)
from prox_spark.upsert import delete_keys_mor, upsert_parquet


def _scratch() -> str:
    d = tempfile.mkdtemp(prefix="prox_mv_test_")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"),
        F.concat(F.lit("g"), (F.col("id") % 5).cast("string")).alias("grp"),
        (F.col("id") * 10).alias("val"),
    )


def _direct(spark, base):
    return sorted(
        map(
            tuple,
            read_table(spark, base)
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).cast("long").alias(COUNT_COL),
                F.sum("val").alias("sum_val"),
            )
            .collect(),
        )
    )


def _mv_rows(spark, mv):
    return sorted(map(tuple, read_table(spark, mv).collect()))


def test_refresh_folds_insert_delete_update(spark):
    s = _scratch()
    base, mv = f"{s}/base", f"{s}/mv"
    commit_snapshot(spark, base, _df(spark, 0, 100),
                    stat_cols=["id"], n_files=4)
    create_mv(spark, base, mv, ["grp"], ["val"])
    assert _mv_rows(spark, mv) == _direct(spark, base)

    prev = read_manifest(spark, base)
    commit_delta(spark, base, _df(spark, 100, 130),
                 list(prev["files"]), update_key_ranges={})
    delete_keys_mor(
        spark, base,
        spark.range(130).filter("id % 4 = 0").select("id"), ["id"],
    )
    upsert_parquet(
        spark, base,
        _df(spark, 0, 130).filter("id % 7 = 1")
        .withColumn("val", F.col("val") + 5),
        ["id"],
    )
    out = refresh_mv(spark, mv)
    assert out["refreshed"] and out["touched_groups"] > 0
    assert _mv_rows(spark, mv) == _direct(spark, base)
    assert mv_info(spark, mv)["version"] == read_manifest(spark, base)["version"]


def test_refresh_is_a_noop_when_covered(spark):
    s = _scratch()
    base, mv = f"{s}/base", f"{s}/mv"
    commit_snapshot(spark, base, _df(spark, 0, 50))
    create_mv(spark, base, mv, ["grp"], ["val"])
    v = read_manifest(spark, mv)["version"]
    assert refresh_mv(spark, mv)["refreshed"] is False
    assert read_manifest(spark, mv)["version"] == v


def test_group_netting_to_zero_disappears(spark):
    s = _scratch()
    base, mv = f"{s}/base", f"{s}/mv"
    commit_snapshot(spark, base, _df(spark, 0, 50),
                    stat_cols=["id"], n_files=2)
    create_mv(spark, base, mv, ["grp"], ["val"])
    # delete EVERY row of group g0 (id % 5 == 0)
    delete_keys_mor(
        spark, base,
        spark.range(50).filter("id % 5 = 0").select("id"), ["id"],
    )
    refresh_mv(spark, mv)
    assert _mv_rows(spark, mv) == _direct(spark, base)
    assert read_table(spark, mv).filter("grp = 'g0'").count() == 0


def _dims(spark, ver):
    """Right-side dim: grp -> weighting; 'ver' shifts values so
    updates are visible."""
    return spark.createDataFrame(
        [(f"g{i}", i * 100 + ver) for i in range(5)], "grp string, w long"
    )


def _direct_join(spark, left, right):
    return sorted(
        map(
            tuple,
            read_table(spark, left)
            .join(read_table(spark, right), "grp")
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).cast("long").alias(COUNT_COL),
                F.sum("val").alias("sum_val"),
                F.sum("w").alias("sum_w"),
            )
            .collect(),
        )
    )


def test_join_mv_refresh_with_both_sides_changing(spark):
    from prox_spark.mv import create_join_mv, refresh_join_mv

    s = _scratch()
    left, right, mv = f"{s}/l", f"{s}/r", f"{s}/mv"
    commit_snapshot(spark, left, _df(spark, 0, 80),
                    stat_cols=["id"], n_files=4)
    commit_snapshot(spark, right, _dims(spark, 0),
                    stat_cols=["grp"], n_files=2)
    create_join_mv(spark, left, right, mv, ["grp"], ["grp"], ["val", "w"])
    assert _mv_rows(spark, mv) == _direct_join(spark, left, right)

    # left: append + delete; right: update two dims' weights
    prev = read_manifest(spark, left)
    commit_delta(spark, left, _df(spark, 80, 110),
                 list(prev["files"]), update_key_ranges={})
    delete_keys_mor(
        spark, left,
        spark.range(110).filter("id % 3 = 0").select("id"), ["id"],
    )
    upsert_parquet(
        spark, right,
        _dims(spark, 7).filter("grp IN ('g1', 'g4')"), ["grp"],
    )
    out = refresh_join_mv(spark, mv)
    assert out["refreshed"]
    assert _mv_rows(spark, mv) == _direct_join(spark, left, right)
    # a second refresh with nothing new is a no-op
    assert refresh_join_mv(spark, mv)["refreshed"] is False


def test_join_mv_one_sided_change(spark):
    from prox_spark.mv import create_join_mv, refresh_join_mv

    s = _scratch()
    left, right, mv = f"{s}/l", f"{s}/r", f"{s}/mv"
    commit_snapshot(spark, left, _df(spark, 0, 40),
                    stat_cols=["id"], n_files=2)
    commit_snapshot(spark, right, _dims(spark, 0))
    create_join_mv(spark, left, right, mv, ["grp"], ["grp"], ["val", "w"])
    delete_keys_mor(
        spark, left,
        spark.range(40).filter("id % 5 = 2").select("id"), ["id"],
    )
    refresh_join_mv(spark, mv)
    assert _mv_rows(spark, mv) == _direct_join(spark, left, right)


def test_refresh_falls_back_to_full_recompute_after_vacuum(spark):
    """A base vacuumed past the view's covered version makes the
    incremental inputs unreadable: refresh must fall back to a full
    recompute and still land the exact result."""
    from prox_spark.table import compact_table, vacuum

    s = _scratch()
    base, mv = f"{s}/base", f"{s}/mv"
    commit_snapshot(spark, base, _df(spark, 0, 60),
                    stat_cols=["id"], n_files=2)
    create_mv(spark, base, mv, ["grp"], ["val"])
    # churn: three commits then vacuum to the newest one — the covered
    # version (1) and its successors are gone
    delete_keys_mor(
        spark, base,
        spark.range(60).filter("id % 6 = 1").select("id"), ["id"],
    )
    compact_table(spark, base)
    compact_table(spark, base)
    vacuum(spark, base, keep_last=1, retention_minutes=0.0)
    out = refresh_mv(spark, mv)
    assert out["refreshed"] and out["mode"] == "full"
    assert _mv_rows(spark, mv) == _direct(spark, base)
    # and the lineage is re-anchored: the next refresh is incremental
    delete_keys_mor(
        spark, base,
        spark.range(60).filter("id % 6 = 2").select("id"), ["id"],
    )
    out2 = refresh_mv(spark, mv)
    assert out2["mode"] == "incremental"
    assert _mv_rows(spark, mv) == _direct(spark, base)


def test_mv_stream_batch_lineage_fence(spark):
    """The lineage fence: rows at or below the covered version fold
    nothing (a replayed batch is a no-op), rows above fold exactly
    their uncovered slice."""
    from prox_spark.mv import mv_stream_batch
    from prox_spark.table import table_versions

    s = _scratch()
    base, mv = f"{s}/base", f"{s}/mv"
    commit_snapshot(spark, base, _df(spark, 0, 30),
                    stat_cols=["id"], n_files=2)
    create_mv(spark, base, mv, ["grp"], ["val"])
    head = table_versions(spark, mv)[-1]

    def feed(lo, hi, ver, change="insert"):
        return _df(spark, lo, hi).select(
            "*", F.lit(change).alias("_change_type"),
            F.lit(ver).cast("long").alias("_commit_version"),
        )

    # batch covering only v1 (already materialized): publishes nothing
    mv_stream_batch(feed(0, 30, 1), 0, mv)
    assert table_versions(spark, mv)[-1] == head
    # batch with a genuine v2 slice folds it...
    mv_stream_batch(feed(30, 40, 2), 1, mv)
    assert _mv_rows(spark, mv) == sorted(
        map(
            tuple,
            _df(spark, 0, 40)
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).cast("long").alias(COUNT_COL),
                F.sum("val").alias("sum_val"),
            )
            .collect(),
        )
    )
    # ...and REPLAYING that batch after the fold is fenced out
    before = _mv_rows(spark, mv)
    mv_stream_batch(feed(30, 40, 2), 1, mv)
    assert _mv_rows(spark, mv) == before


def test_refresh_is_one_atomic_commit_with_lineage(spark):
    """The fold and the mv_of coverage bump publish in ONE manifest
    rename — even when the delta both changes groups and nets one to
    zero (previously: up to delete + upsert + meta = 3 commits, with
    a crash window that double-counted the feed on replay)."""
    s = _scratch()
    base, mv = f"{s}/base", f"{s}/mv"
    commit_snapshot(spark, base, _df(spark, 0, 100),
                    stat_cols=["id"], n_files=4)
    create_mv(spark, base, mv, ["grp"], ["val"])
    # delete ALL of grp g0 (nets to zero) and insert new g1 rows
    delete_keys_mor(
        spark, base,
        spark.range(0, 100, 5).select(F.col("id")), ["id"],
    )
    prev = read_manifest(spark, base)
    commit_delta(spark, base, _df(spark, 101, 120),
                 list(prev["files"]), update_key_ranges={})
    v0 = int(read_manifest(spark, mv)["version"])
    out = refresh_mv(spark, mv)
    assert out["refreshed"] and out["mode"] == "incremental"
    m = read_manifest(spark, mv)
    assert int(m["version"]) == v0 + 1, "refresh must be ONE commit"
    assert int(m["mv_of"]["version"]) == int(
        read_manifest(spark, base)["version"]
    )
    assert _mv_rows(spark, mv) == _direct(spark, base)


def test_null_group_keys_fold_exactly(spark):
    """NULL-valued group keys: the merge joins null-safe and falls
    back to a full-table scope (stats can't locate NULL-key files), so
    the NULL group folds into ONE exact row — never a duplicate or a
    delta-only count."""
    s = _scratch()
    base, mv = f"{s}/base", f"{s}/mv"

    def df(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id"),
            F.when(F.col("id") % 3 == 0, F.lit(None).cast("string"))
            .otherwise(
                F.concat(F.lit("g"), (F.col("id") % 5).cast("string"))
            ).alias("grp"),
            (F.col("id") * 10).alias("val"),
        )

    commit_snapshot(spark, base, df(0, 60), stat_cols=["id"], n_files=4)
    create_mv(spark, base, mv, ["grp"], ["val"])
    prev = read_manifest(spark, base)
    commit_delta(spark, base, df(60, 90),
                 list(prev["files"]), update_key_ranges={})
    delete_keys_mor(
        spark, base, spark.range(0, 30, 6).select("id"), ["id"],
    )
    refresh_mv(spark, mv)
    got = sorted(
        map(tuple, read_table(spark, mv).collect()), key=repr
    )
    want = sorted(
        map(
            tuple,
            read_table(spark, base)
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).cast("long").alias(COUNT_COL),
                F.sum("val").alias("sum_val"),
            )
            .collect(),
        ),
        key=repr,
    )
    assert got == want
    null_rows = [r for r in got if r[0] is None]
    assert len(null_rows) == 1, f"NULL group must be one row: {null_rows}"
