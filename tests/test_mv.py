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


# --- the READ path: read_mv_current / rewrite_aggregate ---------------------


def _norm_path(p: str) -> str:
    return "/" + p.split("file:", 1)[-1].lstrip("/") if p.startswith(
        "file:"
    ) else p


def test_read_mv_current_is_exact_without_publish(spark):
    """Post-refresh base commits are folded at READ time: the answer
    matches the direct aggregate while the view's version (and covered
    lineage) never move."""
    from prox_spark.mv import read_mv_current

    s = _scratch()
    base, mv = f"{s}/base", f"{s}/mv"
    commit_snapshot(spark, base, _df(spark, 0, 100),
                    stat_cols=["id"], n_files=4)
    create_mv(spark, base, mv, ["grp"], ["val"])
    refresh_mv(spark, mv)
    v0 = int(read_manifest(spark, mv)["version"])
    # base moves on after the refresh
    prev = read_manifest(spark, base)
    commit_delta(spark, base, _df(spark, 100, 140),
                 list(prev["files"]), update_key_ranges={})
    delete_keys_mor(
        spark, base,
        spark.range(140).filter("id % 4 = 0").select("id"), ["id"],
    )
    upsert_parquet(
        spark, base,
        _df(spark, 0, 140).filter("id % 9 = 1")
        .withColumn("val", F.col("val") + 3),
        ["id"],
    )
    got = sorted(map(tuple, read_mv_current(spark, mv)
                 .select("grp", COUNT_COL, "sum_val").collect()))
    assert got == _direct(spark, base)
    assert int(read_manifest(spark, mv)["version"]) == v0, "zero publish"
    # stored contents are still the covered snapshot, not the fold
    assert mv_info(spark, mv)["version"] < int(
        read_manifest(spark, base)["version"]
    )


def test_read_mv_current_covered_view_reads_only_mv_files(spark):
    """A view refreshed to head serves from its OWN files alone — the
    plan must not touch the base table at all."""
    from prox_spark.mv import read_mv_current

    s = _scratch()
    base, mv = f"{s}/base", f"{s}/mv"
    commit_snapshot(spark, base, _df(spark, 0, 80),
                    stat_cols=["id"], n_files=4)
    create_mv(spark, base, mv, ["grp"], ["val"])
    cur = read_mv_current(spark, mv)
    files = [_norm_path(f) for f in cur.inputFiles()]
    assert files, "plan must read the stored view"
    assert all(f.startswith(f"{s}/mv") for f in files), files
    assert sorted(map(tuple, cur.collect())) == _direct(spark, base)


def test_read_mv_current_join_view_both_sides_moved(spark):
    from prox_spark.mv import create_join_mv, read_mv_current

    s = _scratch()
    left, right, mv = f"{s}/l", f"{s}/r", f"{s}/mv"
    commit_snapshot(spark, left, _df(spark, 0, 80),
                    stat_cols=["id"], n_files=4)
    commit_snapshot(spark, right, _dims(spark, 0),
                    stat_cols=["grp"], n_files=2)
    create_join_mv(spark, left, right, mv, ["grp"], ["grp"], ["val", "w"])
    mv_v = int(read_manifest(spark, mv)["version"])
    prev = read_manifest(spark, left)
    commit_delta(spark, left, _df(spark, 80, 100),
                 list(prev["files"]), update_key_ranges={})
    upsert_parquet(
        spark, right, _dims(spark, 3).filter("grp IN ('g0', 'g2')"), ["grp"],
    )
    got = sorted(
        map(
            tuple,
            read_mv_current(spark, mv)
            .select("grp", COUNT_COL, "sum_val", "sum_w")
            .collect(),
        )
    )
    assert got == _direct_join(spark, left, right)
    assert int(read_manifest(spark, mv)["version"]) == mv_v


def test_rewrite_aggregate_routes_and_rolls_up(spark):
    """A covering view answers the aggregate (exact grain AND a
    coarser roll-up grain); a non-covering request falls back to the
    base with the identical schema."""
    from prox_spark.mv import rewrite_aggregate

    s = _scratch()
    base, mv = f"{s}/base", f"{s}/mv"
    df = spark.range(0, 120).select(
        F.col("id"),
        F.concat(F.lit("g"), (F.col("id") % 5).cast("string")).alias("grp"),
        (F.col("id") % 2 == 0).cast("string").alias("even"),
        (F.col("id") * 10).alias("val"),
    )
    commit_snapshot(spark, base, df, stat_cols=["id"], n_files=4)
    create_mv(spark, base, mv, ["grp", "even"], ["val"])
    delete_keys_mor(
        spark, base, spark.range(0, 120, 7).select("id"), ["id"],
    )

    def direct(keys):
        return sorted(
            map(
                tuple,
                read_table(spark, base).groupBy(*keys).agg(
                    F.count(F.lit(1)).cast("long").alias(COUNT_COL),
                    F.sum("val").alias("sum_val"),
                ).collect(),
            )
        )

    exact, hit = rewrite_aggregate(
        spark, base, ["grp", "even"], ["val"], [mv]
    )
    assert hit == mv
    assert sorted(map(tuple, exact.collect())) == direct(["grp", "even"])

    rolled, hit2 = rewrite_aggregate(spark, base, ["grp"], ["val"], [mv])
    assert hit2 == mv
    assert sorted(map(tuple, rolled.collect())) == direct(["grp"])

    # requesting a sum the view doesn't carry: fall back to the base
    fb, miss = rewrite_aggregate(spark, base, ["grp"], ["id"], [mv])
    assert miss is None
    assert fb.columns == ["grp", COUNT_COL, "sum_id"]


def test_rewrite_never_scans_untouched_covered_base_files(spark):
    """The serve-from-view plan opens the view's files plus the delta
    window's commit files ONLY — a covered-history base file untouched
    by post-refresh commits must not appear in the scan."""
    from prox_spark.mv import rewrite_aggregate
    from prox_spark.table import table_versions

    s = _scratch()
    base, mv = f"{s}/base", f"{s}/mv"
    commit_snapshot(spark, base, _df(spark, 0, 200),
                    stat_cols=["id"], n_files=8)
    create_mv(spark, base, mv, ["grp"], ["val"])
    covered = int(mv_info(spark, mv)["version"])
    covered_files = set(read_manifest(spark, base, covered)["files"])
    # a narrow post-refresh commit: delete a few low ids (stats-pruned
    # MoR targets only the low-range files)
    delete_keys_mor(
        spark, base, spark.range(0, 10).select("id"), ["id"],
    )
    # files referenced by the delta window (added/removed/targets/keys)
    window: set[str] = set()
    versions = table_versions(spark, base)
    prev_m = read_manifest(spark, base, covered)
    for v in [x for x in versions if x > covered]:
        cur_m = read_manifest(spark, base, v)
        pf, cf = set(prev_m["files"]), set(cur_m["files"])
        window |= cf - pf
        window |= pf - cf
        prev_entries = {d["file"] for d in (prev_m.get("deletes") or [])}
        for e in cur_m.get("deletes") or []:
            if e["file"] in prev_entries:
                continue
            window.add(e["file"])
            window.update(e["targets"])
        prev_m = cur_m
    untouched = covered_files - window
    assert untouched, "staging must leave untouched covered files"

    out, hit = rewrite_aggregate(spark, base, ["grp"], ["val"], [mv])
    assert hit == mv
    opened = {_norm_path(f) for f in out.inputFiles()}
    bad = {
        f for f in untouched
        if f"{s}/base/{f}" in opened or _norm_path(f) in opened
    }
    assert not bad, f"untouched covered base files scanned: {bad}"
    assert any(f.startswith(f"{s}/mv") for f in opened), "must read the view"
    assert sorted(
        map(tuple, out.collect())
    ) == _direct(spark, base)


# --- min/max MV class (q184 algebra, operationalized) -----------------------


def _direct_ext(spark, base):
    return sorted(
        map(
            tuple,
            read_table(spark, base)
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).cast("long").alias(COUNT_COL),
                F.sum("val").alias("sum_val"),
                F.min("val").alias("min_val"),
                F.max("val").alias("max_val"),
            )
            .collect(),
        )
    )


def test_minmax_mv_recomputes_only_keeper_groups(spark):
    """Deleting a group's stored max forces a recompute of THAT group
    only; groups with non-extreme deletes and pure inserts maintain
    algebraically (recomputed_groups pins the bound)."""
    s = _scratch()
    base, mv = f"{s}/base", f"{s}/mv"
    commit_snapshot(spark, base, _df(spark, 0, 100),
                    stat_cols=["id"], n_files=4)
    create_mv(spark, base, mv, ["grp"], ["val"],
              mins=["val"], maxs=["val"])
    assert _mv_rows(spark, mv) == _direct_ext(spark, base)

    # g0's max is id=95 (val 950); g1's max is id=96... delete g0's and
    # g1's argmax rows (ids 95, 96) — keeper deletes — plus a
    # NON-extreme row of g2 (id 2, val 20; g2 min is id 7? no:
    # grp = g(id%5): g2 holds ids 2,7,...,97; min val = 20 (id 2)...
    # id 2 IS g2's min — pick id 52 instead (mid-range, not extreme).
    delete_keys_mor(
        spark, base,
        spark.createDataFrame([(95,), (96,), (52,)], "id long"), ["id"],
    )
    # and append fresh rows for g3/g4 (insert-only fold)
    prev = read_manifest(spark, base)
    commit_delta(spark, base, _df(spark, 100, 110),
                 list(prev["files"]), update_key_ranges={})
    out = refresh_mv(spark, mv)
    assert out["refreshed"] and out["mode"] == "incremental"
    assert out["recomputed_groups"] == 2, out
    assert _mv_rows(spark, mv) == _direct_ext(spark, base)
    # the refresh is still ONE commit with the bumped lineage
    assert mv_info(spark, mv)["version"] == read_manifest(
        spark, base
    )["version"]


def test_minmax_mv_insert_only_never_recomputes(spark):
    s = _scratch()
    base, mv = f"{s}/base", f"{s}/mv"
    commit_snapshot(spark, base, _df(spark, 0, 60),
                    stat_cols=["id"], n_files=2)
    create_mv(spark, base, mv, ["grp"], ["val"],
              mins=["val"], maxs=["val"])
    prev = read_manifest(spark, base)
    commit_delta(spark, base, _df(spark, 60, 90),
                 list(prev["files"]), update_key_ranges={})
    out = refresh_mv(spark, mv)
    assert out["recomputed_groups"] == 0, out
    assert _mv_rows(spark, mv) == _direct_ext(spark, base)


def test_minmax_mv_read_and_rewrite_paths(spark):
    """read_mv_current folds extremes at read time (including the
    keeper-delete recompute) with zero publish; rewrite_aggregate
    covers min/max requests and rolls min-of-mins/max-of-maxs."""
    from prox_spark.mv import read_mv_current, rewrite_aggregate

    s = _scratch()
    base, mv = f"{s}/base", f"{s}/mv"
    commit_snapshot(spark, base, _df(spark, 0, 100),
                    stat_cols=["id"], n_files=4)
    create_mv(spark, base, mv, ["grp"], ["val"],
              mins=["val"], maxs=["val"])
    refresh_mv(spark, mv)
    v0 = int(read_manifest(spark, mv)["version"])
    # post-refresh keeper delete (g0 max id=95) + append
    delete_keys_mor(
        spark, base,
        spark.createDataFrame([(95,)], "id long"), ["id"],
    )
    prev = read_manifest(spark, base)
    commit_delta(spark, base, _df(spark, 100, 105),
                 list(prev["files"]), update_key_ranges={})
    got = sorted(
        map(
            tuple,
            read_mv_current(spark, mv)
            .select("grp", COUNT_COL, "sum_val", "min_val", "max_val")
            .collect(),
        )
    )
    assert got == _direct_ext(spark, base)
    assert int(read_manifest(spark, mv)["version"]) == v0

    out, hit = rewrite_aggregate(
        spark, base, ["grp"], [], [mv], mins=["val"], maxs=["val"]
    )
    assert hit == mv
    want = sorted(
        map(
            tuple,
            read_table(spark, base).groupBy("grp").agg(
                F.count(F.lit(1)).cast("long").alias(COUNT_COL),
                F.min("val").alias("min_val"),
                F.max("val").alias("max_val"),
            ).collect(),
        )
    )
    assert sorted(map(tuple, out.collect())) == want
    # a min the view doesn't carry falls back to the base
    _, miss = rewrite_aggregate(
        spark, base, ["grp"], [], [mv], mins=["id"]
    )
    assert miss is None


def test_rewrite_join_aggregate_routes_and_falls_back(spark):
    """A count/sum aggregate over left ⋈ right routes to a covering
    registered join view (either base order) with BOTH bases moved
    post-refresh — served through the three-term read-time fold; a
    different join key or a missing sum falls back to the direct
    join with the identical schema."""
    from prox_spark.mv import create_join_mv, rewrite_join_aggregate

    s = _scratch()
    left, right, mv = f"{s}/l", f"{s}/r", f"{s}/mv"
    commit_snapshot(spark, left, _df(spark, 0, 80),
                    stat_cols=["id"], n_files=4)
    commit_snapshot(spark, right, _dims(spark, 0),
                    stat_cols=["grp"], n_files=2)
    create_join_mv(spark, left, right, mv, ["grp"], ["grp"], ["val", "w"])
    # both sides move AFTER registration, no refresh
    prev = read_manifest(spark, left)
    commit_delta(spark, left, _df(spark, 80, 100),
                 list(prev["files"]), update_key_ranges={})
    delete_keys_mor(
        spark, left, spark.range(0, 100, 9).select("id"), ["id"],
    )
    upsert_parquet(
        spark, right, _dims(spark, 5).filter("grp IN ('g1', 'g3')"),
        ["grp"],
    )
    out, hit = rewrite_join_aggregate(
        spark, right, left, ["grp"], ["grp"], ["val"], [mv]
    )
    assert hit == mv
    want = sorted(
        map(
            tuple,
            read_table(spark, left).join(read_table(spark, right), "grp")
            .groupBy("grp").agg(
                F.count(F.lit(1)).cast("long").alias(COUNT_COL),
                F.sum("val").alias("sum_val"),
            ).collect(),
        )
    )
    assert sorted(map(tuple, out.collect())) == want
    # a sum the view doesn't carry: fallback (schema identical)
    fb, miss = rewrite_join_aggregate(
        spark, left, right, ["grp"], ["grp"], ["id"], [mv]
    )
    assert miss is None and fb.columns == ["grp", COUNT_COL, "sum_id"]


# --- base-schema evolution: recorded columns resolve through renames --------


def test_refresh_resolves_renamed_columns(spark):
    """Renaming a recorded sum/extreme column AND a group-key column
    on the base: refresh resolves through the rename history, folds
    exactly, and the VIEW's own schema never shifts (still sum_val /
    min_val / max_val keyed by grp)."""
    from prox_spark.table import rename_column

    s = _scratch()
    base, mv = f"{s}/base", f"{s}/mv"
    commit_snapshot(spark, base, _df(spark, 0, 100),
                    stat_cols=["id"], n_files=4)
    create_mv(spark, base, mv, ["grp"], ["val"],
              mins=["val"], maxs=["val"])
    rename_column(spark, base, "val", "val2")
    rename_column(spark, base, "grp", "grp2")
    # churn under the NEW names (keeper delete id=95 forces the
    # extremes recompute through the restored-name scope)
    delete_keys_mor(
        spark, base,
        spark.createDataFrame([(95,), (12,)], "id long"), ["id"],
    )
    prev = read_manifest(spark, base)
    commit_delta(
        spark, base,
        _df(spark, 100, 120).withColumnRenamed("val", "val2")
        .withColumnRenamed("grp", "grp2"),
        list(prev["files"]), update_key_ranges={},
    )
    out = refresh_mv(spark, mv)
    assert out["refreshed"] and out["mode"] == "incremental"
    assert read_table(spark, mv).columns == [
        "grp", COUNT_COL, "sum_val", "min_val", "max_val",
    ]
    want = sorted(
        map(
            tuple,
            read_table(spark, base).groupBy("grp2").agg(
                F.count(F.lit(1)).cast("long").alias(COUNT_COL),
                F.sum("val2").alias("sum_val"),
                F.min("val2").alias("min_val"),
                F.max("val2").alias("max_val"),
            ).collect(),
        )
    )
    assert _mv_rows(spark, mv) == want
    # a SECOND refresh after more churn chains onto the same mapping
    delete_keys_mor(
        spark, base, spark.createDataFrame([(33,)], "id long"), ["id"],
    )
    refresh_mv(spark, mv)
    assert read_table(spark, mv).filter(
        F.col(COUNT_COL) <= 0
    ).count() == 0


def test_feed_spanning_rename_coalesces_generations(spark):
    """ONE refresh whose window holds commits from BEFORE and AFTER
    the rename: the feed carries both name generations (NULL-backfilled
    union) and the fold coalesces them into the recorded name."""
    from prox_spark.table import rename_column

    s = _scratch()
    base, mv = f"{s}/base", f"{s}/mv"
    commit_snapshot(spark, base, _df(spark, 0, 60),
                    stat_cols=["id"], n_files=2)
    create_mv(spark, base, mv, ["grp"], ["val"])
    # pre-rename commit in the window
    prev = read_manifest(spark, base)
    commit_delta(spark, base, _df(spark, 60, 80),
                 list(prev["files"]), update_key_ranges={})
    rename_column(spark, base, "val", "val2")
    # post-rename commit in the same window
    prev = read_manifest(spark, base)
    commit_delta(
        spark, base, _df(spark, 80, 95).withColumnRenamed("val", "val2"),
        list(prev["files"]), update_key_ranges={},
    )
    refresh_mv(spark, mv)
    want = sorted(
        map(
            tuple,
            read_table(spark, base).groupBy("grp").agg(
                F.count(F.lit(1)).cast("long").alias(COUNT_COL),
                F.sum("val2").alias("sum_val"),
            ).collect(),
        )
    )
    assert _mv_rows(spark, mv) == want


def test_read_path_resolves_renames_without_publish(spark):
    from prox_spark.mv import read_mv_current
    from prox_spark.table import rename_column

    s = _scratch()
    base, mv = f"{s}/base", f"{s}/mv"
    commit_snapshot(spark, base, _df(spark, 0, 50),
                    stat_cols=["id"], n_files=2)
    create_mv(spark, base, mv, ["grp"], ["val"])
    rename_column(spark, base, "val", "v9")
    delete_keys_mor(
        spark, base, spark.range(0, 50, 7).select("id"), ["id"],
    )
    got = sorted(map(tuple, read_mv_current(spark, mv)
                 .select("grp", COUNT_COL, "sum_val").collect()))
    want = sorted(
        map(
            tuple,
            read_table(spark, base).groupBy("grp").agg(
                F.count(F.lit(1)).cast("long").alias(COUNT_COL),
                F.sum("v9").alias("sum_val"),
            ).collect(),
        )
    )
    assert got == want


def test_dropped_recorded_column_raises_loudly(spark):
    """Dropping a recorded column must raise MvSchemaError — never the
    silent full-recompute fallback (which would fold a wrong or absent
    column), and never a publish."""
    import pytest

    from prox_spark.mv import MvSchemaError, read_mv_current
    from prox_spark.table import drop_column

    s = _scratch()
    base, mv = f"{s}/base", f"{s}/mv"
    commit_snapshot(spark, base, _df(spark, 0, 40),
                    stat_cols=["id"], n_files=2)
    create_mv(spark, base, mv, ["grp"], ["val"])
    drop_column(spark, base, "val")
    v0 = int(read_manifest(spark, mv)["version"])
    with pytest.raises(MvSchemaError, match="re-create"):
        refresh_mv(spark, mv)
    with pytest.raises(MvSchemaError, match="re-create"):
        read_mv_current(spark, mv).collect()
    assert int(read_manifest(spark, mv)["version"]) == v0


def test_join_view_rename_raises_loudly(spark):
    import pytest

    from prox_spark.mv import (
        MvSchemaError,
        create_join_mv,
        refresh_join_mv,
    )
    from prox_spark.table import rename_column

    s = _scratch()
    left, right, mv = f"{s}/l", f"{s}/r", f"{s}/mv"
    commit_snapshot(spark, left, _df(spark, 0, 40),
                    stat_cols=["id"], n_files=2)
    commit_snapshot(spark, right, _dims(spark, 0))
    create_join_mv(spark, left, right, mv, ["grp"], ["grp"], ["val", "w"])
    rename_column(spark, left, "val", "val_x")
    with pytest.raises(MvSchemaError, match="join views do not resolve"):
        refresh_join_mv(spark, mv)


def test_minmax_mv_upsert_echo_pairs_net_out(spark):
    """An upsert echoes co-rewritten UNCHANGED rows as cancelling
    delete+insert pairs; extremes must fold from NET multiplicities —
    a raw insert-side fold would let a cancelled value stick, a raw
    delete-side fold would mis-trigger maintenance. Also covers the
    genuine update-of-the-extreme case (delete 950 / insert 9999 in
    one window → recompute, exact)."""
    s = _scratch()
    base, mv = f"{s}/base", f"{s}/mv"
    commit_snapshot(spark, base, _df(spark, 0, 100),
                    stat_cols=["id"], n_files=2)
    create_mv(spark, base, mv, ["grp"], ["val"],
              mins=["val"], maxs=["val"])
    # upsert rewrites files co-holding many rows: id 95 (g0's max,
    # val 950) gets val 9999; id 3 (mid g3) gets val -7 (new g3 min)
    upsert_parquet(
        spark, base,
        spark.createDataFrame([(95, "g0", 9999), (3, "g3", -7)],
                              "id long, grp string, val long"),
        ["id"],
    )
    out = refresh_mv(spark, mv)
    assert out["refreshed"]
    assert _mv_rows(spark, mv) == _direct_ext(spark, base)
    rows = {r["grp"]: r for r in read_table(spark, mv).collect()}
    assert rows["g0"]["max_val"] == 9999
    assert rows["g3"]["min_val"] == -7

def test_mv_stream_batch_extremes_recompute_pinned_to_batch_end(spark):
    """ADVICE r9: a min/max view's streaming recompute must read the
    base AT the batch's end version, not the live head — a lagging
    batch (head already ahead) otherwise bakes post-end changes into
    groups claiming coverage `end`, and the next batch double-folds
    those versions' count/sum deltas."""
    from prox_spark.mv import mv_stream_batch
    from prox_spark.upsert import delete_keys

    s = _scratch()
    base, mv = f"{s}/base", f"{s}/mv"
    commit_snapshot(spark, base, _df(spark, 0, 30),
                    stat_cols=["id"], n_files=2)
    create_mv(spark, base, mv, ["grp"], ["val"],
              mins=["val"], maxs=["val"])

    # v2: delete every group's stored min (ids 0..4) — forces the
    # extremes recompute path for all 5 groups
    delete_keys(spark, base, spark.range(0, 5).select("id"), ["id"])
    # v3: append rows with NEW extreme values — the live head the
    # lagging batch must NOT see
    v3_rows = spark.range(200, 210).select(
        F.col("id"),
        F.concat(F.lit("g"), (F.col("id") % 5).cast("string")).alias("grp"),
        (-F.col("id") * 10).alias("val"),
    )
    prev = read_manifest(spark, base)
    commit_delta(spark, base, v3_rows, list(prev["files"]),
                 update_key_ranges={})

    def agg_at(version):
        return sorted(
            map(
                tuple,
                read_table(spark, base, version=version)
                .groupBy("grp")
                .agg(
                    F.count(F.lit(1)).cast("long").alias(COUNT_COL),
                    F.sum("val").alias("sum_val"),
                    F.min("val").alias("min_val"),
                    F.max("val").alias("max_val"),
                )
                .collect(),
            )
        )

    # the LAGGING batch: only v2's delete rows, while head is v3
    v2_feed = _df(spark, 0, 5).select(
        "*", F.lit("delete").alias("_change_type"),
        F.lit(2).cast("long").alias("_commit_version"),
    )
    mv_stream_batch(v2_feed, 0, mv)
    assert _mv_rows(spark, mv) == agg_at(2), (
        "lagging batch must materialize the v2 state, not leak v3"
    )
    # the catch-up batch folds v3; the result must be exact (no
    # double-counted v3 slice)
    v3_feed = v3_rows.select(
        "*", F.lit("insert").alias("_change_type"),
        F.lit(3).cast("long").alias("_commit_version"),
    )
    mv_stream_batch(v3_feed, 1, mv)
    assert _mv_rows(spark, mv) == agg_at(3)

def test_rewrite_join_aggregate_serves_avg(spark):
    """An AVG over the joined frame derives exactly from the covering
    join view's count+sum — bit-identical to the direct join
    aggregate's sum/count division."""
    from prox_spark.mv import create_join_mv, rewrite_join_aggregate

    s = _scratch()
    left, right, mv = f"{s}/l", f"{s}/r", f"{s}/mv"
    commit_snapshot(spark, left, _df(spark, 0, 60),
                    stat_cols=["id"], n_files=2)
    commit_snapshot(spark, right, _dims(spark, 0),
                    stat_cols=["grp"], n_files=1)
    create_join_mv(spark, left, right, mv, ["grp"], ["grp"], ["val", "w"])
    prev = read_manifest(spark, left)
    commit_delta(spark, left, _df(spark, 60, 90),
                 list(prev["files"]), update_key_ranges={})
    out, hit = rewrite_join_aggregate(
        spark, left, right, ["grp"], ["grp"], [], [mv], avgs=["val"]
    )
    assert hit == mv
    assert out.columns == ["grp", COUNT_COL, "avg_val"]
    want = sorted(
        map(
            tuple,
            read_table(spark, left).join(read_table(spark, right), "grp")
            .groupBy("grp").agg(
                F.count(F.lit(1)).cast("long").alias(COUNT_COL),
                F.round(
                    F.sum("val") / F.count(F.lit(1)), 6
                ).alias("avg_val"),
            ).collect(),
        )
    )
    assert sorted(map(tuple, out.collect())) == want
    # fallback schema identical when nothing covers
    fb, miss = rewrite_join_aggregate(
        spark, left, right, ["grp"], ["grp"], [], [], avgs=["val"]
    )
    assert miss is None and fb.columns == ["grp", COUNT_COL, "avg_val"]
    assert sorted(map(tuple, fb.collect())) == want
