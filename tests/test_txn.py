"""Multi-table atomic commits (prox_spark/txn.py): one txn document's
atomic rename is the visibility flip for a SET of (table → version)
pins — both-or-neither reads, crash-between-commits recovery, CAS
rebase for disjoint txns, abort for overlapping ones. The canonical
composition is a corpus + its secondary value index published
together (the consistency ask behind refresh_value_index)."""

from __future__ import annotations

import threading

import pytest

from pyspark.sql import functions as F

from prox_spark.table import (
    CommitConflictError,
    build_value_index,
    commit_delta,
    commit_snapshot,
    read_manifest,
    refresh_value_index,
)
from prox_spark.txn import (
    txn_commit,
    txn_pinned_versions,
    txn_read,
    txn_state,
)


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("digest"),
    )


def test_both_or_neither_visibility(spark, tmp_path):
    """The txn view flips BOTH tables at once: after staging the
    corpus append AND the index refresh, txn readers still see the old
    pair until the one txn publish, then the new pair."""
    ws = str(tmp_path / "ws")
    t, idx = str(tmp_path / "t"), str(tmp_path / "idx")
    commit_snapshot(spark, t, _docs(spark, 0, 100), stat_cols=["doc_id"], n_files=4)
    build_value_index(spark, t, "digest", idx)
    txn_commit(spark, ws, {t: 1, idx: 1})

    # stage: corpus append + index refresh (versions exist, unpinned)
    prev = read_manifest(spark, t)
    commit_delta(
        spark, t, _docs(spark, 100, 110), list(prev["files"]), update_key_ranges={}
    )
    refresh_value_index(spark, t, idx)
    assert txn_state(spark, ws) == {t: 1, idx: 1}  # still the old pair
    assert txn_read(spark, ws, t).count() == 100
    iv = (read_manifest(spark, idx))["version"]
    txn_commit(spark, ws, {t: 2, idx: iv})
    assert txn_state(spark, ws) == {t: 2, idx: iv}
    assert txn_read(spark, ws, t).count() == 110


def test_crash_between_commits_is_invisible_and_retryable(spark, tmp_path):
    """A writer that committed table versions but crashed before the
    txn publish leaves txn readers on the old state; 'recovery' is
    either retrying the publish (roll-forward) or doing nothing (the
    orphan versions are vacuum fodder)."""
    ws = str(tmp_path / "ws")
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _docs(spark, 0, 50), stat_cols=["doc_id"], n_files=2)
    txn_commit(spark, ws, {t: 1})
    prev = read_manifest(spark, t)
    commit_delta(
        spark, t, _docs(spark, 50, 60), list(prev["files"]), update_key_ranges={}
    )
    # "crash": no txn publish. Readers see v1.
    assert txn_read(spark, ws, t).count() == 50
    # roll-forward: retry the publish; readers flip.
    txn_commit(spark, ws, {t: 2})
    assert txn_read(spark, ws, t).count() == 60


def test_unpinned_version_refused(spark, tmp_path):
    ws = str(tmp_path / "ws")
    t = str(tmp_path / "t")
    commit_snapshot(spark, t, _docs(spark, 0, 10))
    with pytest.raises(ValueError, match="not committed"):
        txn_commit(spark, ws, {t: 7})


def test_unmentioned_tables_carry_forward(spark, tmp_path):
    ws = str(tmp_path / "ws")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    commit_snapshot(spark, a, _docs(spark, 0, 10))
    commit_snapshot(spark, b, _docs(spark, 0, 20))
    txn_commit(spark, ws, {a: 1, b: 1})
    commit_snapshot(spark, a, _docs(spark, 0, 15))
    txn_commit(spark, ws, {a: 2})
    assert txn_state(spark, ws) == {a: 2, b: 1}
    assert txn_read(spark, ws, b).count() == 20


def test_disjoint_concurrent_txns_rebase(spark, tmp_path):
    """Two writers pinning DIFFERENT tables from the same base both
    land (one rebases over the other); overlapping pins abort."""
    ws = str(tmp_path / "ws")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    commit_snapshot(spark, a, _docs(spark, 0, 10))
    commit_snapshot(spark, b, _docs(spark, 0, 10))
    txn_commit(spark, ws, {a: 1, b: 1})
    commit_snapshot(spark, a, _docs(spark, 0, 12))
    commit_snapshot(spark, b, _docs(spark, 0, 14))
    # both derived from txn 1
    txn_commit(spark, ws, {a: 2}, base_txn=1)
    txn_commit(spark, ws, {b: 2}, base_txn=1)  # rebases over txn 2
    assert txn_state(spark, ws) == {a: 2, b: 2}
    # a third writer pinning table a FROM THE STALE BASE must abort
    commit_snapshot(spark, a, _docs(spark, 0, 16))
    with pytest.raises(CommitConflictError, match="moved table"):
        txn_commit(spark, ws, {a: 3}, base_txn=1)


def test_threaded_txn_race_single_winner_per_id(spark, tmp_path):
    """N threads race disjoint txns from the same base: every one must
    land exactly once (rebase loop), ids dense, final state the union."""
    ws = str(tmp_path / "ws")
    tables = []
    for i in range(4):
        t = str(tmp_path / f"t{i}")
        commit_snapshot(spark, t, _docs(spark, 0, 5 + i))
        tables.append(t)
    txn_commit(spark, ws, {t: 1 for t in tables})
    for t in tables:
        commit_snapshot(spark, t, _docs(spark, 0, 30))
    errs = []

    def worker(t):
        try:
            txn_commit(spark, ws, {t: 2}, base_txn=1)
        except Exception as ex:  # noqa: BLE001 - collected for assert
            errs.append(ex)

    threads = [threading.Thread(target=worker, args=(t,)) for t in tables]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    assert txn_state(spark, ws) == {t: 2 for t in tables}
    assert txn_pinned_versions(spark, ws, tables[0]) == {1, 2}


def test_txn_pins_protect_through_vacuum_until_expiry(spark, tmp_path):
    """A version only a txn still names must survive vacuum when its
    pins are passed (extra_pins); expire_txns releases the pin and the
    next cycle reclaims — the tag/drop_tag lifecycle at workspace
    granularity, exercised through vacuum_workspace."""
    from prox_spark.table import read_table, table_versions, vacuum
    from prox_spark.txn import expire_txns, vacuum_workspace

    ws = str(tmp_path / "ws")
    t = str(tmp_path / "t")
    counts = {}
    for v in range(1, 5):  # v1..v4, each a full snapshot of v*10 rows
        commit_snapshot(spark, t, _docs(spark, 0, v * 10))
        txn_commit(spark, ws, {t: v})
        counts[v] = v * 10
    # vacuum WITH pins: every txn-named version survives keep_last=1
    out = vacuum_workspace(
        spark, ws, [t], keep_txns=4, keep_versions=1, retention_minutes=0.0
    )
    assert out["expired_txns"] == [] and out["vacuumed"][t] == []
    for v, n in counts.items():
        assert txn_read(spark, ws, t, txn=v).count() == n
    # expire to the last 2 txns: v1/v2's pins release, next cycle reclaims
    out = vacuum_workspace(
        spark, ws, [t], keep_txns=2, keep_versions=1, retention_minutes=0.0
    )
    assert out["expired_txns"] == [1, 2]
    assert sorted(out["vacuumed"][t]) == [1, 2]
    assert table_versions(spark, t) == [3, 4]
    assert txn_read(spark, ws, t, txn=3).count() == 30
    assert txn_read(spark, ws, t).count() == 40
    with pytest.raises(ValueError):
        txn_read(spark, ws, t, txn=1)  # expired: stops resolving
    with pytest.raises(ValueError):
        expire_txns(spark, ws, keep_last=0)  # the live txn must stay
    # vacuum WITHOUT pins would have dropped v3 (keep_last=1) — prove
    # the pin is what held it, on a fresh unpinned table
    t2 = str(tmp_path / "t2")
    for v in range(1, 4):
        commit_snapshot(spark, t2, _docs(spark, 0, v * 10))
    vacuum(spark, t2, keep_last=1, retention_minutes=0.0)
    assert table_versions(spark, t2) == [3]


def test_publish_revalidates_pins_after_rename(spark, tmp_path, monkeypatch):
    """A vacuum sweeping a pinned version between txn_commit's
    pre-publish validation and the rename landing must not leave a
    published txn pinning vacuumed bytes: the post-publish re-check
    (create_tag recipe) undoes the doc and raises."""
    import prox_spark.txn as X

    a = str(tmp_path / "a")
    commit_snapshot(spark, a, _docs(spark, 0, 5))
    ws = str(tmp_path / "ws")
    real = X._manifest_versions
    calls = {"n": 0}

    def fake(spark_, path, ref="main"):
        calls["n"] += 1
        out = real(spark_, path, ref)
        # call 1 = pre-publish validation (version still there); the
        # post-publish re-check sees it vacuumed away
        return out if calls["n"] <= 1 else [v for v in out if v != 1]

    monkeypatch.setattr(X, "_manifest_versions", fake)
    with pytest.raises(CommitConflictError, match="vacuumed"):
        txn_commit(spark, ws, {a: 1})
    monkeypatch.undo()
    # the half-published doc was rolled back: the workspace is empty
    assert txn_state(spark, ws) == {}


def test_datasource_writer_stages_pins_for_one_publish(spark, tmp_path):
    """format("prox_table") writers with txn_workspace/txn_stage
    record (table -> version) pins; txn_publish_staged folds a
    stage's pins into ONE txn: both-or-neither visibility for
    connector-written sets, max-version composition for repeated
    writes to one table, loud empty-stage failure, and staged-but-
    unpublished pins stay invisible to txn readers."""
    from prox_spark.table_ds import register
    from prox_spark.txn import txn_publish_staged

    register(spark)
    ws = str(tmp_path / "ws")
    t = str(tmp_path / "docs")
    a = str(tmp_path / "agg")
    docs = _docs(spark, 0, 100)

    def w(df, path, mode, stage):
        (
            df.write.format("prox_table").mode(mode)
            .option("txn_workspace", ws).option("txn_stage", stage)
            .save(path)
        )

    with pytest.raises(ValueError, match="no staged writer pins"):
        txn_publish_staged(spark, ws, "s1")
    # two writes to t in one stage: the pin composes to the LAST
    w(docs.filter(F.col("doc_id") < 40), t, "overwrite", "s1")
    w(docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 80)),
      t, "append", "s1")
    w(docs.filter(F.col("doc_id") < 80).groupBy().count(), a,
      "overwrite", "s1")
    n1 = txn_publish_staged(spark, ws, "s1")
    assert n1 == 1
    st = txn_state(spark, ws)
    assert st[t] == 2 and st[a] == 1
    assert txn_read(spark, ws, t).count() == 80
    # a staged-but-unpublished second stage is invisible...
    w(docs.filter(F.col("doc_id") >= 80), t, "append", "s2")
    assert txn_read(spark, ws, t).count() == 80
    # ...and the staged record makes the publish retryable (recovery)
    n2 = txn_publish_staged(spark, ws, "s2")
    assert n2 == 2 and txn_read(spark, ws, t).count() == 100
    # cleaned after publish: a re-publish of the same stage is empty
    with pytest.raises(ValueError, match="no staged writer pins"):
        txn_publish_staged(spark, ws, "s2")
