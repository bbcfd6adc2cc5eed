"""Manifest-log table format (prox_spark/table.py): atomic commits,
snapshot isolation for concurrent readers, time travel, vacuum, and
legacy-directory migration through the upsert operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prox_spark.table import (
    commit_snapshot,
    is_manifest_table,
    read_table,
    table_versions,
    vacuum,
)
from prox_spark.upsert import upsert_parquet


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


def test_commit_and_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    v = commit_snapshot(spark, path, _df(spark, [(1, "a"), (2, "b")]))
    assert v == 1 and is_manifest_table(spark, path)
    assert {(r.id, r.v) for r in read_table(spark, path).collect()} == {
        (1, "a"),
        (2, "b"),
    }


def test_reader_pinned_before_commit_sees_old_version_never_a_mix(spark, tmp_path):
    """The concurrent-reader guarantee: a DataFrame planned against
    version N returns exactly N's rows even if N+1 commits before the
    action runs — the old snapshot's files are immutable and a manifest
    names exactly one snapshot dir, so a mixed read is impossible."""
    path = str(tmp_path / "t")
    commit_snapshot(spark, path, _df(spark, [(i, "old") for i in range(100)]))
    pinned = read_table(spark, path)  # resolves manifest-1 at plan time

    upsert_parquet(spark, path, _df(spark, [(i, "new") for i in range(50)]), ["id"])

    got = pinned.select("v").distinct().collect()
    assert [r.v for r in got] == ["old"], "pinned reader saw writer's rows"
    assert pinned.count() == 100
    # a FRESH read resolves the new manifest: all 100 rows, 50 updated
    fresh = read_table(spark, path)
    assert fresh.count() == 100
    assert fresh.filter(F.col("v") == "new").count() == 50


def test_time_travel_and_versions(spark, tmp_path):
    path = str(tmp_path / "t")
    commit_snapshot(spark, path, _df(spark, [(1, "v1")]))
    commit_snapshot(spark, path, _df(spark, [(1, "v2"), (2, "v2")]))
    assert table_versions(spark, path) == [1, 2]
    assert read_table(spark, path, version=1).count() == 1
    assert read_table(spark, path).count() == 2
    with pytest.raises(ValueError, match="not in"):
        read_table(spark, path, version=9)


def test_vacuum_drops_old_versions_keeps_latest(spark, tmp_path):
    path = str(tmp_path / "t")
    for i in range(4):
        commit_snapshot(spark, path, _df(spark, [(i, f"v{i + 1}")]))
    dropped = vacuum(spark, path, keep_last=2)
    assert dropped == [1, 2]
    assert table_versions(spark, path) == [3, 4]
    assert [r.v for r in read_table(spark, path).collect()] == ["v4"]
    assert [r.v for r in read_table(spark, path, version=3).collect()] == ["v3"]
    with pytest.raises(ValueError, match="not in"):
        read_table(spark, path, version=1)


def test_legacy_plain_dir_migrates_on_first_merge(spark, tmp_path):
    """A pre-manifest plain parquet dir: first upsert merges its rows,
    commits version 1, and removes the shadowed root files."""
    path = str(tmp_path / "legacy")
    _df(spark, [(1, "a"), (2, "b")]).write.parquet(path)
    assert not is_manifest_table(spark, path)

    upsert_parquet(spark, path, _df(spark, [(2, "B")]), ["id"])
    assert is_manifest_table(spark, path)
    got = {(r.id, r.v) for r in read_table(spark, path).collect()}
    assert got == {(1, "a"), (2, "B")}
    # root holds only the manifest log + snapshots now
    import os

    assert sorted(os.listdir(path)) == ["_manifests", "data"]


def test_failed_commit_leaves_table_readable(spark, tmp_path):
    """A crash between snapshot write and manifest publish must leave
    the previous version current; vacuum sweeps the orphan dir."""
    import os

    path = str(tmp_path / "t")
    commit_snapshot(spark, path, _df(spark, [(1, "good")]))
    # simulate the crash: a snapshot dir with no manifest
    orphan = f"{path}/data/snap-00000002-deadbeef"
    _df(spark, [(9, "half-written")]).write.parquet(orphan)

    assert [r.v for r in read_table(spark, path).collect()] == ["good"]
    vacuum(spark, path, keep_last=1)
    assert not os.path.exists(orphan)
    assert [r.v for r in read_table(spark, path).collect()] == ["good"]


def test_delete_keys_commits_new_version_and_time_travel_keeps_old(spark, tmp_path):
    from prox_spark.table import read_table, table_versions
    from prox_spark.upsert import delete_keys, upsert_parquet

    path = str(tmp_path / "t")
    df = spark.createDataFrame([(i, f"u{i}") for i in range(20)], "id BIGINT, name STRING")
    upsert_parquet(spark, path, df, ["id"])
    to_del = spark.createDataFrame([(3,), (7,), (99,)], "id BIGINT")
    n = delete_keys(spark, path, to_del, ["id"])
    assert n == 2  # id 99 never existed
    ids = {r.id for r in read_table(spark, path).collect()}
    assert ids == set(range(20)) - {3, 7}
    # prior version still serves the pre-deletion rows
    v = table_versions(spark, path)
    old = {r.id for r in read_table(spark, path, version=v[-2]).collect()}
    assert old == set(range(20))


def test_delete_keys_rejects_unknown_key_column(spark, tmp_path):
    import pytest

    from prox_spark.upsert import delete_keys, upsert_parquet

    path = str(tmp_path / "t")
    upsert_parquet(
        spark, path, spark.createDataFrame([(1, "a")], "id BIGINT, name STRING"), ["id"]
    )
    with pytest.raises(ValueError, match="not in table schema"):
        delete_keys(spark, path, spark.createDataFrame([(1,)], "nope BIGINT"), ["nope"])


def test_upsert_add_column_evolution(spark, tmp_path):
    from pyspark.sql import functions as F

    from prox_spark.table import read_table, table_versions
    from prox_spark.upsert import upsert_parquet

    path = str(tmp_path / "t")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id BIGINT, name STRING")
    upsert_parquet(spark, path, v1, ["id"])
    v2 = spark.createDataFrame(
        [(2, "b2", 0.9), (3, "c", 0.5)], "id BIGINT, name STRING, score DOUBLE"
    )
    # without the flag: schema mismatch is still an error
    import pytest

    with pytest.raises(ValueError, match="schema mismatch"):
        upsert_parquet(spark, path, v2, ["id"])
    upsert_parquet(spark, path, v2, ["id"], evolve=True)
    got = {r.id: (r.name, r.score) for r in read_table(spark, path).collect()}
    # old row null-fills the new column; updated/new rows carry values
    assert got == {1: ("a", None), 2: ("b2", 0.9), 3: ("c", 0.5)}
    # time travel still serves the pre-evolution schema
    v = table_versions(spark, path)
    old = read_table(spark, path, version=v[-2])
    assert old.columns == ["id", "name"]


def test_upsert_evolution_rejects_dropped_columns(spark, tmp_path):
    import pytest

    from prox_spark.upsert import upsert_parquet

    path = str(tmp_path / "t")
    upsert_parquet(
        spark, path, spark.createDataFrame([(1, "a")], "id BIGINT, name STRING"), ["id"]
    )
    narrower = spark.createDataFrame([(2,)], "id BIGINT")
    with pytest.raises(ValueError, match="drop columns"):
        upsert_parquet(spark, path, narrower, ["id"], evolve=True)
