"""Secondary inverted value index (prox_spark/table.py
build_value_index / read_table_point_indexed): point lookups on a
NON-cluster column that scan only the files holding the value plus the
unindexed tail born after the index — never the whole table. The
reference has no indexing at all (every Athena/KPI query scans);
manifest min/max covers only the cluster columns, so this is the
content-addressed-lookup path a 10^5-file table needs."""

from __future__ import annotations

from pyspark.sql import functions as F

from prox_spark.table import (
    build_value_index,
    commit_delta,
    commit_snapshot,
    compact_table,
    indexed_point_files,
    maintain_table,
    read_manifest,
    read_table_point_indexed,
    refresh_value_index,
)


def _mkdocs(spark, n=400):
    # digest-like value column deliberately uncorrelated with the
    # cluster key: md5 of the id
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("digest"),
        (F.col("id") % 7).alias("grp"),
    )


def _stage(spark, tmp_path, n_files=16):
    path = str(tmp_path / "t")
    idx = str(tmp_path / "t_digest_idx")
    commit_snapshot(
        spark, path, _mkdocs(spark), stat_cols=["doc_id"], n_files=n_files
    )
    v = build_value_index(spark, path, "digest", idx)
    return path, idx, v


def test_indexed_probe_matches_full_scan_and_prunes(spark, tmp_path):
    path, idx, v = _stage(spark, tmp_path)
    probe = spark.range(1).select(F.md5(F.lit("123"))).first()[0]
    got = read_table_point_indexed(spark, path, idx, v, "digest", probe)
    assert [r["doc_id"] for r in got.collect()] == [123]
    # pruning: the digest lives in exactly one of the 16 files
    _, targets, n_live = indexed_point_files(
        spark, path, idx, v, "digest", probe
    )
    assert n_live == 16 and len(targets) == 1


def test_indexed_probe_handles_duplicated_values(spark, tmp_path):
    """A value spread across several files must return every row —
    the index names all incident files, not just one."""
    path = str(tmp_path / "t")
    idx = str(tmp_path / "idx")
    # same digest on ids landing in different doc_id ranges (files are
    # range-clustered on doc_id, so copies span files)
    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 100 == 7, F.lit("SHARED"))
        .otherwise(F.md5(F.col("id").cast("string")))
        .alias("digest"),
    )
    commit_snapshot(spark, path, df, stat_cols=["doc_id"], n_files=8)
    v = build_value_index(spark, path, "digest", idx)
    got = read_table_point_indexed(spark, path, idx, v, "digest", "SHARED")
    assert sorted(r["doc_id"] for r in got.collect()) == [7, 107, 207]
    _, targets, n_live = indexed_point_files(
        spark, path, idx, v, "digest", "SHARED"
    )
    assert 1 <= len(targets) <= 3 < n_live


def test_stale_index_still_finds_fresh_rows(spark, tmp_path):
    """Files born after the indexed version are scanned
    unconditionally, so appends need no rebuild."""
    path, idx, v = _stage(spark, tmp_path)
    fresh = spark.createDataFrame(
        [(9_000_000, "FRESH_DIGEST", 0)], "doc_id long, digest string, grp long"
    )
    prev = read_manifest(spark, path)
    commit_delta(
        spark, path, fresh, list(prev["files"]), update_key_ranges={}
    )
    got = read_table_point_indexed(
        spark, path, idx, v, "digest", "FRESH_DIGEST"
    )
    assert [r["doc_id"] for r in got.collect()] == [9_000_000]
    # an indexed value still prunes: its file + the one fresh file
    probe = spark.range(1).select(F.md5(F.lit("42"))).first()[0]
    _, targets, n_live = indexed_point_files(
        spark, path, idx, v, "digest", probe
    )
    assert n_live == 17 and len(targets) == 2
    got2 = read_table_point_indexed(spark, path, idx, v, "digest", probe)
    assert [r["doc_id"] for r in got2.collect()] == [42]


def test_index_survives_compaction_via_refresh(spark, tmp_path):
    """A full compaction re-births every file, so an unrefreshed index
    degrades probes to scanning the whole rewritten tail (still
    CORRECT); refresh_value_index restores pruned probes and records
    the new covered version in the index manifest."""
    path, idx, v = _stage(spark, tmp_path)
    probe = spark.range(1).select(F.md5(F.lit("250"))).first()[0]
    compact_table(spark, path, n_files=16)
    # unrefreshed: correct, but the probe must scan every live file
    # (all born after the indexed version)
    _, targets, n_live = indexed_point_files(spark, path, idx, v, "digest", probe)
    assert len(targets) == n_live == 16
    got = read_table_point_indexed(spark, path, idx, v, "digest", probe)
    assert [r["doc_id"] for r in got.collect()] == [250]
    # refresh: scans only the post-index births, prunes again
    new_v = refresh_value_index(spark, path, idx)
    assert new_v == read_manifest(spark, path)["version"]
    assert read_manifest(spark, idx)["index_of"] == {
        "col": "digest", "version": new_v
    }
    m, targets, n_live = indexed_point_files(
        spark, path, idx, None, "digest", probe
    )
    assert n_live == 16 and len(targets) == 1
    got2 = read_table_point_indexed(spark, path, idx, None, "digest", probe)
    assert [r["doc_id"] for r in got2.collect()] == [250]
    # idempotent: nothing born since — no new index version committed
    idx_v = read_manifest(spark, idx)["version"]
    assert refresh_value_index(spark, path, idx) == new_v
    assert read_manifest(spark, idx)["version"] == idx_v


def test_refresh_is_incremental_for_appends(spark, tmp_path):
    """Refresh after a pure append indexes ONLY the appended file —
    the delta commit carries every prior index file verbatim."""
    path, idx, v = _stage(spark, tmp_path)
    fresh = spark.createDataFrame(
        [(9_000_000, "FRESH_DIGEST", 0)], "doc_id long, digest string, grp long"
    )
    prev = read_manifest(spark, path)
    commit_delta(spark, path, fresh, list(prev["files"]), update_key_ranges={})
    idx_before = set(read_manifest(spark, idx)["files"])
    refresh_value_index(spark, path, idx)
    mi = read_manifest(spark, idx)
    # prior index files all carried; exactly the small delta is new
    assert idx_before < set(mi["files"])
    # the fresh digest now probes through the INDEX (not the tail rule)
    _, targets, n_live = indexed_point_files(
        spark, path, idx, None, "digest", "FRESH_DIGEST"
    )
    assert n_live == 17 and len(targets) == 1
    got = read_table_point_indexed(
        spark, path, idx, None, "digest", "FRESH_DIGEST"
    )
    assert [r["doc_id"] for r in got.collect()] == [9_000_000]


def test_maintain_table_refreshes_registered_indexes(spark, tmp_path):
    """maintain_table(value_indexes=[...]) folds the index refresh into
    the OPTIMIZE cadence: after its compaction the registered index is
    advanced in the same pass, so probes never sit degraded between a
    maintenance cycle and a manual rebuild."""
    path, idx, v = _stage(spark, tmp_path)
    # accrue delete entries so maintain_table takes the fold path
    # (compact_table = full rewrite, the worst case for the index)
    from prox_spark.table import commit_delete_file

    for probe_id in (11, 12, 13, 14, 15):
        dg = spark.range(1).select(
            F.md5(F.lit(str(probe_id)))
        ).first()[0]
        m = read_manifest(spark, path)
        commit_delete_file(
            spark, path,
            spark.createDataFrame([(dg,)], "digest string"),
            ["digest"], list(m["files"]),
        )
    out = maintain_table(
        spark, path, retention_minutes=0.0, value_indexes=[idx]
    )
    assert out["folded_deletes"] is True
    cur_v = read_manifest(spark, path)["version"]
    assert out["refreshed_indexes"] == {idx: cur_v}
    probe = spark.range(1).select(F.md5(F.lit("300"))).first()[0]
    _, targets, n_live = indexed_point_files(
        spark, path, idx, None, "digest", probe
    )
    assert len(targets) < n_live
    got = read_table_point_indexed(spark, path, idx, None, "digest", probe)
    assert [r["doc_id"] for r in got.collect()] == [300]
    # a deleted digest stays deleted through the indexed path
    dg11 = spark.range(1).select(F.md5(F.lit("11"))).first()[0]
    assert read_table_point_indexed(
        spark, path, idx, None, "digest", dg11
    ).count() == 0


def test_renamed_indexed_column_raises_loudly(spark, tmp_path):
    """Renaming (or dropping) the indexed column on the base: probes
    and refreshes must raise a clear rebuild error — the index's
    incidences key on the old physical name, and a silent probe under
    the new name would skip indexed files. An index rebuilt on the
    current name serves again."""
    import pytest

    from prox_spark.table import rename_column

    path, idx, _v = _stage(spark, tmp_path)
    rename_column(spark, path, "digest", "content_hash")
    probe = spark.range(1).select(F.md5(F.lit("7"))).first()[0]
    with pytest.raises(ValueError, match="rebuild"):
        read_table_point_indexed(spark, path, idx, None, "digest", probe)
    with pytest.raises(ValueError, match="rebuild"):
        refresh_value_index(spark, path, idx)
    # rebuild under the new name: full service restored
    idx2 = str(tmp_path / "t_hash_idx")
    build_value_index(spark, path, "content_hash", idx2)
    got = read_table_point_indexed(
        spark, path, idx2, None, "content_hash", probe
    )
    assert [r["doc_id"] for r in got.collect()] == [7]
    # ADD-COLUMN evolution is transparent: the old index still works
    # when the indexed column itself is untouched
    path2 = str(tmp_path / "t2")
    idx3 = str(tmp_path / "t2_idx")
    commit_snapshot(
        spark, path2, _mkdocs(spark, 50), stat_cols=["doc_id"], n_files=4
    )
    build_value_index(spark, path2, "digest", idx3)
    prev = read_manifest(spark, path2)
    commit_delta(
        spark, path2,
        _mkdocs(spark, 60).filter(F.col("doc_id") >= 50)
        .withColumn("extra", F.lit(1)),
        list(prev["files"]), update_key_ranges={},
    )
    probe2 = spark.range(1).select(F.md5(F.lit("55"))).first()[0]
    got2 = read_table_point_indexed(
        spark, path2, idx3, None, "digest", probe2
    )
    assert [r["doc_id"] for r in got2.collect()] == [55]
