"""Key-based upserts (SCD-1 / keep-max / SCD-2 merges) over the
manifest-log table format (prox_spark/table.py).

The reference's load step truncates and reloads whole Redshift tables
(full refresh, reference glue_scripts/s3_to_redshift_script.py
preactions); at 100 TB a daily full rewrite is untenable — you merge
the day's changed rows into the standing table instead. Without a
table format that supports row-level MERGE (Delta/Iceberg/Hudi), the
parquet-native pattern is copy-on-write:

    new_table = updates ∪ (current ⟕anti updates on key)

i.e. updated keys take the new row, everything else survives. The
anti-join is a plain key equi-join (broadcast when the update batch is
small — the common case — via AQE), so the cost is one scan of the
current table + rewriting it, the same floor Delta's copy-on-write
MERGE pays without matched-file pruning.

Every merge publishes through :func:`prox_spark.table.commit_snapshot`:
the new snapshot is fully written before a single atomic manifest
rename makes it current, so a concurrent reader sees the previous
version or the new one — never a mix (the round-2 directory swap had a
window where a mid-rename listing caught a half-published table), and
old versions stay readable (time travel) until vacuumed.

Pre-manifest plain-parquet targets are migrated on first merge: their
rows become the ``current`` side and the merged result is committed as
version 1; the legacy root files are then removed (single-writer
assumption, as for all merges here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from prox_spark.table import commit_snapshot, is_manifest_table, read_table


def _current(spark: SparkSession, table_path: str) -> DataFrame | None:
    """The table's current snapshot, or None if the table is absent."""
    if is_manifest_table(spark, table_path):
        return read_table(spark, table_path)
    jvm = spark._jvm  # noqa: SLF001 - hadoop FS side channel
    path = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    if not fs.exists(path):
        return None
    return spark.read.parquet(table_path)  # legacy plain dir


def _drop_legacy_files(spark: SparkSession, table_path: str) -> None:
    """After migrating a plain parquet dir to manifest format, remove
    the now-shadowed root data files (everything except the manifest
    log and snapshot dirs)."""
    from prox_spark.table import DATA_DIR, MANIFEST_DIR

    jvm = spark._jvm  # noqa: SLF001
    path = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    for st in fs.listStatus(path):
        if st.getPath().getName() not in (DATA_DIR, MANIFEST_DIR):
            fs.delete(st.getPath(), True)


def _check_schema(current: DataFrame, updates: DataFrame, what: str) -> None:
    if set(current.columns) != set(updates.columns):
        raise ValueError(
            f"{what} schema mismatch: table has {sorted(current.columns)}, "
            f"updates have {sorted(updates.columns)}"
        )


def _evolve(current: DataFrame, updates: DataFrame, what: str):
    """ADD-COLUMN schema evolution: updates may carry a superset of the
    table's columns; existing rows read the new columns as NULL (the
    Iceberg/Delta add-column semantic — no rewrite of old data beyond
    this table format's normal copy-on-write commit). Dropping or
    renaming is still an error: silent column loss is how pipelines
    corrupt tables, so destructive evolution stays explicit
    (delete_keys + re-create, or a migration script).

    Returns (current', updates') with identical column sets."""
    missing_in_updates = set(current.columns) - set(updates.columns)
    if missing_in_updates:
        raise ValueError(
            f"{what}: updates drop columns {sorted(missing_in_updates)}; "
            "add-column evolution only"
        )
    new_cols = [c for c in updates.columns if c not in current.columns]
    for c in new_cols:
        dt = updates.schema[c].dataType
        current = current.withColumn(c, F.lit(None).cast(dt))
    return current, updates


def _commit(spark: SparkSession, table_path: str, df: DataFrame, migrated: bool) -> None:
    # the copy-on-write self-reference is safe: committing executes the
    # merge plan (which reads the current snapshot) BEFORE anything is
    # deleted — commits never delete, and legacy cleanup runs after
    commit_snapshot(spark, table_path, df)
    if migrated:
        _drop_legacy_files(spark, table_path)


def upsert_parquet(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    keys: list[str],
    *,
    evolve: bool = False,
) -> None:
    """Merge ``updates`` into the table at ``table_path`` by ``keys``
    (update rows win; new keys append). Creates the table if absent.
    Columns must match the existing table's schema unless
    ``evolve=True``, which permits ADD-COLUMN evolution (see
    :func:`_evolve`)."""
    current = _current(spark, table_path)
    if current is None:
        commit_snapshot(spark, table_path, updates)
        return
    if evolve:
        current, updates = _evolve(current, updates, "upsert")
    else:
        _check_schema(current, updates, "upsert")
    survivors = current.join(updates.select(*keys).distinct(), keys, "left_anti")
    merged = updates.select(*current.columns).unionByName(survivors)
    _commit(spark, table_path, merged, migrated=not is_manifest_table(spark, table_path))


def delete_keys(
    spark: SparkSession,
    table_path: str,
    keys_df: DataFrame,
    keys: list[str],
) -> int:
    """Copy-on-write DELETE: drop every row whose key tuple appears in
    ``keys_df``, committed as a new snapshot version (readers pinned to
    an older manifest keep a consistent view; time travel still serves
    pre-deletion versions until ``vacuum`` retires them — the
    right-to-be-forgotten flow is delete_keys + vacuum). Returns the
    number of rows removed.

    Scale shape: one anti-join keyed on the deletion set — which is
    small by nature (a deletion request list), so AQE broadcasts it —
    then the atomic manifest commit; nothing else is rewritten
    logically (at file granularity this snapshot format rewrites the
    table; a file-level format would rewrite only touched files, the
    same trade Delta makes without deletion vectors)."""
    current = _current(spark, table_path)
    if current is None:
        raise ValueError(f"no table at {table_path}")
    missing = [k for k in keys if k not in current.columns]
    if missing:
        raise ValueError(f"delete keys not in table schema: {missing}")
    dset = keys_df.select(*keys).distinct()
    survivors = current.join(dset, keys, "left_anti")
    n_before = current.count()
    _commit(
        spark, table_path, survivors,
        migrated=not is_manifest_table(spark, table_path),
    )
    from prox_spark.table import read_table

    return n_before - read_table(spark, table_path).count()


def upsert_keep_max(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    keys: list[str],
    order_cols: list[str],
) -> None:
    """Order-independent upsert: per key, the row with the greatest
    ``order_cols`` tuple wins — across the update batch AND the
    standing table. Unlike :func:`upsert_parquet` (last writer wins),
    the result is independent of batch arrival order, which makes it
    the correct merge for out-of-order / replayed feeds: applying the
    same batches in any order, any number of times, converges to the
    same table (idempotent). Implementation is one struct-max
    aggregate over current ∪ updates — partial aggregation means the
    shuffle carries one row per key per partition."""

    def _reduce(df: DataFrame) -> DataFrame:
        rest = [c for c in df.columns if c not in keys and c not in order_cols]
        s = F.max(F.struct(*[F.col(c) for c in [*order_cols, *rest]])).alias("_s")
        return df.groupBy(*keys).agg(s).select(*keys, "_s.*").select(*df.columns)

    current = _current(spark, table_path)
    if current is None:
        commit_snapshot(spark, table_path, _reduce(updates))
        return
    _check_schema(current, updates, "upsert")
    merged = _reduce(current.unionByName(updates))
    _commit(spark, table_path, merged, migrated=not is_manifest_table(spark, table_path))


SCD2_COLS = ("valid_from", "valid_to", "is_current")


def upsert_scd2(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    keys: list[str],
    effective_col: str,
) -> None:
    """SCD-2 history merge for parquet dimensions: instead of
    overwriting a changed row (SCD-1, :func:`upsert_parquet`), close
    the current version (``valid_to`` = the update's effective time,
    ``is_current`` = false) and append the update as the new open
    version — the dimension keeps every historical state, and
    point-in-time joins filter ``valid_from <= t < valid_to``.

    ``updates`` carries the business columns + ``effective_col``
    (timestamp of the change); the table stores them plus
    ``valid_from``/``valid_to``/``is_current``. Unchanged keys pass
    through untouched; the only join is one key equi-join against the
    (small) update batch — same merge floor as SCD-1, so the 100 TB
    story is unchanged: one scan + rewrite, broadcast-able update
    side, atomic manifest commit."""
    open_ended = F.lit("9999-12-31 00:00:00").cast("timestamp_ntz")
    fresh = (
        updates.withColumn("valid_from", F.col(effective_col).cast("timestamp_ntz"))
        .withColumn("valid_to", open_ended)
        .withColumn("is_current", F.lit(True))
        .drop(effective_col)
    )
    current = _current(spark, table_path)
    if current is None:
        commit_snapshot(spark, table_path, fresh)
        return
    _check_schema(current, fresh, "scd2")
    eff = updates.groupBy(*keys).agg(
        F.min(F.col(effective_col).cast("timestamp_ntz")).alias("_eff")
    )
    # close ONLY the open version of updated keys; history rows and
    # untouched keys pass through unchanged
    closed = (
        current.join(eff, keys, "left")
        .withColumn(
            "valid_to",
            F.when(
                F.col("is_current") & F.col("_eff").isNotNull(), F.col("_eff")
            ).otherwise(F.col("valid_to")),
        )
        .withColumn(
            "is_current",
            F.col("is_current") & F.col("_eff").isNull(),
        )
        .drop("_eff")
    )
    merged = closed.unionByName(fresh.select(*current.columns))
    _commit(spark, table_path, merged, migrated=not is_manifest_table(spark, table_path))


def apply_changes(
    spark: SparkSession,
    table_path: str,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "change",
) -> None:
    """Apply a CDC change feed — rows tagged insert/update/delete in
    ``op_col`` (the q114 snapshot-diff shape) — to the table in ONE
    atomic snapshot commit: readers see the table before the feed or
    after it, never a torn middle. This is the CONSUME half of the CDC
    loop (q114 produces the feed, q118 maintains aggregates from it,
    this materializes it into a downstream table).

    Scale shape: one anti-join of the standing table against the
    (small-by-nature) changed-key set, a union with the insert/update
    payloads, one commit — work ∝ table + feed, with AQE broadcasting
    the feed side when it fits."""
    ops = {r[0] for r in changes.select(op_col).distinct().collect()}
    unknown = ops - {"insert", "update", "delete"}
    if unknown:
        raise ValueError(f"unknown change ops: {sorted(unknown)}")
    current = _current(spark, table_path)
    if current is None:
        raise ValueError(f"no table at {table_path}")
    changed_keys = changes.select(*keys).distinct()
    survivors = current.join(changed_keys, keys, "left_anti")
    upserts = (
        changes.filter(F.col(op_col) != "delete")
        .drop(op_col)
        .select(*current.columns)
    )
    merged = survivors.unionByName(upserts)
    _commit(spark, table_path, merged, migrated=not is_manifest_table(spark, table_path))
