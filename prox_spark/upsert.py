"""Key-based upsert (SCD-1 merge) for parquet tables.

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

Writes are two-phase (write to a staging dir, then swap via Hadoop FS
rename) so a failed job never leaves the table half-written, and the
read of the current table is never concurrent with deleting it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def upsert_parquet(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    keys: list[str],
) -> None:
    """Merge ``updates`` into the parquet table at ``table_path`` by
    ``keys`` (update rows win; new keys append). Creates the table if
    absent. Columns must match the existing table's schema."""
    jvm = spark._jvm  # noqa: SLF001 - hadoop FS side channel
    hconf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    path = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = path.getFileSystem(hconf)

    if not fs.exists(path):
        updates.write.mode("overwrite").parquet(table_path)
        return

    current = spark.read.parquet(table_path)
    if set(current.columns) != set(updates.columns):
        raise ValueError(
            f"upsert schema mismatch: table has {sorted(current.columns)}, "
            f"updates have {sorted(updates.columns)}"
        )
    survivors = current.join(updates.select(*keys).distinct(), keys, "left_anti")
    merged = updates.select(*current.columns).unionByName(survivors)

    _publish(spark, merged, table_path)


def _publish(spark: SparkSession, df: DataFrame, table_path: str) -> None:
    """Two-phase parquet publish: write to staging, swap via FS rename."""
    jvm = spark._jvm  # noqa: SLF001 - hadoop FS side channel
    hconf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    path = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = path.getFileSystem(hconf)

    staging = jvm.org.apache.hadoop.fs.Path(table_path + "._staging")
    retired = jvm.org.apache.hadoop.fs.Path(table_path + "._retired")
    if fs.exists(staging):
        fs.delete(staging, True)
    df.write.mode("overwrite").parquet(staging.toString())
    # swap: current -> retired, staging -> current, drop retired
    if fs.exists(retired):
        fs.delete(retired, True)
    if not fs.rename(path, retired):
        raise OSError(f"could not retire {table_path}")
    if not fs.rename(staging, path):
        fs.rename(retired, path)  # roll back
        raise OSError(f"could not publish staged upsert for {table_path}")
    fs.delete(retired, True)


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
    jvm = spark._jvm  # noqa: SLF001 - hadoop FS side channel
    hconf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    path = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = path.getFileSystem(hconf)

    def _reduce(df: DataFrame) -> DataFrame:
        rest = [c for c in df.columns if c not in keys and c not in order_cols]
        s = F.max(F.struct(*[F.col(c) for c in [*order_cols, *rest]])).alias("_s")
        return df.groupBy(*keys).agg(s).select(*keys, "_s.*").select(*df.columns)

    if not fs.exists(path):
        _reduce(updates).write.mode("overwrite").parquet(table_path)
        return
    current = spark.read.parquet(table_path)
    if set(current.columns) != set(updates.columns):
        raise ValueError(
            f"upsert schema mismatch: table has {sorted(current.columns)}, "
            f"updates have {sorted(updates.columns)}"
        )
    _publish(spark, _reduce(current.unionByName(updates)), table_path)


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
    side, two-phase swap publish."""
    jvm = spark._jvm  # noqa: SLF001 - hadoop FS side channel
    hconf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    path = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = path.getFileSystem(hconf)

    open_ended = F.lit("9999-12-31 00:00:00").cast("timestamp_ntz")
    fresh = (
        updates.withColumn("valid_from", F.col(effective_col).cast("timestamp_ntz"))
        .withColumn("valid_to", open_ended)
        .withColumn("is_current", F.lit(True))
        .drop(effective_col)
    )
    if not fs.exists(path):
        fresh.write.mode("overwrite").parquet(table_path)
        return

    current = spark.read.parquet(table_path)
    if set(current.columns) != set(fresh.columns):
        raise ValueError(
            f"scd2 schema mismatch: table has {sorted(current.columns)}, "
            f"updates produce {sorted(fresh.columns)}"
        )
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
    _publish(spark, merged, table_path)
