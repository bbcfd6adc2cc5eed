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

from pyspark.sql import DataFrame, SparkSession


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

    staging = jvm.org.apache.hadoop.fs.Path(table_path + "._staging")
    retired = jvm.org.apache.hadoop.fs.Path(table_path + "._retired")
    if fs.exists(staging):
        fs.delete(staging, True)
    merged.write.mode("overwrite").parquet(staging.toString())
    # swap: current -> retired, staging -> current, drop retired
    if fs.exists(retired):
        fs.delete(retired, True)
    if not fs.rename(path, retired):
        raise OSError(f"could not retire {table_path}")
    if not fs.rename(staging, path):
        fs.rename(retired, path)  # roll back
        raise OSError(f"could not publish staged upsert for {table_path}")
    fs.delete(retired, True)
