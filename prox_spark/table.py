"""Minimal manifest-log table format: atomic commits, snapshot
isolation, and time travel for parquet tables, without adopting
Delta/Iceberg.

The reference full-refreshes Redshift tables (truncate + reload,
reference glue_scripts/s3_to_redshift_script.py preactions), so it
never faces concurrent-reader atomicity; a 100 TB merge pipeline does.
A bare directory-swap publish (round-2 design) has a window where a
reader lists the directory mid-rename and sees a half-published table.
The fix is the same idea every log-structured table format uses:

    table_path/
      data/snap-00000002-ab12cd34/   immutable parquet snapshot dirs
      _manifests/manifest-00000002.json   {"version": 2, "data": ...}

- WRITE: materialize the new snapshot under ``data/`` (nothing reads
  it yet), then publish by renaming a temp file to
  ``manifest-{N+1}.json`` — a single atomic FS rename. A failed job
  leaves an orphan data dir (vacuumed later), never a broken table.
- READ: list ``_manifests``, take the highest version, read ONLY the
  data dir it names. Readers planned against version N keep reading
  N's immutable files even while N+1 commits — snapshot isolation; a
  mix of two versions is impossible because a manifest names exactly
  one snapshot dir.
- TIME TRAVEL: ``read_table(..., version=k)`` pins manifest k while
  it hasn't been vacuumed.

Single-writer by design (the driver of a merge pipeline serializes
commits); the atomic rename makes a racing second writer fail loudly
rather than corrupt. On object stores without atomic rename (raw S3)
the manifest publish needs a conditional PUT instead — same protocol,
different primitive.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

MANIFEST_DIR = "_manifests"
DATA_DIR = "data"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm  # noqa: SLF001 - hadoop FS side channel
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    return jvm, fs, hpath


def _manifest_versions(spark: SparkSession, table_path: str) -> list[int]:
    jvm, fs, _ = _fs(spark, table_path)
    mdir = jvm.org.apache.hadoop.fs.Path(f"{table_path}/{MANIFEST_DIR}")
    if not fs.exists(mdir):
        return []
    out = []
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        if name.startswith("manifest-") and name.endswith(".json"):
            out.append(int(name[len("manifest-") : -len(".json")]))
    return sorted(out)


def is_manifest_table(spark: SparkSession, table_path: str) -> bool:
    return bool(_manifest_versions(spark, table_path))


def table_versions(spark: SparkSession, table_path: str) -> list[int]:
    """All readable (non-vacuumed) versions, ascending."""
    return _manifest_versions(spark, table_path)


def _read_manifest(spark: SparkSession, table_path: str, version: int) -> dict:
    mpath = f"{table_path}/{MANIFEST_DIR}/manifest-{version:08d}.json"
    # spark.read.text works on every Hadoop FS; the file is one JSON line
    line = "".join(r.value for r in spark.read.text(mpath).collect())
    return json.loads(line)


def read_table(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Read the table at its latest committed version (or a pinned
    historical ``version``). Falls back to a plain parquet read for
    legacy directories that predate the manifest log."""
    versions = _manifest_versions(spark, table_path)
    if not versions:
        if version is not None:
            raise ValueError(f"{table_path} is not a manifest table")
        return spark.read.parquet(table_path)
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"version {v} not in {versions} for {table_path}")
    manifest = _read_manifest(spark, table_path, v)
    return spark.read.parquet(f"{table_path}/{manifest['data']}")


def commit_snapshot(spark: SparkSession, table_path: str, df: DataFrame) -> int:
    """Write ``df`` as the table's next version. Returns the version.

    The snapshot is fully materialized before the manifest rename, so
    readers either resolve the previous manifest (old snapshot, still
    intact) or the new one — never a mix and never partial files."""
    jvm, fs, _ = _fs(spark, table_path)
    versions = _manifest_versions(spark, table_path)
    v = (versions[-1] if versions else 0) + 1
    snap_rel = f"{DATA_DIR}/snap-{v:08d}-{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(f"{table_path}/{snap_rel}")

    manifest = json.dumps({"version": v, "data": snap_rel})
    mdir = jvm.org.apache.hadoop.fs.Path(f"{table_path}/{MANIFEST_DIR}")
    fs.mkdirs(mdir)
    tmp = jvm.org.apache.hadoop.fs.Path(
        f"{table_path}/{MANIFEST_DIR}/.tmp-{uuid.uuid4().hex}.json"
    )
    out = fs.create(tmp, False)
    out.write(bytearray(manifest, "utf-8"))
    out.close()
    final = jvm.org.apache.hadoop.fs.Path(
        f"{table_path}/{MANIFEST_DIR}/manifest-{v:08d}.json"
    )
    if fs.exists(final) or not fs.rename(tmp, final):
        # a racing writer published v first: fail loudly, leave its
        # commit untouched, drop our orphan snapshot + tmp manifest
        fs.delete(tmp, False)
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{table_path}/{snap_rel}"), True)
        raise OSError(f"concurrent commit of version {v} for {table_path}")
    return v


def vacuum(spark: SparkSession, table_path: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest ``keep_last`` versions: their manifests
    and any data dir no kept manifest references (including orphans
    from failed commits). Returns the removed versions. Run only when
    no reader is pinned to a dropped version."""
    jvm, fs, _ = _fs(spark, table_path)
    versions = _manifest_versions(spark, table_path)
    keep = versions[-keep_last:] if keep_last > 0 else []
    dropped = [v for v in versions if v not in keep]
    kept_dirs = {
        _read_manifest(spark, table_path, v)["data"].split("/", 1)[1] for v in keep
    }
    for v in dropped:
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(
                f"{table_path}/{MANIFEST_DIR}/manifest-{v:08d}.json"
            ),
            False,
        )
    ddir = jvm.org.apache.hadoop.fs.Path(f"{table_path}/{DATA_DIR}")
    if fs.exists(ddir):
        for st in fs.listStatus(ddir):
            if st.getPath().getName() not in kept_dirs:
                fs.delete(st.getPath(), True)
    return dropped
