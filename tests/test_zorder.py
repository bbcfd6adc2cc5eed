"""Z-order clustering (prox_spark/zorder.py): the layout must change
file-level min/max envelopes (what a 100 TB scan prunes on), never
content. File-skipping is measured directly from parquet footer
statistics with pyarrow — the same stats Spark's scan consults."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from prox_spark.zorder import interleave_bits, write_zordered
from pyspark.sql import functions as F


def _grid(spark, side=100):
    # uniform side x side grid, one row per cell
    return spark.range(side * side).select(
        (F.col("id") % side).alias("x"),
        (F.col("id") / side).cast("long").alias("y"),
    )


def _files_overlapping(path: str, col: str, lo: int, hi: int):
    """(files whose [min,max] on col overlaps [lo,hi], total files)."""
    hit, total = 0, 0
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        total += 1
        if min(mins) <= hi and max(maxs) >= lo:
            hit += 1
    return hit, total


def test_interleave_is_the_morton_code(spark):
    rows = spark.range(1).select(
        interleave_bits([F.lit(0b101), F.lit(0b011)], bits=3).alias("z")
    ).collect()
    # x bits 1,0,1 at positions 0,2,4; y bits 1,1,0 at positions 1,3,5
    assert rows[0].z == 0b011011


def test_zorder_prunes_on_the_second_column(spark, tmp_path):
    # enough files that each covers a short z-interval: 64 files over a
    # 128x128 grid = 6 z-prefix bits = 3 per dimension, so an ~9% y-range
    # intersects ~2 of 8 y-bands (plus range-boundary slop)
    df = _grid(spark, side=128)
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "linear")
    write_zordered(df, zpath, ["x", "y"], n_files=64)
    (
        df.repartitionByRange(64, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    # a y-only range: the x-sorted layout cannot skip ANY file
    # (every file spans all y), the z-layout must skip most
    z_hit, z_total = _files_overlapping(zpath, "y", 40, 50)
    l_hit, l_total = _files_overlapping(lpath, "y", 40, 50)
    assert l_hit == l_total
    assert z_hit <= z_total / 2
    # ... while still pruning on the leading column too
    zx_hit, _ = _files_overlapping(zpath, "x", 40, 50)
    assert zx_hit <= z_total / 2


def test_zorder_changes_layout_not_content(spark, tmp_path):
    df = _grid(spark, side=30)
    zpath = str(tmp_path / "z")
    write_zordered(df, zpath, ["x", "y"], n_files=8)
    got = sorted(spark.read.parquet(zpath).collect(), key=str)
    want = sorted(df.collect(), key=str)
    assert got == want


def test_zvalue_empty_input_raises_clear_error(spark):
    import pytest

    from prox_spark.zorder import zvalue

    empty = spark.createDataFrame([], "x BIGINT, y BIGINT")
    with pytest.raises(ValueError, match="no non-null values"):
        zvalue(empty, ["x", "y"])


def test_zvalue_wide_span_no_overflow(spark):
    """Columns spanning more than 2^47 used to overflow the BIGINT
    rescale multiply and scramble the curve; the double rescale must
    keep z monotone-ish: the max-valued corner maps to the top bucket,
    the min to 0, and every bucket stays within [0, 2^16)."""
    from pyspark.sql import functions as F

    from prox_spark.zorder import Z_COL, zvalue

    lo, hi = -(1 << 55), (1 << 55)
    df = spark.createDataFrame(
        [(lo, lo), (0, 0), (hi, hi)], "x BIGINT, y BIGINT"
    )
    rows = {r.x: r[Z_COL] for r in zvalue(df, ["x", "y"], bits=16).collect()}
    assert rows[lo] == 0
    assert rows[hi] == (1 << 32) - 1  # both cols at top bucket, fully interleaved
    assert rows[lo] < rows[0] < rows[hi]


def test_zorder_cluster_curve_prunes_both_columns(spark, tmp_path):
    """commit_snapshot(cluster_curve="zorder") must give point lookups
    file pruning on EVERY stat column — the lexicographic range layout
    prunes only the leading one. Correctness is layout-independent
    (same rows either way); the assertion is on files scanned."""
    from pyspark.sql import functions as F

    from prox_spark.table import (
        commit_snapshot,
        read_manifest_pruned,
        read_table_point,
        split_files_by_key_ranges,
    )

    # two independent uniform keys: 64 x 64 grid, 4096 rows
    df = spark.range(4096).select(
        (F.col("id") % 64).alias("a"),
        (F.col("id") / 64).cast("long").alias("b"),
        F.col("id").alias("payload"),
    )

    def files_for(path, eq):
        m = read_manifest_pruned(
            spark, path, {c: (v, v) for c, v in eq.items()}
        )
        files, _ = split_files_by_key_ranges(
            m, {c: (v, v) for c, v in eq.items()}
        )
        return len(files), len(read_manifest_pruned(spark, path, {})["files"])

    zpath = str(tmp_path / "z")
    commit_snapshot(
        spark, zpath, df, stat_cols=["a", "b"], n_files=16,
        cluster_curve="zorder",
    )
    za, ztot = files_for(zpath, {"a": 7})
    zb, _ = files_for(zpath, {"b": 7})
    assert ztot == 16
    assert za < ztot and zb < ztot, (za, zb, ztot)

    rpath = str(tmp_path / "r")
    commit_snapshot(spark, rpath, df, stat_cols=["a", "b"], n_files=16)
    rb, rtot = files_for(rpath, {"b": 7})
    # the range layout leads on `a`, so a `b` probe scans ~everything;
    # zorder must beat it
    assert zb < rb, (zb, rb, rtot)

    # correctness: both layouts answer the probe identically
    got = sorted(
        r["payload"]
        for r in read_table_point(spark, zpath, {"b": 7}).collect()
    )
    assert got == [7 * 64 + i for i in range(64)]
