"""Z-order (Morton-curve) clustered writes for multi-column data
skipping.

A range-sorted layout (io.py's sorted/partitioned writes,
tests/test_io_catalog.py's min-max file pruning) skips files for
predicates on the LEADING sort column only; a predicate on the second
column still touches every file. Interleaving the bits of both
columns' normalized values (the Morton / Z curve) gives every file a
tight min-max envelope on ALL interleaved columns at once, so a
parquet scan with row-group/file statistics prunes on any of them —
the technique behind Delta's OPTIMIZE ZORDER and Iceberg's sort-order
z-curves, reimplemented here on plain parquet + Catalyst.

Everything is expression-level (whole-stage codegen, no UDF):

- per-column normalization to ``2^bits`` buckets is a linear rescale
  against the column's global min/max (one tiny agg, broadcast back
  as literals);
- bit interleave is an OR-fold of ``shiftleft`` probes — 2*bits
  integer ops per row, all JVM-side;
- the write is ``repartitionByRange(z)`` + ``sortWithinPartitions(z)``
  so each output file covers one compact z-range (range exchange is
  Spark's sampled range partitioner — balanced files without knowing
  the distribution a priori).

Scale: the only non-map work is the min/max agg and the range
exchange the write needs anyway; z-value computation adds zero
shuffles. At 100 TB the same code path clusters a table so ad-hoc
2-D range scans (time x key, partkey x suppkey) read a small fraction
of files instead of all of them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

Z_COL = "__z"


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Morton code: bit j of column i lands at position
    ``j * len(cols) + i``. Inputs must already be non-negative ints
    < 2^bits. Total width len(cols)*bits must stay < 63."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"interleaved width {n * bits} exceeds BIGINT")
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        src = c.cast("long")
        for j in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(src.bitwiseAND(F.lit(1 << j)), j * (n - 1) + i)
            )
    return out


def zvalue(df: DataFrame, cols: list[str], bits: int = 16) -> DataFrame:
    """Append the z-value column. NUMERIC columns rescale to
    [0, 2^bits) by their global min/max (one tiny agg — range
    locality preserved, so range AND equality predicates prune);
    NON-NUMERIC columns (string keys, dates in evolved tables) bucket
    by ``xxhash64 mod 2^bits`` instead — no range locality, but equal
    values still CO-LOCATE into few files, so equality probes prune
    through the per-column bloom filters and the few-files-hold-the-
    value effect (Delta restricts ZORDER BY similarly via range ids;
    hash buckets are the shuffle-free equivalent). A clustered write
    on mixed-type stat columns must never fail outright — merges
    re-append key columns to stat_cols, so a string key reaching this
    path is routine, not exceptional."""
    from pyspark.sql.types import NumericType

    numeric = {
        f.name for f in df.schema.fields
        if f.name in set(cols) and isinstance(f.dataType, NumericType)
    }
    aggs = []
    for c in cols:
        if c in numeric:
            aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    stats = df.agg(*aggs).collect()[0] if aggs else None
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        if c not in numeric:
            scaled.append(F.pmod(F.xxhash64(F.col(c)), F.lit(top + 1)))
            continue
        lo, hi = stats[f"min_{c}"], stats[f"max_{c}"]
        if lo is None or hi is None:
            raise ValueError(
                f"zvalue: column {c!r} has no non-null values — cannot "
                "derive a rescale range (empty input?)"
            )
        span = max(1, int(hi) - int(lo))
        # rescale in DOUBLE: the integer form (col - lo) * top is a
        # BIGINT multiply that silently overflows (scrambling the
        # curve) once the column spans more than ~2^47. The double
        # path loses ulp-level precision for spans beyond 2^53, which
        # is acceptable: the z-value drives file LAYOUT only, never
        # query results
        scaled.append(
            F.least(
                F.lit(top),
                (
                    (F.col(c).cast("double") - F.lit(float(int(lo))))
                    / F.lit(float(span))
                    * F.lit(top)
                ).cast("long"),
            )
        )
    return df.withColumn(Z_COL, interleave_bits(scaled, bits))


def write_zordered(
    df: DataFrame, path: str, cols: list[str], *, n_files: int = 16, bits: int = 16
) -> None:
    """Write ``df`` as parquet clustered on the z-curve of ``cols``:
    each of the ``n_files`` range partitions covers one compact
    z-interval, so every file's parquet min/max stats are tight on
    every clustered column simultaneously."""
    (
        zvalue(df, cols, bits)
        .repartitionByRange(n_files, Z_COL)
        .sortWithinPartitions(Z_COL)
        .drop(Z_COL)
        .write.mode("overwrite")
        .parquet(path)
    )
