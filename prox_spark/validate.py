"""Data-quality operators: schema enforcement/assertion, key dedup,
FK checking (SURVEY.md §2.9).

The reference enforces schemas by round-tripping through an RDD
(``createDataFrame(df.rdd, schema)``, reference
transformations_script.py:157) — an anti-pattern that deserializes
every row into the Python gateway's RDD representation, defeats
column pruning / predicate pushdown, and fails lazily at task time.
Here enforcement is a per-column ``cast`` projection: stays inside
whole-stage codegen, keeps pushdown, fails analysis-time on missing
columns.

The FK checker implements the behavior the reference documents but
never shipped (reference README.md:55): orphans found by left-anti
join, the canonical distributed FK probe (broadcast the parent key
set when small; Catalyst/AQE picks that automatically).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StructType


class SchemaMismatch(Exception):
    """Raised when a frame cannot be conformed to its declared schema."""


def enforce_schema(
    df: DataFrame,
    schema: StructType,
    *,
    strict_extra: bool = False,
    check: bool = False,
) -> DataFrame:
    """Conform ``df`` to ``schema`` by try_cast-ing column-by-column.

    - missing column -> SchemaMismatch (matches the reference's
      presence check, transformations_script.py:160-162)
    - extra columns are dropped (or rejected with ``strict_extra``)
    - output column order == declared order
    - ``check=True`` additionally runs :func:`audit_conformance` — one
      aggregation pass over the source — and fails if any cast silently
      nulled a malformed value or a ``nullable=False`` column would
      carry nulls. (A bare non-ANSI cast turns e.g. ``"abc"`` in a
      LongType column into NULL and calls it validated; the audit makes
      that loud.) try_cast keeps the same value semantics under ANSI
      mode, so enforcement behaves identically on ANSI clusters.
    """
    have = {f.name for f in df.schema.fields}
    want = [f.name for f in schema.fields]
    missing = [c for c in want if c not in have]
    if missing:
        raise SchemaMismatch(f"missing columns: {missing}")
    extra = sorted(have - set(want))
    if extra and strict_extra:
        raise SchemaMismatch(f"unexpected columns: {extra}")
    if check:
        problems = audit_conformance(df, schema)
        if problems:
            raise SchemaMismatch(f"conformance audit failed: {problems}")
    return df.select([F.col(f.name).try_cast(f.dataType).alias(f.name) for f in schema.fields])


def audit_conformance(df: DataFrame, schema: StructType) -> dict[str, int]:
    """One-pass cast/nullability audit: returns ``{finding: row_count}``
    for (a) values a cast to the declared type would silently null
    (``badcast[col]``) and (b) post-cast nulls in columns declared
    ``nullable=False`` (``null[col]``, e.g. primary keys).

    All findings come from a single map-side-combinable aggregation
    over the source frame (one scan regardless of column count), so the
    audit stays a constant-factor cost at 100 TB — the price of an
    actual validation gate rather than a silent-NULL pass-through."""
    aggs = []
    for f in schema.fields:
        if f.name not in df.columns:
            continue
        src = F.col(f.name)
        casted = src.try_cast(f.dataType)
        aggs.append(
            F.sum((src.isNotNull() & casted.isNull()).cast("long")).alias(f"badcast[{f.name}]")
        )
        if not f.nullable:
            aggs.append(F.sum(casted.isNull().cast("long")).alias(f"null[{f.name}]"))
    if not aggs:
        return {}
    row = df.agg(*aggs).first()
    return {k: v for k, v in row.asDict().items() if v}


def assert_schema(df: DataFrame, schema: StructType) -> None:
    """Field presence + type equality check (reference
    transformations_script.py:160-165), nullability-insensitive."""
    actual = {f.name: f.dataType for f in df.schema.fields}
    for f in schema.fields:
        if f.name not in actual:
            raise SchemaMismatch(f"column {f.name!r} missing")
        if actual[f.name] != f.dataType:
            raise SchemaMismatch(
                f"column {f.name!r}: expected {f.dataType.simpleString()}, "
                f"got {actual[f.name].simpleString()}"
            )


def dedup_by_key(df: DataFrame, keys: list[str]) -> DataFrame:
    """Key-based exact dedup — replaces the reference's all-column
    ``dropDuplicates()`` (transformations_script.py:168), which
    shuffles entire rows including long text. Hashing only the key
    columns keeps the shuffle narrow; ties broken arbitrarily, which
    matches the reference semantics (first row wins)."""
    return df.dropDuplicates(keys)


@dataclass
class FKViolation:
    child_table: str
    child_col: str
    parent_table: str
    parent_col: str
    orphan_count: int


def fk_orphans(child: DataFrame, child_col: str, parent: DataFrame, parent_col: str) -> DataFrame:
    """Rows of ``child`` whose non-null ``child_col`` has no match in
    ``parent.parent_col`` (left-anti join; SURVEY.md §2.9 V3)."""
    keys = parent.select(F.col(parent_col).alias("__pk")).distinct()
    return (
        child.filter(F.col(child_col).isNotNull())
        .join(keys, child[child_col] == keys["__pk"], "left_anti")
    )


def check_foreign_keys(
    tables: dict[str, DataFrame],
    fks: dict[str, list[tuple[str, str, str]]],
) -> list[FKViolation]:
    """Run every declared FK probe; report only violated ones."""
    out: list[FKViolation] = []
    for child_table, specs in fks.items():
        if child_table not in tables:
            continue
        for child_col, parent_table, parent_col in specs:
            if parent_table not in tables:
                continue
            n = fk_orphans(tables[child_table], child_col, tables[parent_table], parent_col).count()
            if n:
                out.append(FKViolation(child_table, child_col, parent_table, parent_col, n))
    return out


def observed_write(
    df: DataFrame,
    path: str,
    qc_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> dict[str, int]:
    """Write parquet while collecting QC metrics (row count + per-column
    null counts) from the SAME pass via ``Observation`` — the write job
    itself carries the accumulators, so the quality numbers a pipeline
    records after every stage cost ZERO extra scans. The alternative —
    ``write`` then ``count``/null-audit — reads the full output back,
    which at 100 TB doubles the stage's I/O.

    Returns ``{"rows": n, "nulls[col]": n, ...}``.
    """
    from pyspark.sql import Observation

    cols = qc_cols if qc_cols is not None else df.columns
    metrics = [F.count(F.lit(1)).alias("rows")]
    metrics += [
        F.sum(F.col(c).isNull().cast("long")).alias(f"nulls[{c}]") for c in cols
    ]
    obs = Observation("qc")
    df.observe(obs, *metrics).write.mode(mode).parquet(path)
    got = obs.get
    # sum() over zero rows yields NULL — an empty write reports zeros, not a crash
    return {k: int(v) if v is not None else 0 for k, v in got.items()}
