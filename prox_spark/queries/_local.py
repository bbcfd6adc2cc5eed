"""Driver-local tiny frames as pure-JVM VALUES relations.

``spark.createDataFrame(rows)`` materializes through a Python-RDD
scan: every job that touches the frame runs a Python-worker task just
to unpickle a handful of driver-known rows. On the virtualized bench
kernel a fresh worker fork inside a large JVM measured 0.4-6 s
(flaky; the ``_spread_py`` pathology), and frames that sit under a
global sort pay the scan twice (range-sampler + sort). A SQL VALUES
literal builds the same rows as a JVM LocalRelation — no RDD, no
Python worker, constant-folded into the plan.

Supported value types (r12 added nested, r13 non-finite floats):

- ints/strings/bools/None render exactly;
- floats render with ``repr`` — Python's shortest round-trip form,
  which parses back to the identical IEEE double in Java's
  ``Double.parseDouble``; NaN/±Infinity render as their CAST forms;
- lists render as ``array(...)`` literals, tuples (e.g. collected
  Rows) as positional ``named_struct`` re-typed by the declared CAST;
- date/datetime/Decimal/dict raise TypeError — keep createDataFrame
  for frames with temporal/decimal/map columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        # non-finite floats have no bare SQL token (ADVICE r12):
        # render the cast forms Spark's parser accepts; repr() covers
        # every finite double exactly (shortest round-trip form)
        if v != v:
            return "CAST('NaN' AS DOUBLE)"
        if v == float("inf"):
            return "CAST('Infinity' AS DOUBLE)"
        if v == float("-inf"):
            return "CAST('-Infinity' AS DOUBLE)"
        return repr(v)
    if isinstance(v, str):
        escaped = v.replace("\\", "\\\\").replace("'", "\\'")
        return f"'{escaped}'"
    # nested values (r12): arrays render as array(...) literals and
    # struct-like values (tuple/Row) as named_struct with positional
    # field names — the declared-type CAST in values_df re-types both
    # (Spark casts struct fields positionally), so callers can pass
    # collected Rows / embedding lists without a Python-RDD scan
    if isinstance(v, list):
        return "array(" + ", ".join(_sql_literal(x) for x in v) + ")"
    if isinstance(v, tuple):
        body = ", ".join(
            f"'f{i}', {_sql_literal(x)}" for i, x in enumerate(v)
        )
        return f"named_struct({body})"
    # date/datetime/Decimal/dict values would render as invalid or
    # silently mistyped tokens — reject them loudly (ADVICE r12);
    # callers with temporal/decimal/map columns keep createDataFrame
    raise TypeError(
        f"values_df supports int/float/str/bool/None scalars, lists and "
        f"tuples (structs) only, got {type(v)}: {v!r}"
    )


def _split_fields(schema: str) -> list[str]:
    """Split a DDL column list on TOP-LEVEL commas only, so nested
    types (array<struct<a:int, b:double>>) survive."""
    fields, depth, cur = [], 0, []
    for ch in schema:
        if ch == "<" or ch == "(":
            depth += 1
        elif ch == ">" or ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            fields.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        fields.append("".join(cur))
    return fields


def values_df_like(spark: SparkSession, rows, schema) -> DataFrame:
    """values_df with the DDL derived from a StructType — the drop-in
    for ``createDataFrame(collected_rows, df.schema)`` localizations
    (collected Rows are tuples, so they render directly)."""
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in schema.fields
    )
    return values_df(spark, [tuple(r) for r in rows], ddl)


def values_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """``createDataFrame(rows, schema)`` twin for scalar schemas,
    built as a VALUES relation. ``schema`` is the same DDL string
    ("a BIGINT, b STRING"); an explicit per-column CAST pins each
    column to the declared type exactly like createDataFrame does.
    Empty ``rows`` yields a typed empty frame (the q206 idiom)."""
    cols = []
    for field in _split_fields(schema):
        parts = field.strip().split(None, 1)
        cols.append((parts[0], parts[1]))
    sel = ", ".join(f"CAST({name} AS {typ}) AS {name}" for name, typ in cols)
    if not rows:
        names = ", ".join(name for name, _ in cols)
        casts = ", ".join(f"CAST(NULL AS {typ}) AS {name}" for name, typ in cols)
        return spark.sql(f"SELECT {casts} FROM (VALUES (1)) WHERE 1 = 0")
    body = ", ".join(
        "(" + ", ".join(_sql_literal(v) for v in row) + ")" for row in rows
    )
    names = ", ".join(name for name, _ in cols)
    return spark.sql(
        f"SELECT {sel} FROM (VALUES {body}) AS t({names})"
    )
