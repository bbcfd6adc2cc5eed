"""Parquet fixture store: stages the deterministic PROX-shaped
fixture tables (prox_spark/fixtures.py, seed=42) to disk so BOTH
engines of the correctness gate read the identical bytes —

- the Spark side (queries/kpi_q.py) reads them as the bronze input to
  the silver -> gold/KPI pipeline;
- the DuckDB oracle reads them via ``read_parquet('<abs path>')``.

This is what puts the PROX-parity core (the 8 reference KPIs +
star-schema builders, reference sql/admin_kip_script:1-36,
sql/service_provider_kpis:1-36, sql/service_seeker_kpis:1-10,
glue_scripts/gold_data_curation_script.py:59-232) under the same hard
driver gate as the testdata queries, instead of pytest-only coverage.

Staging is Spark-free (pyarrow) and idempotent: generation is
deterministic, writes go to a temp file then ``os.replace``, and
existing files are reused — so whichever of ``queries()`` /
``oracle_sql()`` runs first (or concurrently) sees complete tables.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from prox_spark.fixtures import fixture_rows
from prox_spark.schemas import SILVER_SCHEMAS

DEFAULT_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".fixtures"
)


def _arrow_type(dt) -> pa.DataType:
    from pyspark.sql.types import (
        BooleanType,
        DateType,
        DecimalType,
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        TimestampType,
    )

    if isinstance(dt, LongType):
        return pa.int64()
    if isinstance(dt, IntegerType):
        return pa.int32()
    if isinstance(dt, StringType):
        return pa.string()
    if isinstance(dt, DoubleType):
        return pa.float64()
    if isinstance(dt, BooleanType):
        return pa.bool_()
    if isinstance(dt, TimestampType):
        # naive microsecond timestamps: Spark reads TIMESTAMP_NTZ
        # (container/inferTimestampNTZ default), DuckDB naive TIMESTAMP
        return pa.timestamp("us")
    if isinstance(dt, DateType):
        return pa.date32()
    if isinstance(dt, DecimalType):
        return pa.decimal128(dt.precision, dt.scale)
    raise TypeError(f"no arrow mapping for {dt!r}")


def stage_fixtures(root: str = DEFAULT_ROOT) -> dict[str, str]:
    """Write every fixture table as ``<root>/<name>.parquet`` (single
    file per table — these are seed-scale dims, not data-scale facts)
    and return {table: absolute path}. No-op when already staged."""
    paths = {name: os.path.join(root, f"{name}.parquet") for name in SILVER_SCHEMAS}
    if all(os.path.exists(p) for p in paths.values()):
        return paths
    os.makedirs(root, exist_ok=True)
    rows = fixture_rows()
    for name, schema in SILVER_SCHEMAS.items():
        if os.path.exists(paths[name]):
            continue
        names = [f.name for f in schema.fields]
        arrow_schema = pa.schema(
            [pa.field(f.name, _arrow_type(f.dataType), nullable=True) for f in schema.fields]
        )
        table = pa.Table.from_pylist(
            [dict(zip(names, r)) for r in rows[name]], schema=arrow_schema
        )
        tmp = paths[name] + f".tmp.{os.getpid()}"
        pq.write_table(table, tmp)
        os.replace(tmp, paths[name])
    return paths
