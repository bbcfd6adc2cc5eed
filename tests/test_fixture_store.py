"""Fixture store: the parquet staging both correctness-gate engines
read must be deterministic, idempotent, and type-faithful to
SILVER_SCHEMAS."""

from __future__ import annotations

import os

from prox_spark.fixture_store import stage_fixtures
from prox_spark.fixtures import fixture_rows
from prox_spark.schemas import SILVER_SCHEMAS


def test_stage_is_idempotent_and_complete(tmp_path):
    root = str(tmp_path / "fx")
    paths = stage_fixtures(root)
    assert set(paths) == set(SILVER_SCHEMAS)
    mtimes = {n: os.path.getmtime(p) for n, p in paths.items()}
    again = stage_fixtures(root)
    assert again == paths
    assert {n: os.path.getmtime(p) for n, p in again.items()} == mtimes  # no rewrite


def test_staged_rows_and_types_roundtrip(spark, tmp_path):
    import pyarrow.parquet as pq

    root = str(tmp_path / "fx")
    paths = stage_fixtures(root)
    rows = fixture_rows()
    for name, schema in SILVER_SCHEMAS.items():
        assert pq.read_metadata(paths[name]).num_rows == len(rows[name])
    # spark read + declared-schema cast is lossless for a spot table
    from prox_spark.validate import enforce_schema

    df = enforce_schema(
        spark.read.parquet(paths["payment_records"]),
        SILVER_SCHEMAS["payment_records"],
        check=True,  # no silent-null casts, PK non-null
    )
    assert df.count() == len(rows["payment_records"])
    assert dict(df.dtypes)["amount"] == "decimal(10,2)"


def test_kpi_gate_matches_in_memory_fixtures(spark):
    """The staged-parquet silver path must agree with the in-memory
    make_fixtures silver path (same seed, same bytes-of-truth)."""
    from prox_spark import kpi
    from prox_spark.fixtures import make_fixtures
    from prox_spark.queries.kpi_q import q56_kpi_top5_providers_by_bookings
    from prox_spark.schemas import PRIMARY_KEYS
    from prox_spark.validate import dedup_by_key

    fx = make_fixtures(spark)
    mem = {n: dedup_by_key(fx[n], PRIMARY_KEYS[n]) for n in
           ("bookings", "services", "service_providers")}
    expected = kpi.top5_providers_by_bookings(
        mem["bookings"], mem["services"], mem["service_providers"]
    ).collect()
    got = q56_kpi_top5_providers_by_bookings(spark, "").collect()
    assert got == expected
