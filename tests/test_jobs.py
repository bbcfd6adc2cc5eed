"""End-to-end medallion job over the staged fixture bronze."""

from __future__ import annotations

import os


def test_run_medallion_end_to_end(spark, tmp_path):
    from prox_spark.fixture_store import stage_fixtures
    from prox_spark.jobs import run_medallion

    bronze = os.path.dirname(next(iter(stage_fixtures().values())))
    out = str(tmp_path / "out")
    results = run_medallion(spark, bronze, out)
    assert all(r.status == "succeeded" for r in results.values()), {
        n: (r.status, r.error) for n, r in results.items()
    }
    # gold written, partitioned where declared
    fact = spark.read.parquet(os.path.join(out, "gold", "fact_booking"))
    assert fact.count() == 80
    assert {"year", "month"} <= set(fact.columns)
    assert any(d.startswith("year=") for d in os.listdir(os.path.join(out, "gold", "fact_booking")))
    # all 8 KPIs written and readable
    kpi_dir = os.path.join(out, "kpis")
    assert len(os.listdir(kpi_dir)) == 8
    top5 = spark.read.parquet(os.path.join(kpi_dir, "top5_providers_by_bookings"))
    assert top5.count() == 5


def test_cli_medallion_fixtures(spark, tmp_path, capsys):
    from prox_spark.__main__ import main

    rc = main(["medallion", "--fixtures", "--out", str(tmp_path / "cli_out")])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "write_kpis" in printed and "failed" not in printed
