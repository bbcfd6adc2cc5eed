from __future__ import annotations

from prox_spark.pipeline import Pipeline


def test_happy_path_passes_context():
    p = Pipeline()
    p.add_stage("a", lambda ctx: 1)
    p.add_stage("b", lambda ctx: ctx["a"] + 1, depends_on=["a"])
    res = p.run()
    assert res["a"].status == "succeeded"
    assert res["b"].output == 2


def test_retry_with_backoff():
    calls = []

    def flaky(ctx):
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("transient")
        return "ok"

    p = Pipeline()
    p.add_stage("flaky", flaky, max_attempts=3, backoff_seconds=0.01)
    res = p.run()
    assert res["flaky"].status == "succeeded"
    assert res["flaky"].attempts == 3


def test_failure_skips_dependents_and_notifies():
    failures = []
    p = Pipeline(on_failure=failures.append)
    p.add_stage("bad", lambda ctx: 1 / 0, max_attempts=2, backoff_seconds=0.01)
    p.add_stage("down", lambda ctx: "never", depends_on=["bad"])
    p.add_stage("indep", lambda ctx: "runs")
    res = p.run()
    assert res["bad"].status == "failed"
    assert res["down"].status == "skipped"
    assert res["indep"].status == "succeeded"
    assert len(failures) == 1 and failures[0].name == "bad"


def test_unknown_dependency_rejected():
    p = Pipeline()
    try:
        p.add_stage("x", lambda ctx: 1, depends_on=["ghost"])
    except ValueError as e:
        assert "ghost" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_end_to_end_medallion_pipeline(spark, fixtures, tmp_path):
    """bronze -> silver -> gold -> parquet, wired through the runner
    (the reference's Step Functions DAG, reference stepfunctions.tf:8-226)."""
    from prox_spark.gold import build_star_schema, write_gold
    from prox_spark.silver import to_silver

    p = Pipeline()
    p.add_stage("bronze", lambda ctx: fixtures)
    p.add_stage("silver", lambda ctx: to_silver(ctx["bronze"]), depends_on=["bronze"])
    p.add_stage("gold", lambda ctx: build_star_schema(spark, ctx["silver"]),
                depends_on=["silver"])
    p.add_stage("load", lambda ctx: write_gold(ctx["gold"], str(tmp_path)),
                depends_on=["gold"])
    res = p.run()
    assert all(r.status == "succeeded" for r in res.values())
    fact = spark.read.parquet(str(tmp_path / "fact_booking"))
    assert fact.count() > 0
    assert spark.read.parquet(str(tmp_path / "dim_date")).count() > 300
