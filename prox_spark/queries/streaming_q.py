"""Streaming queries materialized for the correctness gate: each
callable runs a REAL Structured Streaming pass (file source ->
stateful operator -> memory sink, availableNow trigger) and returns
the drained result as a batch DataFrame, so the DuckDB oracle can
check the stateful semantics end-to-end.

The reference has no streaming at all (SURVEY.md §2.10); these extend
the engine's event surface. prox_spark/streaming.py holds the
operators; tests/test_streaming.py covers incremental execution
against multi-file directories.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


def q44_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running totals via applyInPandasWithState (custom group
    state), drained with an availableNow trigger. Raw double sums from
    the state are rounded JVM-side (determinism rules,
    queries/__init__.py)."""
    from prox_spark.queries.events import _events
    from prox_spark.streaming import read_event_stream, run_to_memory, stateful_user_totals

    ev = _events(spark, sf_dir).withColumn("ts", F.col("ts").cast("timestamp"))
    stage_dir = tempfile.mkdtemp(prefix="prox_spark_q44_")
    ev.coalesce(4).write.mode("overwrite").parquet(stage_dir)
    batch_schema = spark.read.parquet(stage_dir).schema

    stream = read_event_stream(spark, stage_dir, batch_schema)
    totals = stateful_user_totals(stream)
    # the stateful stage fans out one Python worker per shuffle
    # partition; cap like every Python stage (queries/text.py
    # _spread_py) — streams pin the conf at start, so set/restore
    import os

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        os.environ.get("SPARK_GRAFT_PY_PARTITIONS", "8"),
    )
    try:
        drained = run_to_memory(
            totals, f"q44_mem_{uuid.uuid4().hex[:8]}", output_mode="update"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return (
        drained.select(
            "user_id",
            "n_events",
            F.round("sum_value_raw", 2).alias("sum_value"),
        )
        .orderBy("user_id")
    )


ORACLE_Q44 = """
SELECT user_id,
       count(*)             AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""

QUERIES = {"q44_stateful_user_totals": q44_stateful_user_totals}
ORACLES = {"q44_stateful_user_totals": ORACLE_Q44}
