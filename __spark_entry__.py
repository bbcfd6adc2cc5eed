"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``prox_spark/`` (see SURVEY.md §2 for the
operator inventory each query covers).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Top-5 suppliers by lineitem count — the reference's "top 5
    providers by bookings" KPI shape (reference
    sql/admin_kip_script:13-23) on the testdata: scan, broadcast
    equi-join, partial+final hash agg, true top-k
    (TakeOrderedAndProject).
    """
    from prox_spark.queries.relational import q02_top5_suppliers

    return q02_top5_suppliers(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from prox_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; keys match queries() where SQL-expressible."""
    from prox_spark.queries import all_oracles

    return all_oracles()
