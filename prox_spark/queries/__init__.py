"""Query registry: every operator family from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame builder plus (where SQL-expressible) a
DuckDB oracle twin with IDENTICAL column names and deterministic
values.

Determinism rules used throughout (see SURVEY.md §7.4 risks):

- Money/quantity sums: the inputs are fixed-decimal values, so the
  true sum is an exact multiple of 10^-k; ``round(sum(x), k)`` is
  therefore bit-identical across engines regardless of summation
  order.
- Averages: ``round(round(sum(x), k) / count, 6)`` — both engines
  divide *identical* doubles, so the quotient (and its rounding) is
  bit-identical. Never use bare ``avg`` over doubles.
- Top-k: always a deterministic tie-break column in the ORDER BY.
- Timestamps: session TZ pinned to UTC; parquet naive timestamps read
  as TIMESTAMP_NTZ on the Spark side to match DuckDB's naive
  TIMESTAMP.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    # Registry order matters: the correctness driver checks the first ~50
    # entries per round. The PROX KPI/gold parity surface (kpi_q), streaming,
    # multimodal, similarity, and text/dedup operators go first so they sit
    # inside that hard gate; the relational/events suite (green in rounds 1-2)
    # rotates to the tail.
    from . import (
        events,
        graph_q,
        io_q,
        kpi_q,
        multimodal,
        relational,
        similarity,
        streaming_q,
        table_q,
        text,
    )

    out: dict[str, QueryFn] = {}
    for mod in (
        kpi_q,
        streaming_q,
        multimodal,
        table_q,
        similarity,
        text,
        io_q,
        graph_q,
        events,
        relational,
    ):
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    from . import (
        events,
        graph_q,
        io_q,
        kpi_q,
        multimodal,
        relational,
        similarity,
        streaming_q,
        table_q,
        text,
    )

    out: dict[str, str] = {}
    for mod in (relational, events, text, similarity, multimodal, streaming_q, graph_q, io_q):
        out.update(mod.ORACLES)
    # kpi_q/table_q oracles are built lazily: building them stages the
    # parquet fixtures / table snapshots both engines read
    out.update(kpi_q.oracles())
    out.update(table_q.oracles())
    return out
