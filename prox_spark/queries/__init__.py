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


# Registry order matters: the correctness driver checks the first ~50
# entries per round. Union coverage across rounds 1-8 is 208 of 208
# (every query has a green driver row), so round 9 rotates purely by
# STALENESS (recomputed from the CORRECTNESS_r01..r08 files): the
# SEVEN queries new this round lead (never driver-gated), then the eight
# whose most recent green driver row is round 4, then the round-5
# cohort in name order up to the 50-slot cap. Exactly 50 entries.
_FRONT = [
    # new this round (never driver-gated)
    "q211_mv_serve_from_view",
    "q212_minmax_materialized_view",
    "q213_bounded_bm25",
    "q214_maintained_bounded_bm25",
    "q215_ivf_recluster",
    "q216_artifact_registry",
    "q217_frozen_training_set",
    # stalest driver rows next: the q83-q98 cohort last gated in
    # round 4, then the round-5 cohort in name order, up to the 50 cap
    "q83_source_token_totals",
    "q84_user_running_totals_pandas",
    "q86_scd2_user_state",
    "q87_fuzzy_verify",
    "q92_cohort_retention",
    "q93_arrow_byte_stats",
    "q97_gap_fill_locf",
    "q99_filter_funnel",
    "q01_pricing_summary",
    "q02_top5_suppliers",
    "q03_avg_acctbal_by_nation",
    "q04_monthly_revenue",
    "q05_status_pct_by_priority",
    "q06_lineitems_by_nation_flag",
    "q07_top5_suppliers_by_returns",
    "q08_top3_orders_per_segment",
    "q09_date_dim",
    "q10_distinct_nation_region",
    "q11_fk_orphans",
    "q12_segment_status_matrix",
    "q13_active_nations",
    "q14_orders_since_week",
    "q157_jpeg_block_decode",
    "q158_video_frame_sample",
    "q159_mor_delete",
    "q15_rollup",
    "q160_triangle_count",
    "q161_ivf_index_maintenance",
    "q162_ivf_mor_delete",
    "q163_bpe_train",
    "q164_rare_token_profile",
    "q165_source_overlap_matrix",
    "q166_rename_evolution",
    "q167_chunked_point_lookup",
    "q168_bpe_encode",
    "q16_nation_setops",
    "q17_customers_without_orders",
    "q18_pivot_status",
    "q19_approx_distinct_custkeys",
    "q20_hourly_event_stats",
    "q21_sessionize",
    "q22_rolling_avg",
    "q23_first_event_per_key",
]


def all_queries() -> dict[str, QueryFn]:
    from . import (
        events,
        graph_q,
        io_q,
        kpi_q,
        multimodal,
        relational,
        search,
        similarity,
        streaming_q,
        table_q,
        text,
    )

    merged: dict[str, QueryFn] = {}
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
        search,
    ):
        merged.update(mod.QUERIES)
    missing = [name for name in _FRONT if name not in merged]
    if missing:
        raise KeyError(
            f"_FRONT references unregistered queries {missing}: update the "
            "_FRONT list in prox_spark/queries/__init__.py after renaming or "
            "removing a query"
        )
    out: dict[str, QueryFn] = {name: merged.pop(name) for name in _FRONT}
    out.update(merged)
    return out


def all_oracles() -> dict[str, str]:
    from . import (
        events,
        graph_q,
        io_q,
        kpi_q,
        multimodal,
        relational,
        search,
        similarity,
        streaming_q,
        table_q,
        text,
    )

    out: dict[str, str] = {}
    for mod in (relational, events, text, search, similarity, multimodal, streaming_q, graph_q, io_q):
        out.update(mod.ORACLES)
    # kpi_q/table_q oracles are built lazily: building them stages the
    # parquet fixtures / table snapshots both engines read
    out.update(kpi_q.oracles())
    out.update(table_q.oracles())
    return out
