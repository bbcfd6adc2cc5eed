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
# entries per round. Union coverage across rounds 1-9 is 215 of 215
# (every query has a green driver row), so round 10 rotates purely by
# STALENESS (recomputed from the CORRECTNESS_r01..r09 files): the
# FIVE queries new this round lead (never driver-gated), then the
# fifteen whose most recent green driver row is round 5, then the
# round-6 cohort in name order up to the 50-slot cap. Exactly 50.
_FRONT = [
    # new this round (never driver-gated)
    "q218_llm_pipeline_capstone",
    "q219_streaming_bounded_bm25",
    "q220_registry_served_stats",
    "q221_maintained_neardup_pairs",
    "q222_grouped_distinct_serving",
    # stalest driver rows next: the round-5 cohort...
    "q24_event_type_share",
    "q25_json_props",
    "q26_asof_click_to_purchase",
    "q27_unpivot_measures",
    "q28_cube_status_priority",
    "q29_acctbal_quartiles",
    "q39_sentiment",
    "q46_sliding_window_stats",
    "q47_event_funnel",
    "q48_promo_revenue",
    "q49_small_qty_revenue",
    "q50_parttype_yearly_revenue",
    "q68_salted_segment_revenue",
    "q70_median_acctbal",
    "q71_clicks_before_purchase",
    # ...then the round-6 cohort in name order, up to the 50 cap
    "q100_streaming_dedup",
    "q101_streaming_sessions",
    "q102_stratified_sample",
    "q103_price_histogram",
    "q104_rich_accounts_reconcile",
    "q106_local_supplier_revenue",
    "q107_disjunctive_revenue",
    "q108_trailing_30min_stats",
    "q109_streaming_dedup_store",
    "q110_pq_encode",
    "q111_pq_adc_search",
    "q112_media_real_decode",
    "q113_ivfpq_search",
    "q114_snapshot_diff",
    "q117_int8_quantize",
    "q118_incremental_agg",
    "q121_audio_real_decode",
    "q126_embedding_outliers",
    "q169_bpe_roundtrip",
    "q170_semdedup",
    "q171_cluster_spec_evolution",
    "q172_cross_source_dedup",
    "q173_auto_maintenance",
    "q174_cms_token_freq",
    "q175_matryoshka_overlap",
    "q176_image_phash_dedup",
    "q177_length_drift",
    "q178_wap_publish",
    "q179_bloom_decontaminate",
    "q180_dup_span_coverage",
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
