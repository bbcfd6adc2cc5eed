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
# entries per round. Union coverage across rounds 1-5 reached 166 of
# 166 (every query has a green driver row), so round 6 rotates purely
# by STALENESS: the twenty queries new this round lead (never
# driver-gated), then the ones whose most recent green driver row is
# oldest — the full round-2-gated cohort (16) and the round-3-gated
# cohort in name order up to the 50-slot cap. Everything after the
# front block is driver-green from round 3, 4, or 5. Exactly 50
# entries (round 5 accidentally listed 51 and the last one fell
# outside the checked window — recomputed from the CORRECTNESS_r*
# files this time).
_FRONT = [
    # new this round (never driver-gated)
    "q191_table_stream_view",
    "q192_multi_table_txn",
    "q193_dedup_data_card",
    "q194_streaming_lsh_index",
    "q195_top_principal_component",
    # stalest driver rows next (last gated r3, name order) — the r2
    # cohort and the r3 names through q126 were re-gated in r6, so the
    # remaining r3 cohort rotates in, then the oldest r4 names
    "q134_image_resize",
    "q135_frame_sample",
    "q136_streaming_neardup_store",
    "q152_cdc_apply",
    "q30_exact_dedup",
    "q31_text_stats",
    "q32_regex_token_count",
    "q33_quality_score",
    "q34_fingerprint",
    "q35_jaccard_pairs",
    "q36_minhash_lsh",
    "q37_langid",
    "q38_simhash",
    "q40_cosine_topk",
    "q41_lsh_ann",
    "q42_embed_neardup",
    "q43_media_features",
    "q44_stateful_user_totals",
    "q45_ivf_ann",
    "q51_kpi_bookings_per_location_service",
    "q52_kpi_avg_rating_per_provider",
    "q53_kpi_monthly_revenue_per_provider",
    "q54_kpi_pct_ai_generated",
    "q55_kpi_top5_booked_categories_week",
    "q56_kpi_top5_providers_by_bookings",
    "q57_kpi_top5_disputed_providers",
    "q58_kpi_top_rated_providers",
    "q59_gold_fact_booking",
    "q60_gold_dim_user",
    "q61_gold_dim_service",
    "q62_gold_dim_location",
    "q63_gold_dim_review",
    "q64_gold_dim_dispute",
    "q69_streaming_hourly_stats",
    "q77_stream_static_enrich",
    "q78_stream_stream_join",
    "q85_label_centroids",
    "q88_vector_stats",
    # last driver row: round 4, name order, up to the 50-slot cap
    "q105_simhash_neardup",
    "q115_segment_dedup",
    "q116_sequence_packing",
    "q119_point_in_time_join",
    "q120_bpe_pair_counts",
    "q122_quality_prune",
    "q124_dedup_pipeline",
]


def all_queries() -> dict[str, QueryFn]:
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
