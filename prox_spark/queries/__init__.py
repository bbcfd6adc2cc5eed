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
# entries per round. Union coverage across rounds 1-11 is 224 of 224
# (every pre-existing query has a green driver row), so round 12
# rotates by STALENESS (recomputed from CORRECTNESS_r01..r11) plus
# touched-query re-gates: the FIVE queries new this round lead (never
# driver-gated), then the five whose implementations materially
# changed this round (q223: one-sided pushdown pruning fix; q224:
# deterministic quantile-sample tie-break; q225/q226: writer txn
# staging + sink output-mode guard; q206: empty-corpus guard), then
# the round-7 cohort (stalest: last driver-checked five rounds ago —
# the PROX KPI/star-schema parity core among them), then the round-8
# cohort in name order up to the 50-slot cap. Exactly 50.
_FRONT = [
    # new this round (never driver-gated)
    "q231_datasource_change_feed",
    "q230_datasource_stream_source",
    "q227_registry_served_topk",
    "q228_datasource_multi_table_txn",
    "q229_grouped_topk_serving",
    # materially changed this round: re-gate
    "q223_datasource_table_read",
    "q224_registry_served_quantiles",
    "q225_datasource_table_write",
    "q226_datasource_stream_sink",
    "q206_leakage_free_split",
    # stalest driver rows next: the round-7 cohort (all 25)...
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
    # ...then the round-8 cohort in name order, up to the 50 cap
    "q65_hash_split",
    "q66_source_mixture",
    "q67_decontaminate",
    "q72_dup_clusters",
    "q75_tfidf_top_terms",
    "q76_ngram_decontaminate",
    "q80_pii_redact",
    "q81_repetition_stats",
    "q82_chunk_split_udtf",
    "q127_pagerank",
    "q128_variant_props",
    "q129_corpus_shuffle",
    "q130_heavy_hitters",
    "q131_zorder_scan",
    "q132_auto_skew_revenue",
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
