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
# entries per round. Union coverage across rounds 1-10 is 220 of 220
# (every query has a green driver row), so round 11 rotates by
# STALENESS (recomputed from the CORRECTNESS_r01..r10 files) plus one
# touched-query re-gate: the FOUR queries new this round lead (never
# driver-gated), then q206 (its implementation materially changed
# this round — served pair artifact + flipped counter broadcasts —
# so its green r10 row no longer covers the current code), then the
# round-6 cohort (stalest: last driver-checked four rounds ago), then
# the round-7 cohort in name order up to the 50-slot cap. Exactly 50.
_FRONT = [
    # new this round (never driver-gated)
    "q223_datasource_table_read",
    "q224_registry_served_quantiles",
    "q225_datasource_table_write",
    "q226_datasource_stream_sink",
    # materially changed this round: re-gate
    "q206_leakage_free_split",
    # stalest driver rows next: the round-6 cohort (all 20)...
    "q73_group_percentiles",
    "q74_top_customer_per_nation",
    "q79_grouping_sets",
    "q89_rank_functions",
    "q90_late_order_priority",
    "q91_dormant_rich_customers",
    "q94_nation_revenue_share",
    "q95_brand_supplier_counts",
    "q96_large_quantity_orders",
    "q98_hll_rollup",
    "q181_bigram_fluency",
    "q182_tagged_rollback",
    "q183_files_metadata",
    "q184_incremental_minmax",
    "q185_dup_span_removal",
    "q186_audio_fingerprint_dedup",
    "q187_content_index_lookup",
    "q188_zorder_table_probes",
    "q189_streaming_cms",
    "q190_incremental_join",
    # ...then the round-7 cohort in name order, up to the 50 cap
    "q105_simhash_neardup",
    "q115_segment_dedup",
    "q116_sequence_packing",
    "q119_point_in_time_join",
    "q120_bpe_pair_counts",
    "q122_quality_prune",
    "q124_dedup_pipeline",
    "q134_image_resize",
    "q135_frame_sample",
    "q136_streaming_neardup_store",
    "q152_cdc_apply",
    "q191_table_stream_view",
    "q192_multi_table_txn",
    "q193_dedup_data_card",
    "q194_streaming_lsh_index",
    "q195_top_principal_component",
    "q30_exact_dedup",
    "q31_text_stats",
    "q32_regex_token_count",
    "q33_quality_score",
    "q34_fingerprint",
    "q35_jaccard_pairs",
    "q36_minhash_lsh",
    "q37_langid",
    "q38_simhash",
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
