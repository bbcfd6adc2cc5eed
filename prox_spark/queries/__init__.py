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
# entries per round. Union coverage across rounds 1-12 is 229 of 229
# (every query has a green driver row), so round 13 rotates by
# STALENESS plus touched-query re-gates: the round-8 cohort leads
# (stalest: last driver-checked five rounds ago — the r12 verdict's
# rotation plan), then the queries whose implementations materially
# changed in this optimization round (one-pass rewrites, VALUES
# serving frames, checkpoint barriers — every one oracle-verified at
# sf0.01 in-session, re-gated here by the driver), up to the 50 cap.
# Exactly 50.
_FRONT = [
    # the round-8 cohort (all 34 — stalest driver rows)
    "q133_shard_assignment",
    "q137_curation_capstone",
    "q138_jsonl_scan",
    "q139_orc_scan",
    "q140_python_datasource",
    "q141_python_stream_source",
    "q142_polymorphic_udtf",
    "q143_xml_scan",
    "q144_approx_quantile_band",
    "q145_temperature_mixture",
    "q146_winsorized_stats",
    "q147_containment_pairs",
    "q148_source_concentration",
    "q149_log_length_histogram",
    "q150_weighted_pagerank",
    "q151_gap_fill_interp",
    "q153_streaming_cdc_apply",
    "q154_point_lookup",
    "q155_png_pixel_decode",
    "q156_interval_overlap_join",
    "q196_change_feed",
    "q197_stream_changefeed_view",
    "q198_streaming_semantic_index",
    "q199_incremental_data_card",
    "q200_bm25_search",
    "q201_incremental_text_index",
    "q202_shallow_clone",
    "q203_hybrid_retrieval",
    "q204_check_constraints",
    "q205_streaming_text_index",
    "q207_materialized_view",
    "q208_join_materialized_view",
    "q209_kmv_distinct",
    "q210_streaming_mv",
    # materially changed this round (r13 optimization): re-gate
    "q183_files_metadata",
    "q177_length_drift",
    "q115_segment_dedup",
    "q180_dup_span_coverage",
    "q185_dup_span_removal",
    "q193_dedup_data_card",
    "q227_registry_served_topk",
    "q228_datasource_multi_table_txn",
    "q229_grouped_topk_serving",
    "q224_registry_served_quantiles",
    "q127_pagerank",
    "q160_triangle_count",
    "q75_tfidf_top_terms",
    "q181_bigram_fluency",
    "q152_cdc_apply",
    "q189_streaming_cms",
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
