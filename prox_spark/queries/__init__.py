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
# entries per round. Rounds 1-3 drove 104 of 150 queries through that
# gate; this round the 46 never-driver-checked entries (text tail,
# connector gate, PageRank, new events/relational operators) plus this
# round's new queries go FIRST so every query in the repo has appeared
# in a driver CORRECTNESS gate at least once. Everything after the
# front block is already driver-green from an earlier round.
_FRONT = [
    # new this round: streaming CDC consume over file-granular commits
    "q153_streaming_cdc_apply",
    "q154_point_lookup",
    "q155_png_pixel_decode",
    "q156_interval_overlap_join",
    # connector/format gate (q141 carries the round-4 stream-source fix)
    "q138_jsonl_scan",
    "q139_orc_scan",
    "q140_python_datasource",
    "q141_python_stream_source",
    "q143_xml_scan",
    "q142_polymorphic_udtf",
    # graph
    "q127_pagerank",
    "q150_weighted_pagerank",
    # events/relational operators never gated
    "q84_user_running_totals_pandas",
    "q86_scd2_user_state",
    "q92_cohort_retention",
    "q97_gap_fill_locf",
    "q151_gap_fill_interp",
    "q119_point_in_time_join",
    "q128_variant_props",
    "q130_heavy_hitters",
    "q131_zorder_scan",
    "q132_auto_skew_revenue",
    "q144_approx_quantile_band",
    # text/dedup tail
    "q105_simhash_neardup",
    "q65_hash_split",
    "q66_source_mixture",
    "q67_decontaminate",
    "q72_dup_clusters",
    "q75_tfidf_top_terms",
    "q76_ngram_decontaminate",
    "q80_pii_redact",
    "q82_chunk_split_udtf",
    "q83_source_token_totals",
    "q81_repetition_stats",
    "q87_fuzzy_verify",
    "q93_arrow_byte_stats",
    "q99_filter_funnel",
    "q115_segment_dedup",
    "q116_sequence_packing",
    "q120_bpe_pair_counts",
    "q122_quality_prune",
    "q124_dedup_pipeline",
    "q129_corpus_shuffle",
    "q133_shard_assignment",
    "q137_curation_capstone",
    "q145_temperature_mixture",
    "q146_winsorized_stats",
    "q147_containment_pairs",
    "q148_source_concentration",
    "q149_log_length_histogram",
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
