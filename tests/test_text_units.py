"""Unit tests for text-query internals that need synthetic (non-parquet)
inputs — currently the q165 overlap-matrix fan-out bound."""
from __future__ import annotations

from pyspark.sql import functions as F


def test_overlap_pair_join_fanout(spark):
    """A prefix shared by K DISTINCT bodies in each of 2 sources must
    produce O(1) joined rows per source pair at the distinct
    (pfx, source) level — never O(K²).  This pins the round-5 fix:
    the self-join runs on distinct (key, source), so boilerplate
    prefixes ("<!DOCTYPE html…") with huge distinct-body counts
    cannot blow up the join."""
    from prox_spark.queries.text import _shared_pair_join

    K = 50
    rows = [
        (f"body-{src}-{i}", src)
        for src in ("crawl_a", "crawl_b")
        for i in range(K)
    ]
    docs = spark.createDataFrame(rows, "text string, source string").select(
        F.lit("SHARED_PREFIX_MD5").alias("pfx"), "source"
    )
    joined = _shared_pair_join(docs.distinct(), "pfx")
    # 2 sources sharing 1 prefix -> exactly one (src_a, src_b) row,
    # regardless of the K distinct bodies behind it.
    assert joined.count() == 1
    row = joined.first()
    assert (row["src_a"], row["src_b"]) == ("crawl_a", "crawl_b")


def test_overlap_matrix_values(spark, tmp_path, monkeypatch):
    """End-to-end q165 on a hand-built corpus: exact-shared implies
    prefix-shared, and a prefix-only overlap reports n_shared_exact=0
    through the left-join + coalesce path."""
    from prox_spark.queries import text as T

    # src a/b share one exact text AND one prefix-only template;
    # src c overlaps nothing.
    pad = "x" * T.OVERLAP_PREFIX
    rows = [
        (pad + " same exact body", "a"),
        (pad + " same exact body", "b"),
        ("TEMPLATE_HEADER_24_CHARS_ tail one", "a"),
        ("TEMPLATE_HEADER_24_CHARS_ tail two", "b"),
        ("totally unrelated document here", "c"),
    ]
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(rows, "text string, source string").write.parquet(p)
    monkeypatch.setattr(
        T, "_docs", lambda sp, sf: sp.read.parquet(str(tmp_path / "documents.parquet"))
    )
    out = {
        (r["src_a"], r["src_b"]): (r["n_shared_prefix"], r["n_shared_exact"])
        for r in T.q165_source_overlap_matrix(spark, "ignored").collect()
    }
    assert out == {("a", "b"): (2, 1)}


def test_bloom_prefilter_exactness_and_pruning(spark):
    """q179's Bloom prefilter must (a) never lose a true hit — the
    prefiltered exact join equals the plain exact join — and (b)
    genuinely prune: on a corpus whose shingles are mostly absent from
    the eval set, the bloom-positive sliver is far smaller than the
    corpus shingle table (false positives are possible but bounded by
    the ~BLOOM_BITS/entries budget)."""
    from prox_spark.queries.text import (
        BLOOM_BITS,
        BLOOM_K,
        _bloom_filter_df,
        _bloom_hit_expr,
        _eval_shingles,
    )

    ev = _eval_shingles(spark)
    # synthetic corpus shingles: 30 true hits (sampled from the eval
    # set) + 2000 guaranteed misses
    truth = ev.limit(30).select(F.lit(1).alias("doc_id"), "shingle")
    misses = spark.range(2000).select(
        (F.col("id") % 40 + 2).cast("long").alias("doc_id"),
        F.concat(F.lit("zz-miss-"), F.col("id")).alias("shingle"),
    )
    corpus = truth.unionByName(misses)

    probed = corpus.crossJoin(F.broadcast(_bloom_filter_df(ev)))
    candidates = probed.filter(F.expr(_bloom_hit_expr(BLOOM_BITS, BLOOM_K)))

    plain = corpus.join(ev, "shingle").select("doc_id", "shingle")
    filtered = candidates.join(ev, "shingle").select("doc_id", "shingle")
    assert sorted(map(tuple, filtered.collect())) == sorted(
        map(tuple, plain.collect())
    )

    n_candidates = candidates.count()
    assert n_candidates >= 30  # no false negatives, ever
    # pruning: 2000 misses against a <=~200-entry, 4096-bit filter must
    # mostly bloom-negative (FPP ~ (entries*K/BITS)^K << 50%)
    assert n_candidates < 30 + 1000
