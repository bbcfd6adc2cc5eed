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
