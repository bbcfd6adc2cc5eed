"""Block-max bounded BM25 (prox_spark/wand.py): exactness against a
from-scratch full scorer, genuine file skipping, floor edge cases,
and bound validity through merge maintenance."""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import functions as F

from prox_spark.wand import (
    CORPUS_ROW,
    FROZEN_ROW,
    bounded_bm25,
    build_bounded_index,
    maintain_bounded_index,
)

TOKENS = "split(lower(text), ' ')"
# the q200 scoring arithmetic (rational pre-log idf, micro-units)
TERM_MICRO = (
    "cast(round(((n_docs - df + 0.5) / (df + 0.5))"
    " * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / (tot / n_docs)))))"
    " * 1000000.0, 0) as bigint)"
)


def _scratch() -> str:
    d = tempfile.mkdtemp(prefix="prox_wand_test_")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def _corpus(spark, n=400):
    """Skewed synthetic corpus: 'common' is everywhere, 'rare' in a
    handful of docs, tf of 'common' varies so impact blocks separate."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("common "),
            # repeat 'common' id%7 more times -> tf spread 1..7
            F.expr("repeat('common ', cast(id % 7 as int))"),
            F.lit("filler"), (F.col("id") % 13).cast("string"),
            F.lit(" "),
            F.when(F.col("id") % 97 == 0, F.lit("rare ")).otherwise(
                F.lit("")
            ),
            F.when(F.col("id") % 3 == 0, F.lit("mid ")).otherwise(
                F.lit("")
            ),
            F.expr("repeat('pad ', cast(id % 5 as int))"),
        ).alias("text"),
    ).withColumn("text", F.trim("text"))


def _brute_force(spark, docs, queries, top_k):
    """Full scorer, no index: the exactness reference."""
    from pyspark.sql import Window

    toks = docs.withColumn("tokens", F.expr(TOKENS)).select(
        "doc_id", F.size("tokens").cast("long").alias("dl"), "tokens"
    )
    tf = (
        toks.select("doc_id", "dl", F.explode("tokens").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    stats = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("tot"),
    )
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    q = spark.createDataFrame(queries, "query_id long, term string")
    scored = (
        tf.join(F.broadcast(q), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("term_micro", F.expr(TERM_MICRO))
    )
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
        F.sum("term_micro").cast("long").alias("score_micro"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), "doc_id"
    )
    return (
        agg.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= top_k)
        .select("query_id", "rnk", "doc_id", "n_terms_hit", "score_micro")
    )


# q1 (rare AND common) is the no-skip shape: the rare term's ub keeps
# every common block essential (a rare doc's exact score needs its
# common tf wherever it lives). q2-q4 are the skipping shapes: single
# high-df terms whose low-impact blocks provably miss the top-k floor.
QUERIES = [
    (1, "rare"),
    (1, "common"),
    (2, "common"),
    (3, "mid"),
    (4, "pad"),
]


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_bounded_equals_brute_force_with_fewer_files(spark):
    s = _scratch()
    docs = _corpus(spark)
    build_bounded_index(spark, docs, f"{s}/idx", f"{s}/stats", TOKENS,
                        n_files=24)
    out, counters = bounded_bm25(
        spark, f"{s}/idx", f"{s}/stats", QUERIES, 10, TERM_MICRO
    )
    assert _rows(out) == _rows(_brute_force(spark, docs, QUERIES, 10))
    assert counters["files_opened"] < counters["files_full"], counters
    assert counters["files_opened"] > 0


def test_small_candidate_set_opens_everything_and_stays_exact(spark):
    """A query whose pass-1 block yields < k candidates has no floor:
    every block opens, and the answer is still exact."""
    s = _scratch()
    docs = _corpus(spark, n=120)
    build_bounded_index(spark, docs, f"{s}/idx", f"{s}/stats", TOKENS,
                        n_files=8)
    qs = [(9, "rare")]  # ~2 docs at n=120
    out, counters = bounded_bm25(
        spark, f"{s}/idx", f"{s}/stats", qs, 10, TERM_MICRO
    )
    assert _rows(out) == _rows(_brute_force(spark, docs, qs, 10))
    assert counters["files_opened"] == counters["files_full"]


def test_unknown_term_returns_empty(spark):
    s = _scratch()
    docs = _corpus(spark, n=60)
    build_bounded_index(spark, docs, f"{s}/idx", f"{s}/stats", TOKENS,
                        n_files=4)
    out, _ = bounded_bm25(
        spark, f"{s}/idx", f"{s}/stats", [(1, "zzzmissing")], 5, TERM_MICRO
    )
    assert out.count() == 0


def test_maintenance_keeps_answers_exact_and_bounds_sound(spark):
    """Insert + delete + update feed: the merged index serves the
    final corpus's exact top-k (vs a from-scratch brute force), the
    stats rows stay exact for touched terms, and the corpus row folds
    additively."""
    from prox_spark.table import read_table

    s = _scratch()
    docs = _corpus(spark, n=300)
    old = docs.filter(F.col("doc_id") < 250)
    build_bounded_index(spark, old, f"{s}/idx", f"{s}/stats", TOKENS,
                        n_files=16)

    # feed: insert docs 250..299, delete doc_id%11==0 (existing only),
    # update doc_id%13==1 to a new text (delete+insert pair)
    ins = docs.filter(F.col("doc_id") >= 250).select(
        "doc_id", "text",
        F.lit("insert").alias("_change_type"),
        F.lit(2).cast("long").alias("_commit_version"),
    )
    dels = old.filter(F.col("doc_id") % 11 == 0).select(
        "doc_id", "text",
        F.lit("delete").alias("_change_type"),
        F.lit(3).cast("long").alias("_commit_version"),
    )
    upd_base = old.filter(
        (F.col("doc_id") % 13 == 1) & (F.col("doc_id") % 11 != 0)
    )
    upd = upd_base.select(
        "doc_id", "text",
        F.lit("delete").alias("_change_type"),
        F.lit(4).cast("long").alias("_commit_version"),
    ).unionByName(
        upd_base.select(
            "doc_id",
            F.concat(F.col("text"), F.lit(" extra rare mid")).alias("text"),
            F.lit("insert").alias("_change_type"),
            F.lit(4).cast("long").alias("_commit_version"),
        )
    )
    feed = ins.unionByName(dels).unionByName(upd)
    info = maintain_bounded_index(
        spark, f"{s}/idx", f"{s}/stats", feed, TOKENS
    )
    assert info["touched_docs"] > 0 and info["affected_terms"] > 0

    final = docs.filter(
        (F.col("doc_id") % 11 != 0) | (F.col("doc_id") >= 250)
    ).withColumn(
        "text",
        F.when(
            (F.col("doc_id") % 13 == 1) & (F.col("doc_id") < 250),
            F.concat(F.col("text"), F.lit(" extra rare mid")),
        ).otherwise(F.col("text")),
    )
    out, counters = bounded_bm25(
        spark, f"{s}/idx", f"{s}/stats", QUERIES, 10, TERM_MICRO
    )
    assert _rows(out) == _rows(_brute_force(spark, final, QUERIES, 10))

    # stats exactness: df/corpus rows equal a from-scratch recount
    toks = final.withColumn("tokens", F.expr(TOKENS))
    want_corpus = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.size("tokens")).cast("long").alias("tot"),
    ).first()
    srows = {
        r["term"]: (r["df"], r["max_impact"])
        for r in read_table(spark, f"{s}/stats").collect()
    }
    assert srows[CORPUS_ROW] == (want_corpus["n"], want_corpus["tot"])
    assert FROZEN_ROW in srows
    want_df = {
        r["term"]: r["df"]
        for r in toks.select(
            "doc_id", F.explode("tokens").alias("term")
        )
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .collect()
    }
    for t in ("rare", "common", "mid", "pad"):
        assert srows[t][0] == want_df[t], t


def test_compaction_restores_block_granularity(spark):
    """Merge maintenance fragments the per-term impact blocks across
    files; compact_bounded_index re-clusters globally — identical
    answers, and the skip rule opens no more (typically fewer) files
    than against the fragmented layout."""
    from prox_spark.wand import compact_bounded_index

    s = _scratch()
    docs = _corpus(spark, n=400)
    old = docs.filter(F.col("doc_id") < 300)
    build_bounded_index(spark, old, f"{s}/idx", f"{s}/stats", TOKENS,
                        n_files=24)
    # three maintenance rounds scatter rewrites across the layout
    for lo, hi, ver in ((300, 340, 2), (340, 370, 3), (370, 400, 4)):
        feed = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).select(
            "doc_id", "text",
            F.lit("insert").alias("_change_type"),
            F.lit(ver).cast("long").alias("_commit_version"),
        )
        maintain_bounded_index(spark, f"{s}/idx", f"{s}/stats", feed,
                               TOKENS)
    before, c_before = bounded_bm25(
        spark, f"{s}/idx", f"{s}/stats", QUERIES, 10, TERM_MICRO
    )
    rows_before = _rows(before)
    assert rows_before == _rows(_brute_force(spark, docs, QUERIES, 10))

    compact_bounded_index(spark, f"{s}/idx", n_files=24)
    after, c_after = bounded_bm25(
        spark, f"{s}/idx", f"{s}/stats", QUERIES, 10, TERM_MICRO
    )
    assert _rows(after) == rows_before, "compaction must not change answers"
    assert c_after["files_opened"] <= c_before["files_opened"], (
        c_before, c_after
    )
    assert c_after["files_opened"] < c_after["files_full"], c_after

def test_empty_corpus_serves_empty_topk(spark):
    """Maintenance that deletes every doc leaves a servable index:
    bounded_bm25 short-circuits to an empty top-k instead of dividing
    by n_docs = 0."""
    s = _scratch()
    docs = _corpus(spark, n=40)
    build_bounded_index(spark, docs, f"{s}/idx", f"{s}/stats", TOKENS,
                        n_files=4)
    feed = docs.select(
        "doc_id", "text",
        F.lit("delete").alias("_change_type"),
        F.lit(2).cast("long").alias("_commit_version"),
    )
    maintain_bounded_index(spark, f"{s}/idx", f"{s}/stats", feed, TOKENS)
    out, counters = bounded_bm25(
        spark, f"{s}/idx", f"{s}/stats", QUERIES, 10, TERM_MICRO
    )
    assert out.count() == 0
    assert counters == {"files_full": 0, "files_opened": 0}


def test_missing_reserved_rows_raise_descriptively(spark):
    """A stats table without its reserved corpus/frozen rows (mis-built
    or truncated) fails loudly with a named cause, not a KeyError."""
    import pytest

    from prox_spark.table import commit_snapshot

    s = _scratch()
    docs = _corpus(spark, n=40)
    build_bounded_index(spark, docs, f"{s}/idx", f"{s}/stats", TOKENS,
                        n_files=4)
    # a 'stats table' with no reserved rows at all
    commit_snapshot(
        spark, f"{s}/badstats",
        spark.createDataFrame(
            [("common", 40, 1_000_000)],
            "term string, df long, max_impact long",
        ),
        stat_cols=["term"],
    )
    with pytest.raises(ValueError, match="reserved row"):
        bounded_bm25(
            spark, f"{s}/idx", f"{s}/badstats", QUERIES, 10, TERM_MICRO
        )


def test_stats_refresh_range_fallback_matches_exact(spark, monkeypatch):
    """Past the driver-collect cap the affected-term list never lands
    on the driver: the stats recompute scopes by term RANGE + semi-join
    instead, and the refreshed stats (and served answers) are identical
    to the capped key-set path."""
    import prox_spark.upsert as upsert_mod

    s = _scratch()
    docs = _corpus(spark, n=300)
    old = docs.filter(F.col("doc_id") < 250)
    build_bounded_index(spark, old, f"{s}/idx", f"{s}/stats", TOKENS,
                        n_files=16)
    # force the fallback: pretend every affected-term batch overflows
    monkeypatch.setattr(
        upsert_mod, "_collect_capped",
        lambda df, cap=None: None,
    )
    ins = docs.filter(F.col("doc_id") >= 250).select(
        "doc_id", "text",
        F.lit("insert").alias("_change_type"),
        F.lit(2).cast("long").alias("_commit_version"),
    )
    dels = old.filter(F.col("doc_id") % 11 == 0).select(
        "doc_id", "text",
        F.lit("delete").alias("_change_type"),
        F.lit(3).cast("long").alias("_commit_version"),
    )
    maintain_bounded_index(
        spark, f"{s}/idx", f"{s}/stats", ins.unionByName(dels), TOKENS
    )
    final = docs.filter(
        (F.col("doc_id") % 11 != 0) | (F.col("doc_id") >= 250)
    )
    out, _ = bounded_bm25(
        spark, f"{s}/idx", f"{s}/stats", QUERIES, 10, TERM_MICRO
    )
    assert _rows(out) == _rows(_brute_force(spark, final, QUERIES, 10))
    # stats exactness under the fallback path
    from prox_spark.table import read_table

    toks = final.withColumn("tokens", F.expr(TOKENS))
    want = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.size("tokens")).cast("long").alias("tot"),
    ).first()
    srows = {
        r["term"]: (r["df"], r["max_impact"])
        for r in read_table(spark, f"{s}/stats").collect()
    }
    assert srows[CORPUS_ROW] == (want["n"], want["tot"])


def test_maintenance_publishes_coverage_atomically(spark):
    """``covers`` lands as the stats manifest's index_of in the SAME
    commit as the corpus fold, so a replay decided by that record can
    never double-fold the window."""
    from prox_spark.table import read_manifest

    s = _scratch()
    docs = _corpus(spark, n=60)
    old = docs.filter(F.col("doc_id") < 50)
    build_bounded_index(spark, old, f"{s}/idx", f"{s}/stats", TOKENS,
                        n_files=4)
    feed = docs.filter(F.col("doc_id") >= 50).select(
        "doc_id", "text",
        F.lit("insert").alias("_change_type"),
        F.lit(2).cast("long").alias("_commit_version"),
    )
    maintain_bounded_index(
        spark, f"{s}/idx", f"{s}/stats", feed, TOKENS,
        covers={"base": f"{s}/corpus", "version": 7},
    )
    meta = read_manifest(spark, f"{s}/stats").get("index_of")
    assert meta == {"base": f"{s}/corpus", "version": 7}

def test_stream_batch_lineage_fence(spark):
    """bounded_index_stream_batch: rows at or below the stats
    manifest's covered version fold nothing (snapshot re-delivery /
    replay), rows above fold exactly their uncovered slice and bump
    the coverage in the same commit; a stats table without lineage
    refuses to stream."""
    import pytest

    from prox_spark.table import read_manifest, read_table
    from prox_spark.wand import bounded_index_stream_batch

    s = _scratch()
    docs = _corpus(spark, n=80)
    base = f"{s}/corpus"
    build_bounded_index(
        spark, docs, f"{s}/idx", f"{s}/stats", TOKENS, n_files=4,
        covers={"base": base, "version": 1},
    )
    vs0 = int(read_manifest(spark, f"{s}/stats")["version"])

    def feed(lo, hi, ver):
        return _corpus(spark, n=200).filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).select(
            "doc_id", "text",
            F.lit("insert").alias("_change_type"),
            F.lit(ver).cast("long").alias("_commit_version"),
        )

    # v1 re-delivery (the stream's first batch after a fenced build)
    bounded_index_stream_batch(
        feed(0, 80, 1), 0, base, f"{s}/idx", f"{s}/stats", TOKENS
    )
    assert int(read_manifest(spark, f"{s}/stats")["version"]) == vs0
    # a genuine v2 slice folds and bumps coverage atomically
    bounded_index_stream_batch(
        feed(80, 120, 2), 1, base, f"{s}/idx", f"{s}/stats", TOKENS
    )
    meta = read_manifest(spark, f"{s}/stats")["index_of"]
    assert meta == {"base": base, "version": 2}
    corpus_row = (
        read_table(spark, f"{s}/stats")
        .filter(F.col("term") == CORPUS_ROW).first()
    )
    assert int(corpus_row["df"]) == 120
    # replaying the same batch is fenced out (no double-fold)
    bounded_index_stream_batch(
        feed(80, 120, 2), 1, base, f"{s}/idx", f"{s}/stats", TOKENS
    )
    corpus_row2 = (
        read_table(spark, f"{s}/stats")
        .filter(F.col("term") == CORPUS_ROW).first()
    )
    assert int(corpus_row2["df"]) == 120
    # exactness after the fold: serving equals brute force on 0..120
    final = _corpus(spark, n=200).filter(F.col("doc_id") < 120)
    out, _ = bounded_bm25(
        spark, f"{s}/idx", f"{s}/stats", QUERIES, 10, TERM_MICRO
    )
    assert _rows(out) == _rows(_brute_force(spark, final, QUERIES, 10))
    # a lineage-less stats table refuses to stream
    build_bounded_index(
        spark, docs, f"{s}/idx2", f"{s}/stats2", TOKENS, n_files=2
    )
    with pytest.raises(ValueError, match="index_of lineage"):
        bounded_index_stream_batch(
            feed(80, 120, 2), 1, base, f"{s}/idx2", f"{s}/stats2", TOKENS
        )
