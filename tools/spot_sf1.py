"""sf1 scale spot-check for the superlinear-risk queries (round-5 ask).

Stages a deterministic 10x-of-sf0.1 input set under .fixtures/sf1 and
measures q160/q42/q105/q124/q137 against it, recording wall times and
scaling exponents next to the sf0.1 numbers in BENCH_DETAIL.json
(key "sf1_spotcheck", preserved across bench runs).

The staging is scaling-FAITHFUL, not naive duplication — 10 verbatim
copies would make every document a near-duplicate of 9 others and
blow the candidate volume up 100x, which tests the degenerate-corpus
regime instead of scale. Each replica instead lives in its own
disjoint similarity/graph space with the ORIGINAL's internal
structure:

- documents: replica r suffixes every token with ``_r{r}`` — shingle
  sets are disjoint across replicas, so near-dup candidate volume
  (q105/q124/q137) scales with corpus size exactly as a 10x crawl
  with the same duplication rate would;
- embeddings: replica r cyclically rotates each vector by r
  dimensions — cosine structure within a replica is preserved
  verbatim, across replicas it is decorrelated (q42);
- lineitem: replica r offsets order and part keys — 10 disjoint
  copies of the co-purchase graph with identical degree structure
  (q160): per-edge and per-wedge costs scale cleanly, while any
  accidental all-pairs behavior still explodes 100x and fails the
  ratio gate.

Expected exponents (time ~ N^e between sf0.1 and staged sf1):
near-linear (e ~ 1, allow fixed-cost dilution) for q42/q105/q124/
q137; q160's bound is m^1.5 worst case but with disjoint replicas
the expected growth is ~linear in edges. The gate flags e > 1.6.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SRC = "/root/testdata/sf0.1"
DEST = os.path.join(HERE, ".fixtures", "sf1")
REPLICAS = 10
OFF = 10_000_000
QUERIES = [
    "q160_triangle_count",
    "q42_embed_neardup",
    "q105_simhash_neardup",
    "q124_dedup_pipeline",
    "q137_curation_capstone",
    "q163_bpe_train",
    # round 6: the dup-gram/bigram joins — token-suffixed replicas keep
    # gram/bigram vocabularies disjoint across replicas, so duplicate
    # volume scales like a 10x crawl with the same duplication rate
    "q180_dup_span_coverage",
    "q185_dup_span_removal",
    "q181_bigram_fluency",
    # round 6: the restructured overlap matrix (the round-5 weak item)
    # — its distinct-level self-joins must scale ~linearly in corpus
    # size; token-suffixed replicas give each replica a disjoint
    # prefix space, so candidate volume grows 10x, never 100x
    "q165_source_overlap_matrix",
    # round 7: SemDeDup (the round-6 weak item) — K now scales with
    # the corpus (max(8, isqrt(n))), so within-cluster pair volume is
    # O(N^1.5), not O(N²/const). Dim-rotated replicas keep each
    # replica's cosine structure verbatim while decorrelating across
    # replicas — the realistic 10x-crawl regime for cluster sizes.
    "q170_semdedup",
    # round 7: the unified data card composes the exact/span/semantic
    # fronts — its growth must stay the max of its arms' (span 0.67,
    # semantic N^1.5), never a product
    "q193_dedup_data_card",
    # round 8: exact-BIGINT power iteration — the stats pass is the
    # N-proportional work (one Arrow matmul pass, work ∝ N·d²), so the
    # expected exponent is ~1 with fixed-cost dilution; measured
    # cache-free via an override (the per-process stats cache would
    # otherwise hide the pass). Also exercises _assert_pca_headroom at
    # 10x the gate corpus.
    "q195_top_principal_component",
    # round 8: BM25 search + hybrid rerank — the INDEX (staged during
    # the warm pass) absorbs the N-proportional work; the timed query
    # is term probes + a fixed candidate set's rerank, so the measured
    # exponent claims the serving path stays sub-linear in corpus size
    # (postings per term grow ~10x but the probe still opens only the
    # pruned files).
    "q200_bm25_search",
    "q203_hybrid_retrieval",
    # round 9: block-max bounded BM25 — the serving claim is the same
    # sub-linearity as q200 PLUS the skip rule: at 10x the postings
    # the per-term blocks multiply, and the timed query opens only the
    # blocks whose impact bound can reach the top-k floor.
    "q213_bounded_bm25",
    # round 10: the capstone's frozen-manifest read (two pinned scans
    # + one BHJ — ~linear in the frozen corpus; the pipeline build,
    # churn, and vacuum are warmed away), the maintained near-dup pair
    # serving (a pruned pair-table scan — ∝ output), and the grouped
    # KMV serve (≤k rows per group regardless of corpus size).
    # q219 is EXCLUDED: its corpus is a fixed formulaic stream
    # workload that does not scale with sf, so an exponent over it
    # would be vacuous.
    "q218_llm_pipeline_capstone",
    "q221_maintained_neardup_pairs",
    "q222_grouped_distinct_serving",
    # round 11: the q206 serving path (pairs + CC labels read from the
    # staged committed artifact; leakage counters broadcast the
    # pair-derived side into the O(N) assignment scans — the timed
    # work is those scans, so the expected exponent is ~1 with
    # fixed-cost dilution), the batch-DataSource read (one task per
    # live file over the staged evolution+delete+rename history
    # table), and the served grouped quantile (≤k sample rows per
    # group regardless of corpus size — expected sublinear).
    "q206_leakage_free_split",
    "q223_datasource_table_read",
    "q224_registry_served_quantiles",
    # round 12: the connector WRITE paths, measured cache-free (the
    # staged build IS the write under test — an override clears the
    # per-process staging cache so both scales time the full
    # write-through-format() lifecycle): q225 batch writer (task-side
    # encode + stats + CAS commit ∝ rows), q226 streaming sink (per-
    # batch append + fence; stream startup is the fixed cost diluting
    # the exponent).
    "q225_datasource_table_write",
    "q226_datasource_stream_sink",
    # round 12: the unified-format streaming read — the warm pass runs
    # the connector loop (write → stream-replicate → sink), so the
    # timed path is the batch format() agg over the replicated sink
    # table: one task per live file, expected ~linear with fixed-cost
    # dilution (the q223 regime).
    "q230_datasource_stream_source",
    # round 12 (queued for the r13 measurement): batch CDF through
    # the connector — the warm pass stages the lifecycle + the
    # cross-engine audit, so the timed path is the connector feed
    # scan + signed fold: work ∝ commit volume, expected ~linear.
    "q231_datasource_change_feed",
]
# queries whose builder caches an intermediate per (app, sf_dir): warm
# the DEST side too, so both scales time the same post-cache work
WARM_DEST = {
    "q170_semdedup", "q193_dedup_data_card", "q200_bm25_search",
    "q203_hybrid_retrieval", "q213_bounded_bm25",
    # round 10: q42 serves from the staged near-dup pair artifact — the
    # measured exponent claims the SERVING path scales with the stored
    # pair list, not with re-verifying bucket candidates (the build is
    # q194's maintained-index write path, amortized like an index)
    "q42_embed_neardup",
    "q218_llm_pipeline_capstone",
    "q221_maintained_neardup_pairs",
    "q222_grouped_distinct_serving",
    # round 11: all three serve from per-process staged artifacts —
    # the warm pass builds them so both scales time the serving path
    "q206_leakage_free_split",
    "q223_datasource_table_read",
    "q224_registry_served_quantiles",
    # round 12: the loop fixture (three stream startups) is staging,
    # not the serving claim — warm both scales
    "q230_datasource_stream_source",
    "q231_datasource_change_feed",
}
MAX_EXPONENT = 1.6


def stage(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(DEST, "_STAGED")):
        return
    os.makedirs(DEST, exist_ok=True)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    dim = len(emb.select("embedding").first()["embedding"])

    d_parts, e_parts, l_parts = [], [], []
    for r in range(REPLICAS):
        if r == 0:
            d_parts.append(docs)
            e_parts.append(emb)
            l_parts.append(li)
            continue
        d_parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * OFF))
            .withColumn(
                "text", F.regexp_replace("text", r"(\S+)", f"$1_r{r}")
            )
        )
        roll = F.expr(
            f"concat(slice(embedding, {r + 1}, {dim - r}), "
            f"slice(embedding, 1, {r}))"
        )
        e_parts.append(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(r * OFF))
            .withColumn("embedding", roll)
        )
        l_parts.append(
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(r * OFF))
            .withColumn("l_partkey", F.col("l_partkey") + F.lit(r * OFF))
        )
    from functools import reduce

    reduce(lambda a, b: a.unionByName(b), d_parts).repartition(32).write.mode(
        "overwrite"
    ).parquet(f"{DEST}/documents.parquet")
    reduce(lambda a, b: a.unionByName(b), e_parts).repartition(32).write.mode(
        "overwrite"
    ).parquet(f"{DEST}/embeddings.parquet")
    reduce(lambda a, b: a.unionByName(b), l_parts).repartition(32).write.mode(
        "overwrite"
    ).parquet(f"{DEST}/lineitem.parquet")
    with open(os.path.join(DEST, "_STAGED"), "w") as f:
        f.write("ok")


def main() -> None:
    from prox_spark.queries import all_queries
    from prox_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("spot-sf1", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    stage(spark)

    detail_path = os.path.join(HERE, "BENCH_DETAIL.json")
    with open(detail_path) as f:
        detail = json.load(f)
    sf01 = detail.get("queries", {})

    qs = all_queries()

    # q163 persists its artifact behind a per-process cache (round 6):
    # the registry callable would train on first call and serve cached
    # reads after, so the naive warm-then-time at sf0.1 would compare a
    # CACHED read against sf1's cold TRAIN. Measure the training loop
    # itself, cache-free, at both scales — that's the scaling claim.
    def _measure_q163(spark_, sf_dir):
        from prox_spark.queries.text import _train_bpe

        class _N:  # duck-typed .count() for the timing loop below
            def __init__(self, sf):
                self.sf = sf

            def count(self):
                return len(_train_bpe(spark_, self.sf))

        return _N(sf_dir)

    # q195's stats pass (the N-proportional work) hides behind a
    # per-(app, sf_dir) cache — measure it cache-free at both scales,
    # like q163's artifact cache.
    def _measure_q195(spark_, sf_dir):
        from prox_spark.queries import similarity as S

        class _N:
            def __init__(self, sf):
                self.sf = sf

            def count(self):
                for _, stats in S._PCA_C_CACHE.values():
                    stats.unpersist()
                S._PCA_C_CACHE.clear()
                return S.q195_top_principal_component(spark_, self.sf).count()

        return _N(sf_dir)

    # connector write paths: clear the staging cache per measurement so
    # the timed work is the write lifecycle itself at each scale
    def _measure_uncached(qname, cache_name):
        from prox_spark.queries import table_q as TQ

        def make(spark_, sf_dir):
            class _N:
                def count(self):
                    getattr(TQ, cache_name).clear()
                    return all_queries()[qname](spark_, sf_dir).count()

            return _N()

        return make

    overrides = {
        "q163_bpe_train": _measure_q163,
        "q195_top_principal_component": _measure_q195,
        "q225_datasource_table_write": _measure_uncached(
            "q225_datasource_table_write", "_DS_WRITE_CACHE"
        ),
        "q226_datasource_stream_sink": _measure_uncached(
            "q226_datasource_stream_sink", "_DS_STREAM_CACHE"
        ),
    }
    out: dict = {}
    for name in QUERIES:
        fn = overrides.get(name, qs[name])
        fn(spark, SRC).count()  # warm (sf0.1)
        if name in WARM_DEST:
            fn(spark, DEST).count()  # warm (sf1) — see WARM_DEST note
        t01 = time.time()
        fn(spark, SRC).count()
        t01 = time.time() - t01
        t1 = time.time()
        n = fn(spark, DEST).count()
        t1 = time.time() - t1
        base = sf01.get(name, t01)
        import math

        exp = math.log(max(t1, 1e-3) / max(t01, 1e-3)) / math.log(10)
        out[name] = {
            "sf0.1_bench_s": base,
            "sf0.1_here_s": round(t01, 3),
            "sf1_s": round(t1, 3),
            "rows": n,
            "exponent": round(exp, 3),
            "ok": exp <= MAX_EXPONENT,
        }
        print(name, json.dumps(out[name]))

    detail["sf1_spotcheck"] = out
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    bad = [k for k, v in out.items() if not v["ok"]]
    print("SPOTCHECK", "FAIL " + ",".join(bad) if bad else "ALL OK")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
