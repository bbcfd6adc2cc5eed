"""Physical-plan assertions: the scale properties SURVEY.md §4 claims
(pushdown, pruning, broadcast, true top-k, sub-quadratic dedup, single
Arrow stage) must be visible in `explain`, not just hoped for."""

from __future__ import annotations

import contextlib
import io

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q01_pushdown_and_pruning(spark):
    from prox_spark.queries.relational import q01_pricing_summary

    plan = _plan(q01_pricing_summary(spark, SF_DIR))
    assert "LessThan(l_shipdate" in plan  # predicate reached the scan
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_comment" not in read_schema  # wide columns pruned
    assert "l_orderkey" not in read_schema


def test_q02_broadcast_and_topk(spark):
    from prox_spark.queries.relational import q02_top5_suppliers

    plan = _plan(q02_top5_suppliers(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan  # dim side broadcast, no shuffle join
    assert "TakeOrderedAndProject" in plan  # top-k without full sort


def test_q14_constant_folded_pushdown(spark):
    from prox_spark.queries.relational import q14_orders_since_week

    plan = _plan(q14_orders_since_week(spark, SF_DIR))
    # date_trunc('week', lit) folds to a literal that reaches the scan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_q36_minhash_is_subquadratic(spark):
    from prox_spark.queries.text import q36_minhash_lsh

    plan = _plan(q36_minhash_lsh(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q42_neardup_is_subquadratic(spark):
    from prox_spark.queries import similarity as S

    # the BUILD (the pair artifact's write path): corpus x corpus must
    # never cross-join (the only cross join is the 20-row hyperplane
    # broadcast); candidate pairs must come from an equality join on
    # the bucket key
    emb = S._emb_n(spark, SF_DIR)
    tagged = S._plane_buckets(emb, S._ND_PLANE_ROWS)
    pairs = S._nd_verify(S._nd_candidates(tagged, tagged, same=True), emb)
    plan = _plan(pairs)
    assert "CartesianProduct" not in plan
    assert "bkt" in plan  # bucket equi-join key present
    assert any(op in plan for op in ("SortMergeJoin Inner", "ShuffledHashJoin Inner", "BroadcastHashJoin Inner"))
    # the SERVE (q42 itself): a pure scan of the stored pair artifact —
    # no joins at all, repeat queries never re-verify candidates
    plan2 = _plan(S.q42_embed_neardup(spark, SF_DIR))
    assert "CartesianProduct" not in plan2
    assert "Join" not in plan2


def test_q39_single_arrow_stage(spark):
    from prox_spark.queries.text import q39_sentiment

    plan = _plan(q39_sentiment(spark, SF_DIR))
    # exactly one ArrowEvalPython node — "formatted" prints each node
    # once in the tree ("ArrowEvalPython (3)") and once in the detail
    assert plan.count("ArrowEvalPython (") == 1  # UDF not duplicated


@contextlib.contextmanager
def _no_auto_broadcast(spark):
    """With autoBroadcastJoinThreshold=-1, any BroadcastExchange left in
    a plan can only come from an explicit hint — exposing hints that
    would pin a full corpus to the driver at scale."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_q35_q36_no_corpus_broadcast_hint(spark):
    """The verify-join payload attach (shingle arrays / size table) must
    not be broadcast-hinted: it is O(corpus) and would OOM the driver at
    billions of docs (VERDICT r1 'What's wrong' #1/#3)."""
    from prox_spark.queries.text import q35_jaccard_pairs, q36_minhash_lsh

    with _no_auto_broadcast(spark):
        for fn in (q35_jaccard_pairs, q36_minhash_lsh):
            plan = _plan(fn(spark, SF_DIR))
            assert "BroadcastExchange" not in plan
            assert "BroadcastHashJoin" not in plan
            spark.catalog.clearCache()


def test_q206_broadcasts_only_pair_derived(spark):
    """q206's single counter job may broadcast ONLY the pair-derived
    frames — the committed pair table and the pair-sized ``half``
    join — never the corpus-wide assignment or label frames
    (VERDICT r10 'What's wrong' #1: a doc_id→split broadcast is an
    executor OOM at crawl scale). With auto-broadcast disabled, every
    BroadcastExchange left is a hint; exactly the two pair-derived
    ones must remain, and the docs⟕labels attach must not be one."""
    from prox_spark.queries.text import q206_audit_plan

    import re

    with _no_auto_broadcast(spark):
        plan = _plan(q206_audit_plan(spark, SF_DIR))
    # "(NN) BroadcastExchange" appears once in the tree and once in
    # the detail section per node — count distinct node ids
    assert len(set(re.findall(r"\((\d+)\) BroadcastExchange", plan))) == 2
    spark.catalog.clearCache()


def test_q42_broadcasts_only_plane_table(spark):
    """q42's only hinted broadcasts are the 20-row hyperplane tables
    (LocalRelation/ExistingRDD); the embedding corpus joins as a shuffle
    equi-join (VERDICT r1 'What's wrong' #2)."""
    from prox_spark.queries.similarity import q42_embed_neardup

    with _no_auto_broadcast(spark):
        plan = _plan(q42_embed_neardup(spark, SF_DIR))
    # no corpus-side broadcast join anywhere ...
    assert "BroadcastHashJoin" not in plan
    # ... and every BroadcastExchange present is the plane table (one per
    # self-join branch), which scans an in-memory relation, never parquet
    assert plan.count("BroadcastExchange") == plan.count("Scan ExistingRDD")


def test_q45_single_window(spark):
    """Centroid ranking is map-side (array_sort over K sims), so the only
    Window left is the final per-query top-k after the probe join —
    previously a second Window shuffled the full corpus on vec_id."""
    from prox_spark.queries.similarity import q45_ivf_ann

    plan = _plan(q45_ivf_ann(spark, SF_DIR))
    assert plan.count("Window (") == 1


def test_q38_simhash_is_map_side(spark):
    """SimHash assembles bits with in-row folds — no token explode, no
    groupBy: the only exchange left is the deterministic output sort."""
    from prox_spark.queries.text import q38_simhash

    plan = _plan(q38_simhash(spark, SF_DIR))
    assert "HashAggregate" not in plan  # bits fold in-row, no groupBy
    assert "Generate" not in plan       # no token explode
    # exchanges: the output sort + (locally) the _spread repartition,
    # which is a no-op on real multi-partition inputs ("Exchange ("
    # matches tree nodes once; the details section prints "(n) Exchange")
    assert plan.count("Exchange (") <= 2


def test_q71_range_join_is_keyed(spark):
    """The equi part (user_id) must drive the join; the time-range
    predicate rides as an in-key filter — never a cartesian/BNLJ."""
    from prox_spark.queries.events import q71_clicks_before_purchase

    plan = _plan(q71_clicks_before_purchase(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert any(
        f"{op} LeftOuter" in plan
        for op in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )


def test_q74_argmax_has_no_window(spark):
    """arg-max per group runs as a partial+final aggregate (struct-max /
    max_by combiners) — the window formulation would shuffle every row
    to rank it; for k=1 the plan must not contain a Window at all."""
    from prox_spark.queries.relational import q74_top_customer_per_nation

    plan = _plan(q74_top_customer_per_nation(spark, SF_DIR))
    assert "Window (" not in plan
    assert "partial_max" in plan  # map-side combine is actually happening


def test_q73_percentiles_single_window_pass(spark):
    """p25/p50/p75 come from ONE rank/count window over the group key —
    not one window per percentile, and never a per-group array."""
    from prox_spark.queries.relational import q73_group_percentiles

    plan = _plan(q73_group_percentiles(spark, SF_DIR))
    assert plan.count("Window (") == 1
    assert "collect_list" not in plan


def test_q76_broadcasts_only_eval_side(spark):
    """Decontamination must broadcast the (tiny) eval shingle table and
    keep the corpus pass map-side: with auto-broadcast off, the only
    BroadcastExchange is the hinted eval side (an in-memory relation,
    never a parquet scan), and no exchange shuffles the corpus —
    everything between scan and final agg is map-side."""
    from prox_spark.queries.text import q76_ngram_decontaminate

    with _no_auto_broadcast(spark):
        plan = _plan(q76_ngram_decontaminate(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    # one node each ("formatted" prints every node twice: tree + detail);
    # the eval side is a pure-JVM VALUES relation (LocalTableScan) since
    # the r12 values_df conversion — never a parquet scan
    assert plan.count("BroadcastExchange") == plan.count("LocalTableScan") == 2


def test_python_surface_single_stage_each(spark):
    """Each Python-API query crosses the Arrow boundary exactly once:
    one UDTF eval / one grouped-agg / one grouped-map node — Python
    never re-enters the plan for post-processing (that stays JVM-side)."""
    from prox_spark.queries.events import q84_user_running_totals_pandas
    from prox_spark.queries.text import q82_chunk_split_udtf, q83_source_token_totals

    plan = _plan(q82_chunk_split_udtf(spark, SF_DIR))
    assert plan.count("ArrowEvalPythonUDTF (") == 1
    plan = _plan(q83_source_token_totals(spark, SF_DIR))
    assert plan.count("ArrowAggregatePython (") == 1
    # audit twin: the shipping q84 puts a localCheckpoint barrier before
    # the global sort (so the range sampler does not re-run the pandas
    # stage), which truncates the visible plan at an RDD scan — the
    # un-checkpointed twin shows the single pandas node
    plan = _plan(q84_user_running_totals_pandas(spark, SF_DIR, _audit=True))
    assert plan.count("FlatMapGroupsInPandas (") == 1


def test_q17_semi_anti_operators(spark):
    from prox_spark.queries.relational import q17_customers_without_orders

    plan = _plan(q17_customers_without_orders(spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_q90_exists_decorrelates_to_semi_join(spark):
    """The correlated EXISTS must run as ONE LeftSemi equi-join on the
    order key with the date comparison as a residual condition — not a
    dedup subquery re-scan, and never a nested-loop."""
    from prox_spark.queries.relational import q90_late_order_priority

    plan = _plan(q90_late_order_priority(spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the >60-day comparison rides inside the semi join, not a post-filter
    assert plan.count("Join (") == 1 or "LeftSemi" in plan


def test_q91_scalar_is_one_broadcast_row(spark):
    """The scalar-average subquery crosses the cluster as a single
    broadcast row (BroadcastNestedLoopJoin over a 1-row aggregate); the
    NOT EXISTS is a LeftAnti equi-join — the corpus is never nested-loop
    joined against itself."""
    from prox_spark.queries.relational import q91_dormant_rich_customers

    plan = _plan(q91_dormant_rich_customers(spark, SF_DIR))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    # exactly one BNLJ (the 1-row scalar attach): formatted explain
    # prints each node twice — tree ("BroadcastNestedLoopJoin Inner
    # BuildRight (16)") and detail ("(16) BroadcastNestedLoopJoin")
    assert plan.count("BroadcastNestedLoopJoin") == 2


def test_q93_single_arrow_stage(spark):
    """mapInArrow crosses the Arrow boundary exactly once and nothing
    shuffles before the Python stage — the kernel is map-only."""
    from prox_spark.queries.text import q93_arrow_byte_stats

    plan = _plan(q93_arrow_byte_stats(spark, SF_DIR))
    assert plan.count("MapInArrow (") == 1
    # map-only: no key shuffle anywhere — the only exchanges are the
    # deliberate round-robin Python-worker spread (_spread_py) upstream
    # and the deterministic output sort's range partitioning downstream
    assert "hashpartitioning" not in plan
    tree = plan.split("\n\n", 1)[0]
    scan_side = tree.split("MapInArrow", 1)[-1]
    assert scan_side.count("Exchange") <= 1  # just the worker spread


def test_q106_pushdown_and_no_cartesian(spark):
    from prox_spark.queries.relational import q106_local_supplier_revenue

    plan = _plan(q106_local_supplier_revenue(spark, SF_DIR))
    # the one-year window reaches the orders scan; the 6-way join
    # needs no cartesian despite the two-column supplier condition
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "LessThan(o_orderdate" in plan
    assert "CartesianProduct" not in plan


def test_q107_disjunction_pushed_to_part_scan(spark):
    from prox_spark.queries.relational import q107_disjunctive_revenue

    plan = _plan(q107_disjunctive_revenue(spark, SF_DIR))
    # the per-table half of the OR-of-ANDs (brand disjunction) is
    # extracted and pushed below the join into the part scan
    part_scans = [l for l in plan.splitlines() if "PushedFilters" in l and "p_brand" in l]
    assert part_scans and any("Or(" in l for l in part_scans)


def test_q105_band_join_no_cartesian(spark):
    from prox_spark.queries.text import q105_simhash_neardup

    plan = _plan(q105_simhash_neardup(spark, SF_DIR))
    assert "CartesianProduct" not in plan  # blocking, not all-pairs
    assert "BroadcastNestedLoopJoin" not in plan


def test_q102_single_pass_aggregation(spark):
    from prox_spark.queries.relational import q102_stratified_sample

    plan = _plan(q102_stratified_sample(spark, SF_DIR))
    # sampled + total metrics fold into ONE aggregation over ONE scan
    # (no second scan for the denominator); the only exchanges are the
    # 3-row agg and the final sort
    import re

    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """100 TB knob check: with a selective dim-side predicate and a
    shuffle join, Spark injects a bloom-filter runtime filter
    (`might_contain`) on the probe side, pruning shuffle input the
    way a cluster-size run needs. Thresholds are conf-driven; the
    creation side must be UNDER creationSideThreshold and the probe
    scan OVER applicationSideScanSizeThreshold."""
    from pyspark.sql import functions as F

    keep = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": None,
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": None,
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": None,
        "spark.sql.autoBroadcastJoinThreshold": None,
    }
    for k in keep:
        keep[k] = spark.conf.get(k, None)
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1g")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        optimized = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in optimized.lower()
    finally:
        for k, v in keep.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_q82_udtf_is_arrow_batched(spark):
    """The session factory enables Arrow evaluation for Python UDTFs;
    q82's chunker must show the vectorized node, not the row-at-a-time
    BatchEvalPythonUDTF."""
    from prox_spark.queries.text import q82_chunk_split_udtf

    plan = q82_chunk_split_udtf(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPythonUDTF" in plan
    assert "BatchEvalPythonUDTF" not in plan


def test_q129_shuffle_is_topk_not_global_sort(spark):
    from prox_spark.queries.text import q129_corpus_shuffle

    plan = _plan(q129_corpus_shuffle(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q130_candidates_broadcast_semi(spark):
    from prox_spark.queries.events import q130_heavy_hitters

    plan = _plan(q130_heavy_hitters(spark, SF_DIR))
    assert "MapInPandas" in plan          # pass-1 local counting
    assert "LeftSemi" in plan             # candidate prune
    assert "BroadcastExchange" in plan    # candidates broadcast, fact never re-shuffled for the prune
    assert "CartesianProduct" not in plan


def test_q131_range_predicates_reach_clustered_scan(spark):
    from prox_spark.queries.relational import q131_zorder_scan

    plan = _plan(q131_zorder_scan(spark, SF_DIR))
    # both clustered columns' bounds pushed to the parquet scan, where
    # the z-layout's tight file/row-group stats make them prune
    assert "GreaterThanOrEqual(l_partkey" in plan
    assert "GreaterThanOrEqual(l_suppkey" in plan
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_comment" not in read_schema


def test_q133_no_single_partition_corpus_window(spark):
    from prox_spark.queries.text import q133_shard_assignment

    plan = _plan(q133_shard_assignment(spark, SF_DIR))
    # the corpus-sized window is keyed by source; the only
    # SinglePartition exchange feeds the per-source TOTALS window
    # (one row per source), never the corpus
    lines = plan.splitlines()
    tree = []
    for line in lines:
        if not line.strip():
            break
        tree.append(line)
    assert sum("Window" in l for l in tree) >= 2
    assert "BroadcastExchange" in plan  # offsets broadcast back
    assert "CartesianProduct" not in plan


def test_q134_q135_payloads_stay_in_python_stages(spark):
    from prox_spark.queries.multimodal import q134_image_resize, q135_frame_sample

    for fn, n_stages in ((q134_image_resize, 2), (q135_frame_sample, 3)):
        plan = _plan(fn(spark, SF_DIR))
        tree = plan.split("\n\n")[0]  # nodes reappear in the details section
        assert tree.count("MapInPandas") == n_stages, fn.__name__
        # nothing between the Python stages and the sort but projection:
        # payloads never enter a join or aggregate
        assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_q168_encode_plan_has_no_training_loop(spark):
    """q168 consumes the PERSISTED merge artifact: its returned plan
    must contain exactly one aggregate pass (the per-source rollup) —
    a q163-style training loop would show up as pair-count aggregates
    feeding TakeOrderedAndProject."""
    from prox_spark.queries.text import q168_bpe_encode

    plan = _plan(q168_bpe_encode(spark, SF_DIR))
    tree = plan.split("\n\n")[0]
    assert "TakeOrderedAndProject" not in tree  # the trainer's argmax shape
    # one partial+final HashAggregate pair for the rollup, nothing else
    assert tree.count("HashAggregate") == 2
    assert "CartesianProduct" not in plan


def test_q169_roundtrip_single_scan(spark):
    from prox_spark.queries.text import q169_bpe_roundtrip

    plan = _plan(q169_bpe_roundtrip(spark, SF_DIR))
    tree = plan.split("\n\n")[0]
    assert tree.count("HashAggregate") == 2  # per-source rollup only
    assert "Join" not in tree  # decode==original is an expression, not a join
    assert "CartesianProduct" not in plan


def test_q170_semdedup_pairs_confined_to_clusters(spark):
    """SemDeDup's pair join must be an equi-join on cid — cross-cluster
    pairs are never formed (the sub-quadratic claim); the only
    nested-loop-ish node allowed is the broadcast-tiny centroid-array
    attach shared with q45."""
    from prox_spark.queries.similarity import q170_semdedup

    plan = _plan(q170_semdedup(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    tree = plan.split("\n\n")[0]
    # the centroid attach is a broadcast of ONE collected row; it
    # prints once per consumer of the cached assignment (pair sides +
    # member count = 3). Any more would be a corpus cross join.
    assert tree.count("BroadcastNestedLoopJoin") <= 3
    assert "cid" in plan


def test_topk_serving_broadcast_discipline(spark):
    """The CMS serving probes: the GLOBAL grid (≤ d×w rows, kilobytes
    at any corpus size) is the one explicitly-broadcast frame
    (q227); the GROUPED grid is corpus-derived (groups × d×w) and
    must carry NO broadcast hint — AQE decides (q229), the q206
    discipline for corpus-sized frames."""
    import re

    from prox_spark.queries.table_q import q227_serve_plan, q229_serve_plan

    with _no_auto_broadcast(spark):
        g = _plan(q227_serve_plan(spark, SF_DIR))
        assert len(set(re.findall(r"\((\d+)\) BroadcastExchange", g))) == 1
        spark.catalog.clearCache()
        grp = _plan(q229_serve_plan(spark, SF_DIR))
        assert "BroadcastExchange" not in grp
        spark.catalog.clearCache()
