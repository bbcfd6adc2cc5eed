"""Derived-artifact REGISTRY + one-call maintenance — the operational
layer that keeps a base table's derived artifacts (materialized
views, value indexes, postings indexes, IVF indexes) CURRENT without
hand-run refresh scripts. The reference's analogue is its Step
Functions DAG re-running whole Glue jobs on a schedule
(reference stepfunctions.tf:8-226); the transposition is incremental:
every maintenance action below is the artifact's own delta-bounded
refresh, never a rebuild (except the IVF recluster, which fires only
when a measured imbalance threshold is crossed — and rebuilds on a
WAP branch without interrupting serving).

The registry itself is a manifest table (the format dogfooding its
own artifacts, like the BPE merge table and the value index): one row
per artifact — (artifact path, kind, base path, params JSON) — keyed
on the artifact path, so registration is an ordinary upsert and the
registry has time travel, vacuum, and cloning like any table.

``maintain_artifacts`` runs every registered artifact's maintenance
with PER-ARTIFACT error isolation: one broken artifact (say, a view
whose recorded column was dropped) reports ``error`` while the rest
still refresh; the call raises at the END unless ``raise_on_error``
is off, so failures are loud but never block sibling artifacts.

Kinds:

- ``mv`` / ``join_mv``: prox_spark.mv refresh (change-feed
  incremental; covered-version lineage lives in the VIEW's manifest).
- ``value_index``: prox_spark.table refresh_value_index (scans only
  files born after the covered version).
- ``bounded_postings``: prox_spark.wand maintain_bounded_index fed by
  the change feed since the covered version. Coverage is recorded as
  ``index_of`` lineage in the STATS table's manifest, published in the
  SAME atomic commit as the corpus-row fold (the one non-idempotent
  maintenance step) — so a crash between the data commit and the
  registry upsert can never replay the window into a double-counted
  fold; the registry row's ``covered`` param is informational (and the
  fallback for pre-lineage artifacts). params: ``text_col``,
  ``tokens_expr``, ``covered``, ``stats``, ``since`` (frozen at
  registration — the rename-resolution low bound).
- ``ivf``: conditional recluster — measure cell imbalance
  (max cell / mean cell) and fire prox_spark.queries.similarity
  recluster_index only past ``params["imbalance"]``; params: ``k``,
  ``imbalance`` (default 3.0).
- ``kmv`` / ``quantile_sketch`` / ``cms``: deterministic mergeable
  sketches (distinct / quantiles / heavy-hitter frequencies) — insert
  windows FOLD, delete echoes RECOMPUTE, coverage replaces atomically
  with the sketch; served via serve_distinct(_by) /
  serve_aggregate(quantile=) / serve_topk / serve_aggregate(topk=).
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from prox_spark.table import is_manifest_table, read_manifest, read_table

_SCHEMA = "artifact string, kind string, base string, params string"
KINDS = (
    "mv", "join_mv", "value_index", "bounded_postings", "ivf", "postings",
    "kmv", "nd_pairs", "quantile_sketch", "cms",
)

# KMV sketch size (q209's constant): k minimum md5-derived unit-interval
# hashes estimate distinct counts as (k-1)/u_k — deterministic (no HLL
# register randomness), so served estimates are oracle-reproducible
KMV_K = 16


def _kmv_u_frame(df, col: str, keys: list[str] = ()):
    """([keys...,] u double) frame: the md5-derived uniform u ∈ [0, 1)
    of each value of ``df.col`` — the deterministic hash the whole KMV
    family shares (q209) — with optional group-key columns carried."""
    from prox_spark.queries.text import _HEXV_SPARK, _u48_expr

    return df.select(
        *keys, F.md5(F.col(col).cast("string")).alias("m")
    ).select(*keys, F.expr(_u48_expr(_HEXV_SPARK)).alias("u"))


def _kmv_topk(values, keys: list[str], k: int = KMV_K):
    """The per-group (or global) k smallest distinct u's, DISTRIBUTED:
    global = distinct + TakeOrderedAndProject (k scalars ever move);
    grouped = a per-key row_number window (shuffle keyed by the group,
    k rows retained per group — never the value set)."""
    from pyspark.sql import Window

    if not keys:
        return values.select("u").distinct().orderBy("u").limit(k)
    w = Window.partitionBy(*keys).orderBy("u")
    return (
        values.select(*keys, "u").distinct()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _kmv_fold(spark: SparkSession, values, k: int = KMV_K):
    """Back-compat global fold: k smallest distinct u's as a local
    DataFrame (only k scalars land on the driver)."""
    rows = [float(r["u"]) for r in _kmv_topk(values, [], k).collect()]
    return spark.createDataFrame([(u,) for u in rows], "u double")


def build_kmv_sketch(
    spark: SparkSession,
    base_path: str,
    col: str,
    sketch_path: str,
    k: int = KMV_K,
    keys: list[str] = (),
) -> None:
    """Materialize the k-minimum-values distinct sketch of
    ``base_path.col`` as a manifest table — GLOBAL (≤ k rows of
    ``u double``) or GROUPED by ``keys`` (≤ k rows per group, the q209
    per-source shape) — its covered base version recorded as
    ``index_of`` lineage in the SAME commit. One map-side hash
    projection + a distributed top-k — kilobytes of state per group at
    any corpus size, mergeable by construction (the k smallest of
    unioned sketches are the k smallest overall)."""
    from prox_spark.table import commit_snapshot

    head = int(read_manifest(spark, base_path)["version"])
    u = _kmv_u_frame(read_table(spark, base_path), col, list(keys))
    commit_snapshot(
        spark, sketch_path, _kmv_topk(u, list(keys), k),
        stat_cols=[*keys, "u"] if keys else ["u"],
        extra_meta={"index_of": {"base": base_path, "version": head}},
    )


# Quantile-sketch sample size: a bottom-k-by-hash row sample (k rows
# with the smallest md5-derived u of the row KEY, per group) is a
# UNIFORM sample — deterministic (no RNG), mergeable by construction
# (the k smallest of unioned samples are the k smallest overall), and
# exactly reproducible in SQL, so served estimates hash-gate like KMV.
QSK_K = 256


def _qsk_u_frame(df, key: str, val: str, keys: list[str] = ()):
    """(keys..., u, v) frame: the md5-derived uniform u ∈ [0, 1) of
    each row's KEY column plus the (double-cast) value — the sampling
    hash the quantile-sketch family shares. Hashing the row key (not
    the value) makes the sample uniform over ROWS, so duplicated
    values keep their weight in the estimate."""
    from prox_spark.queries.text import _HEXV_SPARK, _u48_expr

    return df.select(
        *keys,
        F.md5(F.col(key).cast("string")).alias("m"),
        F.col(val).cast("double").alias("v"),
    ).select(*keys, F.expr(_u48_expr(_HEXV_SPARK)).alias("u"), "v")


def _qsk_topk(values, keys: list[str], k: int = QSK_K):
    """The per-group (or global) k sample rows with the smallest u,
    DISTRIBUTED — the _kmv_topk shape carrying the value column.
    Rows dedupe on (keys, u) with a DETERMINISTIC tie-break (max v):
    re-inserted keys normally arrive via delete echoes (recompute
    path), but an insert-only window CAN re-append a key with a new
    value — u hashes only the key, so the stored and feed rows
    collide on u and an arbitrary-keep would make the served
    estimate nondeterministic."""
    from pyspark.sql import Window

    values = (
        values.select(*keys, "u", "v")
        .groupBy(*keys, "u")
        .agg(F.max("v").alias("v"))
    )
    if not keys:
        return values.orderBy("u").limit(k)
    w = Window.partitionBy(*keys).orderBy("u")
    return (
        values.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def build_quantile_sketch(
    spark: SparkSession,
    base_path: str,
    key: str,
    val: str,
    sketch_path: str,
    k: int = QSK_K,
    keys: list[str] = (),
) -> None:
    """Materialize a mergeable quantile sketch of ``base_path.val`` as
    a manifest table — GLOBAL (≤ k rows of ``u double, v double``) or
    GROUPED by ``keys`` (≤ k rows per group) — its covered base
    version recorded as ``index_of`` lineage in the SAME commit.
    One map-side hash projection + a distributed top-k: kilobytes of
    state per group at any corpus size. A quantile request
    interpolates over the sample (``percentile`` — DuckDB's
    quantile_cont), so estimates are md5-deterministic and
    oracle-reproducible; a group whose sample is not full has
    retained EVERY row, making its estimate exact."""
    from prox_spark.table import commit_snapshot

    head = int(read_manifest(spark, base_path)["version"])
    u = _qsk_u_frame(read_table(spark, base_path), key, val, list(keys))
    commit_snapshot(
        spark, sketch_path, _qsk_topk(u, list(keys), k),
        stat_cols=[*keys, "u"] if keys else ["u"],
        extra_meta={"index_of": {"base": base_path, "version": head}},
    )


def serve_quantile_by(
    spark: SparkSession,
    registry_path: str,
    base_path: str,
    col: str,
    q: float,
    keys: list[str] = (),
):
    """Registry-routed APPROX QUANTILE: serve ``percentile(col, q)
    [GROUP BY keys]`` from a registered quantile sketch — the stored
    ≤k-rows-per-group sample plus a read-time fold of an insert-only
    uncovered window; a window with delete echoes falls through (a
    hash sample cannot retract). Returns ``(frame, path_or_None)``
    with columns (keys..., est_q) for a scalar ``q``, or the LONG form
    (keys..., q, est_q) when ``q`` is a list/tuple — every requested
    quantile interpolates over the sample in ONE pass (percentile
    takes the whole array). The fallback is the exact interpolated
    percentile over the base (same schema either way)."""
    from prox_spark.queries.search import postings_feed

    keys = list(keys)
    multi = isinstance(q, (list, tuple))
    q_list = [float(x) for x in q] if multi else [float(q)]
    q_arr = "array(" + ", ".join(repr(x) for x in q_list) + ")"

    def _quantile_agg(df, vexpr: str):
        if not multi:
            return df.groupBy(*keys).agg(
                F.round(
                    F.expr(f"percentile({vexpr}, {q_list[0]!r})"), 6
                ).alias("est_q")
            )
        out = (
            df.groupBy(*keys)
            .agg(F.expr(f"percentile({vexpr}, {q_arr})").alias("_e"))
            .select(
                *keys, F.posexplode("_e").alias("_i", "_est")
            )
            .withColumn("q", F.expr(q_arr)[F.col("_i")])
            .select(*keys, "q", F.round("_est", 6).alias("est_q"))
        )
        return out
    for ent in list_artifacts(spark, registry_path):
        if (
            ent["kind"] != "quantile_sketch"
            or ent["base"] != base_path
            or ent["params"].get("val") != col
            or list(ent["params"].get("keys") or []) != keys
        ):
            continue
        art = ent["artifact"]
        k = int(ent["params"].get("k", QSK_K))
        key = ent["params"]["key"]
        try:
            covered = _covered_version(spark, ent, art)
            head = int(read_manifest(spark, base_path)["version"])
            sk = read_table(spark, art).select(*keys, "u", "v")
            if head > covered:
                feed = postings_feed(
                    spark, base_path, covered, head, text_col=col,
                    since=int(ent["params"].get("since", covered)),
                )
                if feed.filter(
                    F.col("_change_type") == "delete"
                ).limit(1).count():
                    continue  # deletes: the sample cannot retract
                sk = _qsk_topk(
                    sk.unionByName(_qsk_u_frame(feed, key, col, keys)),
                    keys, k,
                )
            return _quantile_agg(sk, "v"), art
        except Exception:  # noqa: BLE001 — unreadable sketch: fall back
            continue
    exact = _quantile_agg(
        read_table(spark, base_path), f"cast({col} as double)"
    )
    return exact, None


# CMS heavy-hitter artifact: q174's D×W md5-bucketed counter grid
# (parametrized width) PLUS a capacity-bounded CANDIDATE list, stored
# in ONE manifest table so grid, candidates, and coverage replace
# atomically. Grid rows carry d ∈ [0, D); candidate rows ride as
# d = -2 with the item in ``tok``. The grid is elementwise-additive
# (folding a window is union + re-sum — the q189 streaming-merge
# argument), and every estimate is min over D md5 buckets — exact
# integer arithmetic, so served values are oracle-reproducible.
# Candidate maintenance is the standard CMS+heap heavy-hitter recipe:
# after each fold, keep the ``cand_k`` items with the largest grid
# estimates among (stored candidates ∪ the window's distinct items).
# An evicted item's true count is ≤ the cand_k-th estimate at
# eviction time (estimates never under-count), the usual guarantee;
# a corpus whose item vocabulary fits in cand_k loses nothing.
CMS_SERVE_D = 4
CMS_SERVE_W = 16
CMS_CAND_K = 64


def _cms_items(df, col: str, tokens: bool, keys: list[str] = ()):
    """One ``tok`` string row per counted occurrence (with its group
    keys): the column's value, or (``tokens``) its lowercased
    whitespace tokens — q174's tokenization, applied to an arbitrary
    text column."""
    if tokens:
        return df.select(
            *keys,
            F.explode(
                F.expr(f"split(lower(trim({col})), '\\\\s+')")
            ).alias("tok"),
        )
    return df.select(*keys, F.col(col).cast("string").alias("tok"))


def _cms_counts(items, keys: list[str] = ()):
    return items.groupBy(*keys, "tok").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def _cms_grid(cnt, d: int, w: int, keys: list[str] = ()):
    """(keys..., d, bucket, c) grid rows from per-item counts: one
    partial-agg per hash row over the vocabulary aggregate
    (equivalent to per-occurrence increments), ≤ d×w rows per group."""
    from functools import reduce

    from prox_spark.queries.text import _cms_bucket_spark

    rows = [
        cnt.select(
            *keys,
            F.lit(dd).cast("int").alias("d"),
            F.expr(_cms_bucket_spark(dd, w)).cast("long").alias("bucket"),
            F.col("cnt").alias("c"),
        )
        for dd in range(d)
    ]
    return (
        reduce(lambda a, b: a.unionByName(b), rows)
        .groupBy(*keys, "d", "bucket")
        .agg(F.sum("c").cast("long").alias("c"))
    )


def _cms_estimates(toks, grid, d: int, w: int, keys: list[str] = ()):
    """(keys..., tok, est_cnt): min over the D bucket counters each
    tok hashes to — ≥ the true count by construction (the q174
    probe). The GLOBAL grid is ≤ d×w rows (kilobytes at any corpus
    size): a safe broadcast. A grouped grid is groups × d×w — corpus-
    derived, so it stays un-hinted and AQE broadcasts only when it
    genuinely fits."""
    from prox_spark.queries.text import _cms_bucket_spark

    probes = toks.select(
        *keys,
        "tok",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(dd).cast("int").alias("d"),
                    F.expr(_cms_bucket_spark(dd, w))
                    .cast("long")
                    .alias("bucket"),
                )
                for dd in range(d)
            ])
        ).alias("p"),
    ).select(*keys, "tok", "p.d", "p.bucket")
    g = grid if keys else F.broadcast(grid)
    return (
        probes.join(g, [*keys, "d", "bucket"])
        .groupBy(*keys, "tok")
        .agg(F.min("c").cast("long").alias("est_cnt"))
    )


def _cms_topc(toks, grid, d: int, w: int, cand_k: int,
              keys: list[str] = ()):
    """The cand_k candidate toks (per group) with the largest grid
    estimates (ties by tok) — globally a true distributed top-k
    (TakeOrderedAndProject); grouped, a per-group row_number over a
    (candidates ∪ window-vocabulary)-bounded input."""
    est = _cms_estimates(toks.distinct(), grid, d, w, keys)
    if not keys:
        return (
            est.orderBy(F.desc("est_cnt"), F.asc("tok"))
            .limit(int(cand_k))
            .select("tok")
        )
    from pyspark.sql import Window

    wnd = Window.partitionBy(*keys).orderBy(
        F.desc("est_cnt"), F.asc("tok")
    )
    return (
        est.withColumn("_rn", F.row_number().over(wnd))
        .filter(F.col("_rn") <= int(cand_k))
        .select(*keys, "tok")
    )


def _cms_artifact_frame(grid, cands, keys: list[str] = ()):
    g = grid.select(
        *keys, "d", "bucket", "c",
        F.lit(None).cast("string").alias("tok"),
    )
    c = cands.select(
        *keys,
        F.lit(-2).cast("int").alias("d"),
        F.lit(0).cast("long").alias("bucket"),
        F.lit(0).cast("long").alias("c"),
        F.col("tok").cast("string").alias("tok"),
    )
    return g.unionByName(c)


def build_cms_sketch(
    spark: SparkSession,
    base_path: str,
    col: str,
    sketch_path: str,
    d: int = CMS_SERVE_D,
    w: int = CMS_SERVE_W,
    cand_k: int = CMS_CAND_K,
    tokens: bool = False,
    keys: list[str] = (),
) -> None:
    """Materialize the CMS heavy-hitter sketch of ``base_path.col``
    (column values, or its whitespace tokens with ``tokens``) as a
    manifest table — grid + candidates + covered base version
    (``index_of`` lineage) in ONE commit, GLOBAL or GROUPED by
    ``keys`` (the q222/q224 per-group shape). One vocabulary
    partial-agg over the base; the artifact is ≤ d×w + cand_k rows
    per group regardless of corpus size."""
    from prox_spark.table import commit_snapshot

    keys = list(keys)
    head = int(read_manifest(spark, base_path)["version"])
    cnt = _cms_counts(
        _cms_items(read_table(spark, base_path), col, tokens, keys),
        keys,
    ).persist()  # grid + candidate branches share ONE corpus scan
    try:
        grid = _cms_grid(cnt, d, w, keys)
        cands = _cms_topc(
            cnt.select(*keys, "tok"), grid, d, w, cand_k, keys
        )
        commit_snapshot(
            spark, sketch_path, _cms_artifact_frame(grid, cands, keys),
            extra_meta={"index_of": {"base": base_path, "version": head}},
        )
    finally:
        cnt.unpersist()


def serve_topk(
    spark: SparkSession,
    registry_path: str,
    base_path: str,
    col: str,
    k: int,
    tokens: bool = False,
    keys: list[str] = (),
):
    """Registry-routed HEAVY HITTERS: serve the top-``k`` most
    frequent items of ``base_path.col`` (column values, or its
    whitespace tokens with ``tokens``) — globally or PER GROUP with
    ``keys`` — from a registered ``cms`` artifact: stored candidates
    probed against the stored grid, plus a read-time additive fold of
    an insert-only uncovered window; a window with delete echoes
    falls through (candidate eviction is not retractable). Returns
    ``(frame, sketch_path_or_None)`` with columns (keys..., tok,
    est_cnt), ranked est_cnt DESC, tok ASC within each group; the
    fallback is the exact top-k count (same schema — an exact count
    IS a valid CMS estimate)."""
    from prox_spark.queries.search import postings_feed

    tokens = bool(tokens)
    keys = list(keys)

    def _rank(est):
        if not keys:
            return est.orderBy(
                F.desc("est_cnt"), F.asc("tok")
            ).limit(int(k))
        from pyspark.sql import Window

        wnd = Window.partitionBy(*keys).orderBy(
            F.desc("est_cnt"), F.asc("tok")
        )
        return (
            est.withColumn("_rn", F.row_number().over(wnd))
            .filter(F.col("_rn") <= int(k))
            .drop("_rn")
        )

    for ent in list_artifacts(spark, registry_path):
        if (
            ent["kind"] != "cms"
            or ent["base"] != base_path
            or ent["params"].get("col") != col
            or bool(ent["params"].get("tokens")) != tokens
            or list(ent["params"].get("keys") or []) != keys
        ):
            continue
        art = ent["artifact"]
        p = ent["params"]
        d = int(p.get("d", CMS_SERVE_D))
        w = int(p.get("w", CMS_SERVE_W))
        try:
            covered = _covered_version(spark, ent, art)
            head = int(read_manifest(spark, base_path)["version"])
            stored = read_table(spark, art)
            grid = stored.filter(F.col("d") >= 0).select(
                *keys, "d", "bucket", "c"
            )
            cands = stored.filter(F.col("d") == -2).select(*keys, "tok")
            if head > covered:
                feed = postings_feed(
                    spark, base_path, covered, head, text_col=col,
                    since=int(p.get("since", covered)),
                )
                if feed.filter(
                    F.col("_change_type") == "delete"
                ).limit(1).count():
                    continue  # deletes: eviction cannot retract
                bcnt = _cms_counts(
                    _cms_items(feed, col, tokens, keys), keys
                )
                grid = (
                    grid.unionByName(_cms_grid(bcnt, d, w, keys))
                    .groupBy(*keys, "d", "bucket")
                    .agg(F.sum("c").cast("long").alias("c"))
                )
                cands = cands.unionByName(
                    bcnt.select(*keys, "tok")
                ).distinct()
            return (
                _rank(_cms_estimates(cands, grid, d, w, keys)),
                art,
            )
        except Exception:  # noqa: BLE001 — unreadable sketch: fall back
            continue
    exact = _cms_counts(
        _cms_items(read_table(spark, base_path), col, tokens, keys),
        keys,
    ).withColumnRenamed("cnt", "est_cnt")
    return _rank(exact), None


def _kmv_estimate(rows: list[float], k: int) -> float:
    """(k−1)/u_k when the sketch is full; a sketch holding fewer than
    k values has seen EVERY distinct value — the exact count."""
    if len(rows) < k:
        return float(len(rows))
    return round((k - 1) / sorted(rows)[k - 1], 6)


def serve_distinct(
    spark: SparkSession,
    registry_path: str,
    base_path: str,
    col: str,
) -> tuple[float, str | None]:
    """Registry-routed APPROX DISTINCT: serve ``count(distinct col)``
    of the base from a registered KMV sketch — the stored k-row state
    plus a read-time fold of the uncovered change-feed window (insert
    values hash-and-merge; a window containing DELETES falls through,
    KMV cannot retract). Returns ``(estimate, sketch_path_or_None)``;
    the fallback is the exact distinct count. Estimates are
    deterministic (md5-derived hashes), so a served answer is
    reproducible anywhere."""
    from prox_spark.queries.search import postings_feed

    for ent in list_artifacts(spark, registry_path):
        if (
            ent["kind"] != "kmv"
            or ent["base"] != base_path
            or ent["params"].get("col") != col
            or ent["params"].get("keys")  # grouped: serve_distinct_by
        ):
            continue
        art = ent["artifact"]
        k = int(ent["params"].get("k", KMV_K))
        try:
            covered = _covered_version(spark, ent, art)
            head = int(read_manifest(spark, base_path)["version"])
            stored = [
                float(r["u"]) for r in read_table(spark, art).collect()
            ]
            if head > covered:
                feed = postings_feed(
                    spark, base_path, covered, head, text_col=col,
                    since=int(ent["params"].get("since", covered)),
                )
                if feed.filter(
                    F.col("_change_type") == "delete"
                ).limit(1).count():
                    continue  # deletes: the sketch cannot answer
                # k smallest of the window suffice: the k smallest of
                # a union equal the k smallest over the per-side
                # k-smallest sets (KMV mergeability)
                fresh = [
                    float(r["u"])
                    for r in _kmv_u_frame(feed, col)
                    .distinct().orderBy("u").limit(k).collect()
                ]
                stored = sorted(set(stored) | set(fresh))[:k]
            return _kmv_estimate(stored, k), art
        except Exception:  # noqa: BLE001 — unreadable sketch: fall back
            continue
    exact = (
        read_table(spark, base_path).select(col).distinct().count()
    )
    return float(exact), None


def register_artifact(
    spark: SparkSession,
    registry_path: str,
    kind: str,
    base_path: str,
    artifact_path: str,
    params: dict | None = None,
) -> None:
    """Register (or re-register — upsert by artifact path) a derived
    artifact for one-call maintenance."""
    from prox_spark.upsert import upsert_parquet

    if kind not in KINDS:
        raise ValueError(f"unknown artifact kind {kind!r}; one of {KINDS}")
    params = dict(params or {})
    if (
        kind in ("bounded_postings", "postings", "kmv", "quantile_sketch",
                 "cms")
        and "since" not in params
    ):
        # freeze the rename-resolution window's low bound at
        # REGISTRATION: the index records its text column's name as of
        # now, so later maintenance resolves renames committed after
        # this version only. Defaulting to 0 instead would replay
        # pre-registration rename events — a 'from' name recreated as
        # a NEW column would remap through the stale event to the
        # wrong physical column (a silent wrong tokenization).
        params["since"] = int(params.get(
            "covered", read_manifest(spark, base_path)["version"]
        ))
    row = spark.createDataFrame(
        [(artifact_path, kind, base_path, json.dumps(params))],
        _SCHEMA,
    )
    upsert_parquet(spark, registry_path, row, ["artifact"])


def list_artifacts(spark: SparkSession, registry_path: str) -> list[dict]:
    if not is_manifest_table(spark, registry_path):
        return []
    return [
        {
            "artifact": r["artifact"], "kind": r["kind"],
            "base": r["base"], "params": json.loads(r["params"]),
        }
        for r in read_table(spark, registry_path).collect()
    ]


def _covered_version(spark: SparkSession, ent: dict, meta_path: str) -> int:
    """The artifact's covered base version. The AUTHORITATIVE record
    is the ``index_of`` lineage in the artifact's own manifest
    (``meta_path`` — the stats table for bounded postings, the index
    itself for append postings), published in the SAME atomic commit
    as the folded data — so a crash between the data commit and the
    registry upsert can never leave the fold applied with the coverage
    stale (a replay of that window would double-count: append postings
    would re-append the identical signed delta, bounded stats would
    double-fold the additive corpus row). The registry row's
    ``covered`` param is the fallback for artifacts last maintained
    before the in-manifest lineage existed."""
    try:
        meta = read_manifest(spark, meta_path).get("index_of") or {}
        if meta.get("base") == ent["base"] and "version" in meta:
            return int(meta["version"])
    except Exception:  # noqa: BLE001 — unreadable meta: params decide
        pass
    return int(ent["params"].get("covered", 1))


def _maintain_one(spark: SparkSession, ent: dict) -> dict:
    kind, base, art = ent["kind"], ent["base"], ent["artifact"]
    params = ent["params"]
    if kind == "mv":
        from prox_spark.mv import refresh_mv

        out = refresh_mv(spark, art)
        return {
            "status": "refreshed" if out["refreshed"] else "noop",
            "covered": out["covered"],
        }
    if kind == "join_mv":
        from prox_spark.mv import refresh_join_mv

        out = refresh_join_mv(spark, art)
        return {
            "status": "refreshed" if out["refreshed"] else "noop",
            "covered": out["covered"],
        }
    if kind == "value_index":
        from prox_spark.table import refresh_value_index

        before = int(
            (read_manifest(spark, art).get("index_of") or {}).get(
                "version", -1
            )
        )
        covered = refresh_value_index(spark, base, art)
        return {
            "status": "refreshed" if covered != before else "noop",
            "covered": covered,
        }
    if kind == "bounded_postings":
        covered = _covered_version(spark, ent, params["stats"])
        head = int(read_manifest(spark, base)["version"])
        if head == covered:
            return {"status": "noop", "covered": covered}
        from prox_spark.queries.search import postings_feed
        from prox_spark.wand import maintain_bounded_index

        feed = postings_feed(
            spark, base, covered, head,
            text_col=params.get("text_col", "text"),
            since=int(params.get("since", covered)),
        )
        maintain_bounded_index(
            spark, art, params["stats"], feed, params["tokens_expr"],
            covers={"base": base, "version": head},
        )
        return {"status": "refreshed", "covered": head,
                "params_update": {"covered": head}}
    if kind == "postings":
        # the q201 append-style signed postings index: fold the feed's
        # signed term deltas and APPEND (zero rewrite); when the raw
        # row debt exceeds fold_factor x the folded size, run the q205
        # fold-compaction (materialize the net, carry the replay
        # markers, refresh term stats for pruning)
        from prox_spark.queries.search import (
            _signed_postings,
            compact_postings,
            maintained_postings,
            postings_feed,
        )
        from prox_spark.table import commit_delta

        covered = _covered_version(spark, ent, art)
        head = int(read_manifest(spark, base)["version"])
        if head == covered:
            # noop: skip the debt check too — the raw/folded recount
            # is O(index), and debt only grows when a refresh appends,
            # so checking it on refreshed ticks alone is sufficient
            return {"status": "noop", "covered": covered}
        feed = postings_feed(
            spark, base, covered, head,
            text_col=params.get("text_col", "text"),
            since=int(params.get("since", covered)),
        )
        delta = _signed_postings(feed)
        prev = read_manifest(spark, art)
        # the delta append and the bumped coverage publish in ONE
        # manifest rename: a crash before it replays cleanly, a crash
        # after it replays as a noop — the signed delta can never be
        # appended twice (which would silently double-count tf)
        commit_delta(
            spark, art, delta, list(prev["files"]),
            update_key_ranges={},
            index_of={"base": base, "version": head},
        )
        out = {
            "status": "refreshed", "covered": head,
            "params_update": {"covered": head},
        }
        raw = read_table(spark, art).count()
        folded = maintained_postings(spark, art).count()
        if raw > float(params.get("fold_factor", 2.0)) * max(1, folded):
            compact_postings(spark, art)
            out["compacted"] = True
        return out
    if kind == "nd_pairs":
        # the embedding near-dup pair index (q42's serving table):
        # touched vectors retire, new vectors bucket-join the STANDING
        # LSH state, coverage rides the pair commit (maintain_nd_pairs)
        from prox_spark.queries.similarity import maintain_nd_pairs

        out = maintain_nd_pairs(spark, base, art, params["buckets"])
        if out["status"] == "refreshed":
            out["params_update"] = {"covered": out["covered"]}
        return out
    if kind == "kmv":
        from prox_spark.queries.search import postings_feed
        from prox_spark.table import commit_delta

        col = params["col"]
        keys = list(params.get("keys") or [])
        k = int(params.get("k", KMV_K))
        covered = _covered_version(spark, ent, art)
        head = int(read_manifest(spark, base)["version"])
        if head == covered:
            return {"status": "noop", "covered": covered}
        feed = postings_feed(
            spark, base, covered, head, text_col=col,
            since=int(params.get("since", covered)),
        )
        mode = "fold"
        if feed.filter(F.col("_change_type") == "delete").limit(1).count():
            # KMV cannot retract a deleted value: recompute from the
            # head — still kilobytes of output per group, one
            # hash-project + top-k
            mode = "recompute"
            fresh = _kmv_topk(
                _kmv_u_frame(
                    read_table(spark, base, version=head), col, keys
                ),
                keys, k,
            )
        else:
            stored = read_table(spark, art).select(*keys, "u")
            fresh = _kmv_topk(
                stored.unionByName(_kmv_u_frame(feed, col, keys)),
                keys, k,
            )
        prev = read_manifest(spark, art)
        # sketch replacement + bumped coverage in ONE manifest rename
        commit_delta(
            spark, art, fresh, [],
            stat_cols=[*keys, "u"] if keys else ["u"],
            base_version=int(prev["version"]),
            index_of={"base": base, "version": head},
        )
        return {"status": "refreshed", "covered": head, "mode": mode,
                "params_update": {"covered": head}}
    if kind == "quantile_sketch":
        from prox_spark.queries.search import postings_feed
        from prox_spark.table import commit_delta

        key, val = params["key"], params["val"]
        keys = list(params.get("keys") or [])
        k = int(params.get("k", QSK_K))
        covered = _covered_version(spark, ent, art)
        head = int(read_manifest(spark, base)["version"])
        if head == covered:
            return {"status": "noop", "covered": covered}
        feed = postings_feed(
            spark, base, covered, head, text_col=val,
            since=int(params.get("since", covered)),
        )
        mode = "fold"
        if feed.filter(F.col("_change_type") == "delete").limit(1).count():
            # a hash sample cannot retract a deleted row: recompute
            # from the head — still kilobytes of output per group
            mode = "recompute"
            fresh = _qsk_topk(
                _qsk_u_frame(
                    read_table(spark, base, version=head), key, val, keys
                ),
                keys, k,
            )
        else:
            stored = read_table(spark, art).select(*keys, "u", "v")
            fresh = _qsk_topk(
                stored.unionByName(_qsk_u_frame(feed, key, val, keys)),
                keys, k,
            )
        prev = read_manifest(spark, art)
        # sample replacement + bumped coverage in ONE manifest rename
        commit_delta(
            spark, art, fresh, [],
            stat_cols=[*keys, "u"] if keys else ["u"],
            base_version=int(prev["version"]),
            index_of={"base": base, "version": head},
        )
        return {"status": "refreshed", "covered": head, "mode": mode,
                "params_update": {"covered": head}}
    if kind == "cms":
        from prox_spark.queries.search import postings_feed
        from prox_spark.table import commit_delta

        col = params["col"]
        tokens = bool(params.get("tokens"))
        keys = list(params.get("keys") or [])
        d = int(params.get("d", CMS_SERVE_D))
        w = int(params.get("w", CMS_SERVE_W))
        cand_k = int(params.get("cand_k", CMS_CAND_K))
        covered = _covered_version(spark, ent, art)
        head = int(read_manifest(spark, base)["version"])
        if head == covered:
            return {"status": "noop", "covered": covered}
        feed = postings_feed(
            spark, base, covered, head, text_col=col,
            since=int(params.get("since", covered)),
        )
        mode = "fold"
        if feed.filter(F.col("_change_type") == "delete").limit(1).count():
            # the grid could subtract (CMS is linear), but an EVICTED
            # candidate cannot be restored when rivals shrink:
            # recompute from the head — still ≤ d×w + cand_k rows per
            # group out
            mode = "recompute"
            cnt = _cms_counts(
                _cms_items(
                    read_table(spark, base, version=head), col, tokens,
                    keys,
                ),
                keys,
            ).persist()
            try:
                grid = _cms_grid(cnt, d, w, keys)
                cands = _cms_topc(
                    cnt.select(*keys, "tok"), grid, d, w, cand_k, keys
                )
                fresh = _cms_artifact_frame(grid, cands, keys)
                prev = read_manifest(spark, art)
                commit_delta(
                    spark, art, fresh, [],
                    base_version=int(prev["version"]),
                    index_of={"base": base, "version": head},
                )
            finally:
                cnt.unpersist()
        else:
            stored = read_table(spark, art)
            bcnt = _cms_counts(
                _cms_items(feed, col, tokens, keys), keys
            ).persist()
            try:
                grid = (
                    stored.filter(F.col("d") >= 0)
                    .select(*keys, "d", "bucket", "c")
                    .unionByName(_cms_grid(bcnt, d, w, keys))
                    .groupBy(*keys, "d", "bucket")
                    .agg(F.sum("c").cast("long").alias("c"))
                )
                # the CMS+heap step: re-rank stored candidates ∪ the
                # window's vocabulary by the FOLDED grid's estimates
                pool = (
                    stored.filter(F.col("d") == -2)
                    .select(*keys, "tok")
                    .unionByName(bcnt.select(*keys, "tok"))
                    .distinct()
                )
                cands = _cms_topc(pool, grid, d, w, cand_k, keys)
                fresh = _cms_artifact_frame(grid, cands, keys)
                prev = read_manifest(spark, art)
                # grid + candidates + bumped coverage in ONE rename
                commit_delta(
                    spark, art, fresh, [],
                    base_version=int(prev["version"]),
                    index_of={"base": base, "version": head},
                )
            finally:
                bcnt.unpersist()
        return {"status": "refreshed", "covered": head, "mode": mode,
                "params_update": {"covered": head}}
    if kind == "ivf":
        k = int(params.get("k", 8))
        threshold = float(params.get("imbalance", 3.0))
        head = int(read_manifest(spark, art)["version"])
        # fire at most once per index version: data-inherent imbalance
        # (a genuinely dominant mode) survives any recluster, and
        # re-rebuilding the same bytes forever is the failure mode —
        # only NEW data since the last rebuild re-arms the trigger
        if int(params.get("reclustered_at", -1)) >= head:
            return {"status": "noop", "reason": "no data since rebuild"}
        sizes = [
            int(r["n"])
            for r in read_table(spark, art)
            .groupBy("cid").agg(F.count(F.lit(1)).alias("n")).collect()
        ]
        # max/min cell ratio (max/mean caps at k and hides skew for
        # small quantizers); an emptied cell is infinite imbalance
        imbalance = (
            max(sizes) / min(sizes) if sizes and min(sizes) else float("inf")
        )
        if imbalance <= threshold and len(sizes) >= k:
            return {"status": "noop", "imbalance": round(imbalance, 2)}
        from prox_spark.queries.similarity import recluster_index

        out = recluster_index(spark, art, k=k)
        return {
            "status": "reclustered", "version": out["version"],
            "imbalance": round(imbalance, 2),
            "params_update": {"reclustered_at": int(out["version"])},
        }
    raise ValueError(f"unknown artifact kind {kind!r}")


def vacuum_with_registry(
    spark: SparkSession,
    base_path: str,
    registry_path: str,
    keep_last: int = 2,
    retention_minutes: float = 15.0,
    extra_pins: set | None = None,
    retain_hours: float | None = None,
) -> list[int]:
    """Vacuum a base table while PINNING every registered artifact's
    covered version: an unpinned vacuum that outruns the refresh
    cadence destroys the incremental inputs and forces the artifacts'
    full-recompute fallbacks (correct, but a rebuild at 100 TB). MV
    lineage comes from the view manifests, value-index coverage from
    ``index_of``, postings coverage from the registry rows; because a
    change feed needs EVERY version after the covered one (a feed with
    a vacuumed middle cannot be reconstructed), the pin is the whole
    suffix from the OLDEST covered version to head, not just the
    covered versions themselves. ``extra_pins`` composes externally
    held references in — pass ``txn.txn_pinned_versions(...)`` so a
    frozen training-set txn's bytes survive the same retention pass.
    Returns the removed versions."""
    from prox_spark.table import _manifest_versions, vacuum

    pins: set[int] = set()
    for ent in list_artifacts(spark, registry_path):
        kind, art = ent["kind"], ent["artifact"]
        try:
            if kind == "mv" and ent["base"] == base_path:
                from prox_spark.mv import mv_info

                pins.add(int(mv_info(spark, art)["version"]))
            elif kind == "join_mv":
                from prox_spark.mv import mv_info

                info = mv_info(spark, art)
                for side in ("left", "right"):
                    if info[side]["path"] == base_path:
                        pins.add(int(info[side]["version"]))
            elif kind == "value_index" and ent["base"] == base_path:
                meta = read_manifest(spark, art).get("index_of") or {}
                if "version" in meta:
                    pins.add(int(meta["version"]))
            elif (
                kind in ("bounded_postings", "postings", "kmv", "nd_pairs",
                         "quantile_sketch", "cms")
                and ent["base"] == base_path
            ):
                meta_path = (
                    ent["params"]["stats"]
                    if kind == "bounded_postings" else art
                )
                pins.add(_covered_version(spark, ent, meta_path))
        except Exception:  # noqa: BLE001 — an unreadable artifact
            # cannot contribute a pin; its refresh falls back loudly
            continue
    if pins:
        lo = min(pins)
        pins = {v for v in _manifest_versions(spark, base_path) if v >= lo}
    # external pins (txn-frozen versions) stay EXACT — they pin bytes,
    # not a change-feed suffix, so they don't widen the retained window
    return vacuum(
        spark, base_path, keep_last=keep_last,
        retention_minutes=retention_minutes,
        extra_pins=pins | set(extra_pins or ()),
        retain_hours=retain_hours,
    )


def serve_aggregate(
    spark: SparkSession,
    registry_path: str,
    base_path: str,
    keys: list[str],
    sums: list[str],
    mins: list[str] = (),
    maxs: list[str] = (),
    avgs: list[str] = (),
    quantile: tuple[str, float] | None = None,
    topk: tuple | None = None,
):
    """Registry-integrated auto-rewrite: discover the base's
    registered views and route a count/sum(/min/max/avg) aggregate to
    a covering one (prox_spark.mv rewrite_aggregate — stored view + a
    read-time change-feed fold, rolled up when the view is finer; an
    AVG derives exactly from any covering count+sum view); direct base
    aggregate otherwise. Returns ``(frame, matched_mv_or_None)``.
    A ``quantile=(col, q)`` request routes through a registered
    quantile sketch (:func:`serve_quantile_by`); a ``topk=(col, k)``
    — or ``(col, k, tokens)`` — frequency/heavy-hitter request routes
    through a registered CMS artifact (:func:`serve_topk`);
    approx-distinct requests route separately through
    :func:`serve_distinct` / :func:`serve_distinct_by` (KMV sketch
    artifacts)."""
    from prox_spark.mv import rewrite_aggregate

    if quantile is not None:
        col, q = quantile
        return serve_quantile_by(
            spark, registry_path, base_path, col,
            q if isinstance(q, (list, tuple)) else float(q), keys,
        )
    if topk is not None:
        col, k, *rest = topk
        return serve_topk(
            spark, registry_path, base_path, col, int(k),
            tokens=bool(rest[0]) if rest else False, keys=keys,
        )

    candidates = [
        e["artifact"]
        for e in list_artifacts(spark, registry_path)
        if e["kind"] == "mv" and e["base"] == base_path
    ]
    return rewrite_aggregate(
        spark, base_path, keys, sums, candidates, mins, maxs, avgs
    )


def _kmv_estimate_col(k: int):
    """Per-group estimate column over a ranked sketch aggregate: a
    group holding fewer than k values has seen every distinct value
    (exact count); a full group estimates (k−1)/u₍k₎ — the q209
    formula, md5-deterministic so served answers reproduce anywhere."""
    return F.when(
        F.col("_sk_n") < k, F.col("_sk_n").cast("double")
    ).otherwise(
        F.round(F.lit(float(k - 1)) / F.col("_uk"), 6)
    )


def serve_distinct_by(
    spark: SparkSession,
    registry_path: str,
    base_path: str,
    col: str,
    keys: list[str],
):
    """GROUPED registry-routed approx distinct: serve
    ``count(distinct col) GROUP BY keys`` from a registered grouped
    KMV sketch (built with ``build_kmv_sketch(..., keys=...)``) — the
    stored ≤k-rows-per-group state plus a read-time fold of an
    insert-only uncovered window; a window with deletes falls through
    (KMV cannot retract). Returns ``(frame, sketch_path_or_None)``
    with columns (keys..., est_distinct); the fallback is the exact
    per-group distinct count (as double, same schema)."""
    from prox_spark.queries.search import postings_feed

    keys = list(keys)
    for ent in list_artifacts(spark, registry_path):
        if (
            ent["kind"] != "kmv"
            or ent["base"] != base_path
            or ent["params"].get("col") != col
            or list(ent["params"].get("keys") or []) != keys
        ):
            continue
        art = ent["artifact"]
        k = int(ent["params"].get("k", KMV_K))
        try:
            covered = _covered_version(spark, ent, art)
            head = int(read_manifest(spark, base_path)["version"])
            sk = read_table(spark, art).select(*keys, "u")
            if head > covered:
                feed = postings_feed(
                    spark, base_path, covered, head, text_col=col,
                    since=int(ent["params"].get("since", covered)),
                )
                if feed.filter(
                    F.col("_change_type") == "delete"
                ).limit(1).count():
                    continue  # deletes: the sketch cannot answer
                sk = _kmv_topk(
                    sk.unionByName(_kmv_u_frame(feed, col, keys)),
                    keys, k,
                )
            from pyspark.sql import Window

            w = Window.partitionBy(*keys).orderBy("u")
            ranked = sk.withColumn("_rn", F.row_number().over(w))
            out = (
                ranked.groupBy(*keys)
                .agg(
                    F.count(F.lit(1)).alias("_sk_n"),
                    F.max(
                        F.when(F.col("_rn") == k, F.col("u"))
                    ).alias("_uk"),
                )
                .select(
                    *keys,
                    _kmv_estimate_col(k).alias("est_distinct"),
                )
            )
            return out, art
        except Exception:  # noqa: BLE001 — unreadable sketch: fall back
            continue
    exact = (
        read_table(spark, base_path)
        .groupBy(*keys)
        .agg(
            F.countDistinct(col).cast("double").alias("est_distinct")
        )
    )
    return exact, None


def maintain_artifacts(
    spark: SparkSession,
    registry_path: str,
    raise_on_error: bool = True,
) -> dict[str, dict]:
    """Bring EVERY registered artifact current in one call. Returns
    {artifact_path: {"status": refreshed|noop|reclustered|error,
    ...}}. Per-artifact error isolation: a failing artifact records
    ``error`` with the message and its siblings still maintain; with
    ``raise_on_error`` (default) the call raises AFTER attempting all
    of them, naming the failures — loud, but never a partial stop."""
    from prox_spark.upsert import upsert_parquet

    results: dict[str, dict] = {}
    param_updates: list[tuple[str, dict]] = []
    for ent in list_artifacts(spark, registry_path):
        art = ent["artifact"]
        try:
            out = _maintain_one(spark, ent)
            upd = out.pop("params_update", None)
            if upd:
                param_updates.append((art, {**ent["params"], **upd}))
            results[art] = out
        except Exception as ex:  # noqa: BLE001 — isolation by design
            results[art] = {
                "status": "error",
                "error": f"{type(ex).__name__}: {ex}",
            }
    for art, params in param_updates:
        ent = next(
            e for e in list_artifacts(spark, registry_path)
            if e["artifact"] == art
        )
        row = spark.createDataFrame(
            [(art, ent["kind"], ent["base"], json.dumps(params))], _SCHEMA
        )
        upsert_parquet(spark, registry_path, row, ["artifact"])
    failed = sorted(
        a for a, r in results.items() if r["status"] == "error"
    )
    if failed and raise_on_error:
        raise RuntimeError(
            f"maintenance failed for {failed}: "
            + "; ".join(results[a]["error"] for a in failed)
        )
    return results
