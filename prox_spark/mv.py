"""Materialized views with CHANGE-FEED incremental refresh — the
operational wrapper around the IVM algebra the query surface proves
(q118 sum/count, q184 min/max-under-deletes, q190 join views, q199
data card): a registered sum/count-by-key view refreshes with work ∝
the base table's delta, never a base re-scan.

The reference has no MV surface (its Redshift layer full-refreshes,
reference glue_scripts/s3_to_redshift_script.py preactions); the
open-source parity target is Databricks/Delta materialized views,
restricted here to the SELF-MAINTAINABLE aggregate class (count,
sum of fixed-point/integer columns): every change-feed row folds as
insert = +value / delete = −value, an update's delete+insert pair
nets itself, and exactness needs no group history. Min/max-style
aggregates need the q184 touched-group recompute instead — out of
scope for this registry (use the query-level pattern).

Refresh mechanics: the view's manifest records ``mv_of`` = {path,
version, keys, sums} — the base version the contents cover. Refresh
reads ``read_table_changes(base, covered, head)``, folds the signed
delta per key, and merges it into the view through the table format's
own keyed primitives (merge-on-read delete for groups netting to
zero, file-pruned upsert for changed groups) — so refresh cost is
∝ |touched keys|, and the view stays a normal manifest table
(time travel, vacuum, cloning all apply)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prox_spark.table import (
    _commit_meta_change,
    commit_snapshot,
    read_manifest,
    read_table,
)

COUNT_COL = "n_rows"


def _agg(df: DataFrame, keys: list[str], sums: list[str]) -> DataFrame:
    aggs = [F.count(F.lit(1)).cast("long").alias(COUNT_COL)] + [
        F.sum(c).alias(f"sum_{c}") for c in sums
    ]
    return df.groupBy(*keys).agg(*aggs)


def create_mv(
    spark: SparkSession,
    base_path: str,
    mv_path: str,
    keys: list[str],
    sums: list[str],
) -> int:
    """Materialize count + per-column sums grouped by ``keys`` over
    the base table's current version and register the lineage in the
    view's manifest. Returns the view's version."""
    base_v = int(read_manifest(spark, base_path)["version"])
    commit_snapshot(
        spark, mv_path, _agg(read_table(spark, base_path), keys, sums),
        stat_cols=list(keys), n_files=4,
    )

    def mutate(doc: dict, v: int) -> dict:
        doc["mv_of"] = {
            "path": base_path, "version": base_v,
            "keys": list(keys), "sums": list(sums),
        }
        doc.pop("data_change", None)
        return doc

    return _commit_meta_change(spark, mv_path, mutate)


def mv_info(spark: SparkSession, mv_path: str) -> dict:
    info = read_manifest(spark, mv_path).get("mv_of")
    if not info:
        raise ValueError(f"{mv_path} is not a registered materialized view")
    return info


def _merge_delta(
    spark: SparkSession, mv_path: str, keys: list[str], sums: list[str],
    delta: DataFrame,
) -> int:
    """Merge a signed per-key delta frame (``_dn`` + ``_ds_<col>``
    columns) into the view through the format's keyed primitives.
    Returns the number of touched groups."""
    from prox_spark.upsert import delete_keys_mor, upsert_parquet

    cur = read_table(spark, mv_path)
    merged = (
        cur.join(delta, keys, "full_outer")
        .select(
            *keys,
            (
                F.coalesce(F.col(COUNT_COL), F.lit(0))
                + F.coalesce(F.col("_dn"), F.lit(0))
            ).cast("long").alias(COUNT_COL),
            *[
                (
                    F.coalesce(F.col(f"sum_{c}"), F.lit(0))
                    + F.coalesce(F.col(f"_ds_{c}"), F.lit(0))
                ).alias(f"sum_{c}")
                for c in sums
            ],
            F.col("_dn").isNotNull().alias("_touched"),
        )
        .filter(F.col("_touched"))
    ).persist()
    try:
        gone = merged.filter(F.col(COUNT_COL) <= 0).select(*keys)
        changed = merged.filter(F.col(COUNT_COL) > 0).drop("_touched")
        touched = merged.count()
        n_gone = gone.count()
        if n_gone:
            delete_keys_mor(spark, mv_path, gone, keys)
        if touched - n_gone:
            upsert_parquet(spark, mv_path, changed, keys)
        return touched
    finally:
        merged.unpersist()


def refresh_mv(spark: SparkSession, mv_path: str) -> dict:
    """Fold the base table's changes since the covered version into
    the view. Returns {"refreshed", "covered", "touched_groups"}.
    Work ∝ |delta| + |touched groups|: the feed opens only the
    commits' files, group merges go through the format's file-pruned
    keyed upsert, and groups whose count nets to zero are removed by
    a merge-on-read key delete (no rewrite)."""
    from prox_spark.cdf import read_table_changes

    info = mv_info(spark, mv_path)
    base, covered = info["path"], int(info["version"])
    keys, sums = list(info["keys"]), list(info["sums"])
    head = int(read_manifest(spark, base)["version"])
    if head == covered:
        return {"refreshed": False, "covered": covered, "touched_groups": 0}

    mode = "incremental"
    try:
        feed = read_table_changes(spark, base, covered, head)
        sgn = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        delta = feed.groupBy(*keys).agg(
            F.sum(sgn).cast("long").alias("_dn"),
            *[F.sum(sgn * F.col(c)).alias(f"_ds_{c}") for c in sums],
        )
        touched = _merge_delta(spark, mv_path, keys, sums, delta)
    except Exception as ex:
        if not _is_unreadable_version(ex):
            raise
        # the covered version was vacuumed past the refresh cadence:
        # the incremental inputs are gone, fall back to a FULL
        # recompute (one rewrite commit — also heals a refresh that
        # died between its delete and upsert commits)
        mode = "full"
        touched = _replace_contents(
            spark, mv_path, _agg(read_table(spark, base), keys, sums), keys
        )

    def mutate(doc: dict, v: int) -> dict:
        doc["mv_of"] = {**info, "version": head}
        doc.pop("data_change", None)
        return doc

    _commit_meta_change(spark, mv_path, mutate)
    return {
        "refreshed": True, "covered": head, "touched_groups": touched,
        "mode": mode,
    }


def _is_unreadable_version(ex: Exception) -> bool:
    from prox_spark.table import _is_missing_file_error

    return isinstance(ex, ValueError) or _is_missing_file_error(ex)


def _replace_contents(
    spark: SparkSession, mv_path: str, contents: DataFrame, keys: list[str]
) -> int:
    from prox_spark.table import commit_delta

    prev = read_manifest(spark, mv_path)
    commit_delta(
        spark, mv_path, contents, [], stat_cols=list(keys), n_files=4,
        base_version=int(prev["version"]),
    )
    return -1  # full recompute: touched-group accounting does not apply


def mv_stream_batch(batch_df: DataFrame, batch_id: int,
                    mv_path: str) -> None:
    """CONTINUOUS maintenance: foreachBatch sink for a readChangeFeed
    stream over the base table — fold the micro-batch's signed rows
    into the view directly (work ∝ batch, no change-feed re-read).
    Idempotence comes from the LINEAGE, not marker rows: the fold
    first drops rows at or below the view's covered version (a
    replayed or overlapping batch contributes only its uncovered
    slice), and a batch advancing nothing publishes nothing."""
    sp = batch_df.sparkSession
    info = mv_info(sp, mv_path)
    covered = int(info["version"])
    keys, sums = list(info["keys"]), list(info["sums"])
    fresh = batch_df.filter(F.col("_commit_version") > covered)
    end_row = fresh.agg(F.max("_commit_version")).first()
    end = end_row[0]
    if end is None:
        return  # nothing beyond the covered version: replay no-op
    sgn = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    delta = fresh.groupBy(*keys).agg(
        F.sum(sgn).cast("long").alias("_dn"),
        *[F.sum(sgn * F.col(c)).alias(f"_ds_{c}") for c in sums],
    )
    _merge_delta(sp, mv_path, keys, sums, delta)

    def mutate(doc: dict, v: int) -> dict:
        doc["mv_of"] = {**info, "version": int(end)}
        doc.pop("data_change", None)
        return doc

    _commit_meta_change(sp, mv_path, mutate)


# --- JOIN materialized views: the two-sided delta algebra as an API --------
#
#   V₂ = agg(A₂ ⋈ B₂)
#   Δ(A ⋈ B) = ΔA ⋈ B₁  +  A₁ ⋈ ΔB  +  ΔA ⋈ ΔB     (signed multiplicities)
#
# — q190's query-level proof, registered: A₁/B₁ are TIME-TRAVEL reads
# of the covered versions (never the new heads), ΔA/ΔB the signed
# change feeds, and every term joins a DELTA against a base, so the
# full V₂ join is never rebuilt. Covered versions must still be
# readable: keep the bases' vacuum retention above the refresh cadence.


def create_join_mv(
    spark: SparkSession,
    left_path: str,
    right_path: str,
    mv_path: str,
    on: list[str],
    keys: list[str],
    sums: list[str],
) -> int:
    """Materialize count + sums grouped by ``keys`` over the inner
    equi-join of two base tables and register the two-sided lineage.
    ``keys``/``sums`` must name unambiguous columns of the joined
    frame. Returns the view's version."""
    lv = int(read_manifest(spark, left_path)["version"])
    rv = int(read_manifest(spark, right_path)["version"])
    joined = read_table(spark, left_path).join(
        read_table(spark, right_path), on
    )
    commit_snapshot(
        spark, mv_path, _agg(joined, keys, sums),
        stat_cols=list(keys), n_files=4,
    )

    def mutate(doc: dict, v: int) -> dict:
        doc["mv_of"] = {
            "left": {"path": left_path, "version": lv},
            "right": {"path": right_path, "version": rv},
            "on": list(on), "keys": list(keys), "sums": list(sums),
        }
        doc.pop("data_change", None)
        return doc

    return _commit_meta_change(spark, mv_path, mutate)


def refresh_join_mv(spark: SparkSession, mv_path: str) -> dict:
    """Fold BOTH base tables' changes since their covered versions
    into the join view with the three-term delta algebra. Work ∝
    |ΔA| + |ΔB| + the touched groups' merge; A₁/B₁ appear only as the
    non-delta side of delta-joins (shuffle width ∝ delta)."""
    from prox_spark.cdf import read_table_changes

    info = mv_info(spark, mv_path)
    if "left" not in info:
        raise ValueError(f"{mv_path} is a single-table view; use refresh_mv")
    on = list(info["on"])
    keys, sums = list(info["keys"]), list(info["sums"])
    lp, lv = info["left"]["path"], int(info["left"]["version"])
    rp, rv = info["right"]["path"], int(info["right"]["version"])
    lh = int(read_manifest(spark, lp)["version"])
    rh = int(read_manifest(spark, rp)["version"])
    if lh == lv and rh == rv:
        return {"refreshed": False, "covered": (lv, rv), "touched_groups": 0}

    sgn = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )

    def signed(path: str, v0: int, v1: int) -> DataFrame | None:
        if v1 == v0:
            return None
        return (
            read_table_changes(spark, path, v0, v1)
            .withColumn("_s", sgn)
            .drop("_change_type", "_commit_version")
        )

    mode = "incremental"
    try:
        da, db = signed(lp, lv, lh), signed(rp, rv, rh)
        a1 = read_table(spark, lp, version=lv).withColumn("_s", F.lit(1))
        b1 = read_table(spark, rp, version=rv).withColumn("_s", F.lit(1))

        def term(left: DataFrame, right: DataFrame) -> DataFrame:
            lr = left.withColumnRenamed("_s", "_sl")
            rr = right.withColumnRenamed("_s", "_sr")
            return lr.join(rr, on).withColumn(
                "_s", F.col("_sl") * F.col("_sr")
            )

        terms = []
        if da is not None:
            terms.append(term(da, b1))
        if db is not None:
            terms.append(term(a1, db))
        if da is not None and db is not None:
            terms.append(term(da, db))
        from functools import reduce

        cols = [*keys, *sums, "_s"]
        pairs = reduce(
            lambda x, y: x.unionByName(y), [t.select(*cols) for t in terms]
        )
        delta = pairs.groupBy(*keys).agg(
            F.sum("_s").cast("long").alias("_dn"),
            *[F.sum(F.col("_s") * F.col(c)).alias(f"_ds_{c}") for c in sums],
        )
        touched = _merge_delta(spark, mv_path, keys, sums, delta)
    except Exception as ex:
        if not _is_unreadable_version(ex):
            raise
        # a covered base version was vacuumed: full recompute fallback
        mode = "full"
        joined = read_table(spark, lp).join(read_table(spark, rp), on)
        touched = _replace_contents(
            spark, mv_path, _agg(joined, keys, sums), keys
        )

    def mutate(doc: dict, v: int) -> dict:
        doc["mv_of"] = {
            **info,
            "left": {"path": lp, "version": lh},
            "right": {"path": rp, "version": rh},
        }
        doc.pop("data_change", None)
        return doc

    _commit_meta_change(spark, mv_path, mutate)
    return {
        "refreshed": True, "covered": (lh, rh), "touched_groups": touched,
        "mode": mode,
    }
