"""salted_join: identical results to the plain equi-join (that is the
whole contract) plus salt plumbing visible in the plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prox_spark.joins import salted_join


def _frames(spark):
    # one pathological hot key (k=1) and some cold ones
    fact = spark.createDataFrame(
        [(i, 1 if i % 3 else i % 7, float(i)) for i in range(1, 101)],
        "row_id long, k long, v double",
    )
    dim = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(0, 7)], "k long, label string"
    )
    return fact, dim


def test_salted_inner_matches_plain(spark):
    fact, dim = _frames(spark)
    plain = fact.join(dim, "k").select("row_id", "k", "v", "label")
    salted = salted_join(fact, dim, "k", salt_buckets=5).select("row_id", "k", "v", "label")
    assert sorted(salted.collect()) == sorted(plain.collect())


def test_salted_left_keeps_unmatched_fact_rows(spark):
    fact, dim = _frames(spark)
    dim_missing = dim.filter(F.col("k") != 1)  # drop the hot key's dim row
    plain = fact.join(dim_missing, "k", "left").select("row_id", "k", "v", "label")
    salted = salted_join(fact, dim_missing, "k", salt_buckets=5, how="left").select(
        "row_id", "k", "v", "label"
    )
    assert sorted(salted.collect(), key=str) == sorted(plain.collect(), key=str)


def test_salted_rejects_outer_shapes(spark):
    fact, dim = _frames(spark)
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(fact, dim, "k", how="full")


def test_salt_in_join_keys(spark):
    import contextlib
    import io

    fact, dim = _frames(spark)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        salted_join(fact, dim, "k", salt_buckets=5).explain("formatted")
    plan = buf.getvalue()
    assert "__salt" in plan   # join condition carries the salt
    assert "Generate" in plan  # dim replication via explode


def _skewed(spark, n_parts=6):
    # key 0 is hot (600 rows), keys 1..30 carry 20 each, tail unique
    rows = [(0,)] * 600 + [(k,) for k in range(1, 31) for _ in range(20)]
    rows += [(1000 + i,) for i in range(200)]
    return spark.createDataFrame(rows, "k BIGINT").repartition(n_parts)


def test_heavy_hitters_bit_equal_to_naive(spark):
    from prox_spark.joins import heavy_hitters

    df = _skewed(spark)
    for thr in (600, 20, 21, 5):
        got = sorted(heavy_hitters(df, "k", thr).collect(), key=str)
        want = sorted(
            df.groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= thr)
            .collect(),
            key=str,
        )
        assert got == want, thr


def test_heavy_hitters_bounded_summary_still_exact(spark):
    """Force the Misra-Gries overflow path (summary_cap far below the
    distinct-key count) and check the result is STILL bit-equal to the
    naive groupBy + HAVING: the bounded summary may only widen the
    candidate set, never lose a heavy key."""
    from prox_spark.joins import heavy_hitters

    # 3000 distinct tail keys + 4 heavy keys, shuffled deterministically
    rows = [(i % 3000 + 100,) for i in range(6000)]
    rows += [(h,) for h in (1, 2, 3, 4) for _ in range(80)]
    rows.sort(key=lambda r: (r[0] * 2654435761) % (1 << 32))
    df = spark.createDataFrame(rows, "k BIGINT").repartition(4)
    for thr, cap in ((80, 64), (80, 16), (3, 64)):
        got = sorted(
            heavy_hitters(df, "k", thr, summary_cap=cap).collect(), key=str
        )
        want = sorted(
            df.groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= thr)
            .collect(),
            key=str,
        )
        assert got == want, (thr, cap)


def test_heavy_hitters_threshold_above_max_is_empty(spark):
    from prox_spark.joins import heavy_hitters

    assert heavy_hitters(_skewed(spark), "k", 601).count() == 0


def test_auto_skew_join_bit_equal_to_plain(spark):
    from prox_spark.joins import auto_skew_join

    fact = _skewed(spark).withColumn("v", F.col("k") * 2)
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(0, 1200, 3)], "k BIGINT, name STRING"
    )
    for how in ("inner", "left"):
        got = sorted(
            auto_skew_join(fact, dim, "k", hot_threshold=20, how=how).collect(),
            key=str,
        )
        want = sorted(fact.join(dim, "k", how).collect(), key=str)
        assert got == want, how


def test_auto_skew_join_keeps_null_keys_on_left(spark):
    from prox_spark.joins import auto_skew_join

    fact = spark.createDataFrame([(None,), (0,), (0,), (0,), (7,)], "k BIGINT")
    dim = spark.createDataFrame([(0, "hot"), (7, "cold")], "k BIGINT, name STRING")
    got = sorted(
        auto_skew_join(fact, dim, "k", hot_threshold=3, how="left").collect(), key=str
    )
    want = sorted(fact.join(dim, "k", "left").collect(), key=str)
    assert got == want


def test_auto_skew_join_no_hot_keys_is_plain_join(spark):
    from prox_spark.joins import auto_skew_join

    fact = spark.createDataFrame([(i,) for i in range(50)], "k BIGINT")
    dim = spark.createDataFrame([(i, i * 10) for i in range(50)], "k BIGINT, v BIGINT")
    got = auto_skew_join(fact, dim, "k", hot_threshold=2)
    assert sorted(got.collect(), key=str) == sorted(
        fact.join(dim, "k").collect(), key=str
    )


def _intervals(spark, name, spans):
    rows = [(i, s, e) for i, (s, e) in enumerate(spans)]
    return spark.createDataFrame(rows, f"{name}_id BIGINT, {name}_s BIGINT, {name}_e BIGINT")


def test_interval_overlap_join_bit_equal_to_naive(spark):
    """The bin join must reproduce the exact half-open overlap
    semantics of the naive theta-join: touching endpoints excluded,
    pairs spanning many shared bins emitted exactly once."""
    from prox_spark.joins import interval_overlap_join

    a = _intervals(
        spark,
        "a",
        [(0, 10), (10, 20), (5, 105), (200, 201), (90, 100), (300, 450)],
    )
    b = _intervals(
        spark,
        "b",
        [(9, 11), (20, 30), (0, 1000), (100, 200), (201, 202), (95, 96)],
    )
    for w in (1, 7, 10, 64, 1000):
        got = sorted(
            (r.a_id, r.b_id)
            for r in interval_overlap_join(
                a, b, "a_s", "a_e", "b_s", "b_e", bin_width=w
            ).collect()
        )
        want = sorted(
            (r.a_id, r.b_id)
            for r in a.join(
                b, (F.col("a_s") < F.col("b_e")) & (F.col("b_s") < F.col("a_e"))
            ).collect()
        )
        assert got == want, w
        assert len(got) == len(set(got)), f"duplicate pairs at width {w}"


def test_interval_overlap_join_no_nested_loop_plan(spark):
    import contextlib
    import io

    from prox_spark.joins import interval_overlap_join

    a = _intervals(spark, "a", [(0, 10)])
    b = _intervals(spark, "b", [(5, 15)])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        interval_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e", bin_width=8).explain(
            "formatted"
        )
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_overlap_join_rejects_bad_args(spark):
    from prox_spark.joins import interval_overlap_join

    a = _intervals(spark, "a", [(0, 10)])
    b = _intervals(spark, "b", [(5, 15)])
    with pytest.raises(ValueError, match="inner only"):
        interval_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e", bin_width=8, how="left")
    with pytest.raises(ValueError, match="positive"):
        interval_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e", bin_width=0)
    with pytest.raises(ValueError, match="overlapping column names"):
        interval_overlap_join(a, a, "a_s", "a_e", "a_s", "a_e", bin_width=8)


def test_interval_overlap_join_rejects_reserved_bin_column(spark):
    import pytest

    from prox_spark.joins import BIN_COL, interval_overlap_join

    a = spark.createDataFrame([(0, 5, 1)], f"s BIGINT, e BIGINT, {BIN_COL} BIGINT")
    b = spark.createDataFrame([(2, 7)], "s2 BIGINT, e2 BIGINT")
    with pytest.raises(ValueError, match="reserved"):
        interval_overlap_join(a, b, "s", "e", "s2", "e2", bin_width=4)


def test_interval_overlap_join_degenerate_intervals(spark):
    """Degenerate intervals (end <= start) must bin exactly once —
    never a boundary double-bin or a descending sequence() explosion —
    and must pair per the documented point-like predicate, matching
    the naive theta-join bit-for-bit."""
    from prox_spark.joins import BIN_COL, interval_overlap_join

    a = _intervals(
        spark,
        "a",
        [
            (8, 8),  # empty, start ON the bin boundary (w=8)
            (5, 5),  # empty, off-boundary
            (20, 10),  # inverted: bad upstream data
            (0, 6),  # normal, overlaps the empty-at-5 window
        ],
    )
    b = _intervals(spark, "b", [(0, 16), (4, 6), (15, 25), (8, 8)])
    for w in (1, 8, 64):
        got = sorted(
            (r.a_id, r.b_id)
            for r in interval_overlap_join(
                a, b, "a_s", "a_e", "b_s", "b_e", bin_width=w
            ).collect()
        )
        want = sorted(
            (r.a_id, r.b_id)
            for r in a.join(
                b, (F.col("a_s") < F.col("b_e")) & (F.col("b_s") < F.col("a_e"))
            ).collect()
        )
        assert got == want, w
        assert len(got) == len(set(got)), f"duplicate pairs at width {w}"
    # the clamp keeps the bin fan-out at exactly 1 row per degenerate
    # interval: the inverted (20, 10) span must NOT explode into a
    # descending 10-bin list at w=1
    binned = a.withColumn(
        BIN_COL, F.expr("explode(sequence(a_s div 1, greatest(a_s, a_e - 1) div 1))")
    )
    fanout = {r.a_id: r.n for r in binned.groupBy("a_id").count().withColumnRenamed("count", "n").collect()}
    assert fanout[0] == 1 and fanout[1] == 1 and fanout[2] == 1 and fanout[3] == 6
