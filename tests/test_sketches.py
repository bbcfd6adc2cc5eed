from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_approx_distinct_within_rsd(spark):
    """q19's HLL++ estimate must sit within the declared band of the
    exact distinct count — the query computes the band check itself
    (approx_ok, hash-gated by the oracle); here we re-verify the exact
    twin against an independent computation and that every band holds."""
    from prox_spark.queries.relational import q19_approx_distinct_custkeys

    rows = q19_approx_distinct_custkeys(spark, SF_DIR).collect()
    assert all(r.approx_ok for r in rows), [r.n_name for r in rows if not r.approx_ok]
    got_exact = {r.n_name: r.exact_custkeys for r in rows}
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    nat = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    exact = {
        r.n_name: r.exact
        for r in (
            orders.join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
            .groupBy("n_name")
            .agg(F.countDistinct("o_custkey").alias("exact"))
        ).collect()
    }
    assert got_exact == exact


def test_pca_headroom_guard():
    """q195's exact-BIGINT claim is proven per corpus from the measured
    stats: inside the bound the guard is silent; past it the error is
    loud and names the down-quantization knob."""
    import pytest

    from prox_spark.queries.similarity import _assert_pca_headroom

    def rows(n, d, g, sv):
        out = [(-1, 0, n)] + [(-2, j, sv) for j in range(d)]
        out += [(j1, j2, g) for j1 in range(d) for j2 in range(d)]
        return out

    # sf1-ish magnitudes: n=2e5, d=64, per-entry |G| ~ n*12^2, |s| ~ n*12
    n = 200_000
    _assert_pca_headroom(n, rows(n, 64, n * 144, n * 12))
    # a corpus too big for the current quantization must refuse loudly
    big = 10**9
    with pytest.raises(OverflowError, match="PCA_SCALE_E"):
        _assert_pca_headroom(big, rows(big, 64, big * 144, 0))


def test_kmv_sketch_merges_exactly_and_estimates_sanely(spark):
    """KMV merge property: the k smallest of the union of per-source
    sketches ARE the corpus's k smallest (pinned by the query's
    mergeable flag); estimates are positive and within the coarse
    k=16 error band of the exact per-source distinct counts."""
    from prox_spark.queries.text import KMV_K, q209_kmv_distinct

    rows = q209_kmv_distinct(spark, "/root/testdata/sf0.001").collect()
    assert rows
    assert all(r["mergeable"] for r in rows)
    for r in rows:
        assert r["n_exact"] >= KMV_K  # estimator path exercised
        assert r["est"] > 0
        # ~1/sqrt(k-1) relative error; allow a generous 3-sigma band
        assert abs(r["est"] - r["n_exact"]) / r["n_exact"] < 1.0, r
