from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_approx_distinct_within_rsd(spark):
    """q19's HLL++ estimate must sit within a loose band of the exact
    distinct count (rsd=0.02 → allow 10% for small groups)."""
    from prox_spark.queries.relational import q19_approx_distinct_custkeys

    approx = {
        r.n_name: r.approx_custkeys
        for r in q19_approx_distinct_custkeys(spark, SF_DIR).collect()
    }
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
    assert set(approx) == set(exact)
    for name, est in approx.items():
        assert abs(est - exact[name]) <= max(2, 0.1 * exact[name]), name
