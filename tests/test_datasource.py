"""Custom Python DataSource (prox_spark/datasource.py): partition
planning must drive Spark's task parallelism, and the generated rows
must match the closed-form model exactly."""

from __future__ import annotations

import hashlib


def _read(spark, n_docs, shards):
    from prox_spark.datasource import register

    register(spark)
    return (
        spark.read.format("synthdocs")
        .option("n_docs", str(n_docs))
        .option("shards", str(shards))
        .load()
    )


def test_one_spark_partition_per_declared_shard(spark):
    df = _read(spark, 100, 5)
    assert df.rdd.getNumPartitions() == 5


def test_rows_match_closed_form(spark):
    got = sorted((r.doc_id, r.shard, r.text) for r in _read(spark, 40, 4).collect())
    want = sorted(
        (i, i % 4, f"doc-{i}-{hashlib.md5(str(i).encode()).hexdigest()}")
        for i in range(40)
    )
    assert got == want
