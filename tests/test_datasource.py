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


def test_stream_source_drains_without_terminal_error(spark):
    """SimpleDataSourceStreamReader.read must return an ITERATOR: once
    the corpus drains (end offset == start offset) pyspark's prefetch
    wrapper calls next(it) directly on the returned value
    (datasource_internal.py add_result_to_cache), so a bare list kills
    the query with a TypeError. Run the stream well past the drain
    point and assert zero terminal exceptions."""
    import time

    from pyspark.sql import functions as F

    from prox_spark.datasource import register_stream

    register_stream(spark)
    stream = (
        spark.readStream.format("synthdocs_stream")
        .option("n_docs", "120")
        .option("batch_size", "50")
        .load()
    )
    q = (
        stream.groupBy().agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName("ds_drain_check")
        .outputMode("complete")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            assert q.exception() is None, str(q.exception())
            rows = spark.table("ds_drain_check").collect()
            if rows and rows[0].n == 120:
                break
            time.sleep(0.1)
        else:
            raise TimeoutError("stream did not drain in 60s")
        # keep the trigger loop running PAST the drain: every further
        # latestOffset() hits the end==start path that used to crash
        time.sleep(1.5)
        assert q.exception() is None, str(q.exception())
    finally:
        q.stop()
    assert q.exception() is None, str(q.exception())
