"""S1/S8 runtime coverage: JDBC sink with pre-DDL and partitioned JDBC
source, against the Derby embedded database that ships in Spark's
classpath (no external service; same code path as the reference's
PostgreSQL extract / Redshift load, reference
bronze_ingestion_script.py:46-57, s3_to_redshift_script.py:145-162)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prox_spark.io import read_jdbc, write_jdbc

URL = "jdbc:derby:memory:proxtest;create=true"


def test_jdbc_write_with_pre_ddl_then_partitioned_read(spark):
    df = spark.range(100).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"),
    )
    write_jdbc(
        df,
        URL,
        "app.items",
        user="app",
        password="",
        pre_ddl="CREATE TABLE app.items (id INT, name VARCHAR(32))",
        mode="append",
    )
    # single-partition read (the reference's shape)
    back = read_jdbc(spark, URL, "app.items", user="app", password="")
    assert back.count() == 100
    # partitioned parallel read (our scale fix: 4 range tasks)
    back4 = read_jdbc(
        spark, URL, "app.items", user="app", password="",
        partition_column="id", lower_bound=0, upper_bound=100, num_partitions=4,
    )
    assert back4.rdd.getNumPartitions() == 4
    assert back4.count() == 100
    assert back4.filter(F.col("name") == "name-42").count() == 1
