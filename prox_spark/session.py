"""SparkSession factory.

Plays the role of the reference's Glue job bootstrap
(reference: glue_scripts/gold_data_curation_script.py:26-30) but
tuned for open-source Spark:

- AQE on (runtime re-plan, skew-join handling, partition coalescing)
- Arrow on (fast Pandas UDF / toPandas transfer)
- UTC session timezone (deterministic oracle comparison vs DuckDB)
- shuffle partitions sized to the machine, not the 200 default

At cluster scale the same factory applies — only ``master`` and the
memory/shuffle-partition knobs change (pass ``extra_conf``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "prox_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession with scale-aware defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS
    # copy before popping: never mutate the caller's dict (a reused
    # extra_conf would otherwise silently lose extraJavaOptions)
    conf = dict(extra_conf or {})
    extra_java = conf.pop("spark.driver.extraJavaOptions", "")

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst deliberately stays at its default (true):
        # respecting the 64 MB advisory size on kilobyte shuffles
        # coalesces every post-shuffle stage to ONE task, which
        # serializes CPU-dense small-byte work — measured r12: q209
        # 2.21→4.61 s, q144 2.00→3.42 s, q19 1.29→2.35 s with
        # parallelismFirst=false, far exceeding the ~0.14 s/query
        # scheduling saving it buys on shuffle-light aggregates. At
        # cluster scale (post-shuffle bytes >> advisory) the two
        # settings converge, so there is nothing to parameterize.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python UDTFs evaluate row-at-a-time by default; Arrow batching
        # moves them onto the same vectorized transfer path as pandas
        # UDFs (q82's chunker is the in-repo consumer)
        .config("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
        # Right-sized heap + throughput GC: an oversized (48g) G1 heap
        # measured 27s of stop-the-world G1CollectForAllocation pauses
        # over a 2-minute workload (young-gen sized to tens of GB ->
        # rare, multi-second pauses that also stall the Py4J command
        # channel). 8g + ParallelGC gives frequent sub-10ms pauses.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC " + extra_java)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # naive parquet timestamps (pandas-written testdata) -> TIMESTAMP_NTZ,
        # matching DuckDB's naive TIMESTAMP for oracle parity
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    )
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
