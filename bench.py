"""Benchmark harness — runs the declared query set and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all cores).

Each query is executed via a count-style action that forces full
computation of the result (collect on the final, already-small
output), after a warm-up that triggers JVM/codegen init.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as e
    from prox_spark.session import get_spark

    spark = get_spark("prox-bench")
    qs = e.queries()

    # warm-up: JVM, codegen, parquet footer caches
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    # ... and the Python worker pool: spawning workers while the JVM is
    # small is cheap; spawning them mid-suite after heap-heavy queries
    # costs 10x on virtualized kernels (see queries/text.py _spread_py)
    from pyspark.sql import functions as F

    from prox_spark.queries._udfs import sentiment_counts_udf

    n_py = int(os.environ.get("SPARK_GRAFT_PY_PARTITIONS", "8"))
    warm = sentiment_counts_udf(("x",), ("y",))
    spark.range(0, n_py, 1, n_py).select(warm(F.lit("a b"))).collect()

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.monotonic()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.monotonic() - t0, 3)
        # queries are self-contained: drop any cache a query pinned so
        # storage pressure never accumulates across the suite, and drop
        # Python-side plan refs so the ContextCleaner (weak-ref based)
        # can reclaim shuffle files between queries
        spark.catalog.clearCache()
        import gc

        gc.collect()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_set_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
