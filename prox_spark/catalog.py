"""Thin table registry — the Glue Data Catalog role.

The reference resolves table name -> S3 path + schema via Glue
crawlers + ``create_dynamic_frame.from_catalog``
(reference: glue_scripts/transformations_script.py:147-153,
gold_data_curation_script.py:35-46, main.tf:34-64). Open-source
Spark needs no crawler: parquet is self-describing, so the catalog
reduces to {table name -> path}, with optional registration as temp
views so SQL can address tables by name.

At 100 TB scale the same abstraction holds — paths become
``s3://bucket/layer/table/`` prefixes and Spark's vectorized parquet
reader + partition discovery do the rest. Swap for a real metastore
(``spark.read.table``) without touching call sites.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass
class Catalog:
    """name -> parquet path registry with lazy reads."""

    spark: SparkSession
    paths: dict[str, str] = field(default_factory=dict)

    def register(self, name: str, path: str) -> None:
        self.paths[name] = path

    def register_dir(self, directory: str, tables: tuple[str, ...] = TESTDATA_TABLES) -> None:
        """Register every ``<dir>/<table>.parquet`` that exists."""
        for t in tables:
            p = os.path.join(directory, f"{t}.parquet")
            if os.path.exists(p):
                self.paths[t] = p

    def table(self, name: str) -> DataFrame:
        if name not in self.paths:
            raise KeyError(f"table not registered: {name!r} (have {sorted(self.paths)})")
        return self.spark.read.parquet(self.paths[name])

    def create_views(self) -> None:
        """Expose every registered table as a temp view for spark.sql."""
        for name in self.paths:
            self.table(name).createOrReplaceTempView(name)


def testdata_catalog(spark: SparkSession, sf_dir: str) -> Catalog:
    """Catalog over the driver-generated testdata directory."""
    # events.parquet carries INT64 TIMESTAMP(NANOS) which Spark 4 only
    # reads with the legacy long mapping (queries/events.py normalizes)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    cat = Catalog(spark)
    cat.register_dir(sf_dir)
    return cat
