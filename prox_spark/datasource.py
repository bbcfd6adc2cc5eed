"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API).

The reference's only custom connector surface is Glue's DynamicFrame
wrappers over JDBC/S3 (reference bronze_ingestion_script.py:46-57);
the open-source equivalent for "a source Spark doesn't ship" is this
API: a pure-Python DataSource whose reader declares its own
InputPartitions — Spark schedules one task per partition, so a
100-shard source scans with 100-way parallelism, no driver loop.

``synthdocs`` generates a deterministic synthetic corpus (doc text is
a closed-form function of doc_id via md5), which makes it both a
working example of the API and oracle-checkable: DuckDB reconstructs
every row from generate_series (q140). Rows stream from the reader as
tuples in doc_id order per shard; Arrow RecordBatch output is the
drop-in upgrade when generation cost matters.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class _ShardPartition(InputPartition):
    def __init__(self, shard: int, n_docs: int, n_shards: int):
        self.shard = shard
        self.n_docs = n_docs
        self.n_shards = n_shards


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", "1000"))
        self.n_shards = int(options.get("shards", "8"))

    def partitions(self):
        # one InputPartition per shard -> one Spark task per shard
        return [
            _ShardPartition(s, self.n_docs, self.n_shards)
            for s in range(self.n_shards)
        ]

    def read(self, partition: _ShardPartition) -> Iterator[tuple]:
        # round-robin assignment: shard s owns doc ids ≡ s (mod shards)
        for i in range(partition.shard, partition.n_docs, partition.n_shards):
            digest = hashlib.md5(str(i).encode()).hexdigest()
            yield (i, partition.shard, f"doc-{i}-{digest}")


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return "doc_id bigint, shard int, text string"

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)


def register(spark) -> None:
    """Idempotent registration (latest registration wins in Spark)."""
    spark.dataSource.register(SyntheticDocsDataSource)


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same closed-form corpus: each
    ``read`` serves the next ``batch_size`` doc ids and advances the
    offset; ``readBetweenOffsets`` replays any committed range
    identically (determinism IS the replay contract — a failed batch
    re-reads the same rows, giving exactly-once results downstream).
    Offsets are plain dicts checkpointed by Spark."""

    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", "1000"))
        self.batch_size = int(options.get("batch_size", "250"))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def _rows(self, start: int, end: int):
        return [
            (i, i % 8, f"doc-{i}-{hashlib.md5(str(i).encode()).hexdigest()}")
            for i in range(start, end)
        ]

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.batch_size, self.n_docs)
        # contract: the first element MUST be an *iterator* — once the
        # stream drains (hi == lo) pyspark's prefetch wrapper calls
        # next(it) directly on it (datasource_internal.py
        # add_result_to_cache) and a bare list raises TypeError,
        # terminating the query with a runtime error
        return iter(self._rows(lo, hi)), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["next"], end["next"])


class SyntheticDocsStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthdocs_stream"

    def schema(self) -> str:
        return "doc_id bigint, shard int, text string"

    def simpleStreamReader(self, schema) -> SyntheticDocsStreamReader:
        return SyntheticDocsStreamReader(self.options)


def register_stream(spark) -> None:
    spark.dataSource.register(SyntheticDocsStreamDataSource)
