"""File-format round-trip queries: put the non-parquet sources
(JSONL, ORC — reference S9's CSV path is already hash-gated via the
kpi fixture store) into the correctness gate, not just pytest.

Each query STAGES a deterministic copy of the documents table in the
target format (pyarrow, Spark-free, idempotent temp-file + os.replace
— the fixture_store recipe), reads it back through the engine's real
reader (prox_spark/io.py), and aggregates. The DuckDB oracle
recomputes the same aggregate from the clean parquet table: since the
staged bytes derive from that table, a hash match proves the encode →
decode round-trip preserved every value, which is exactly what a
format connector must guarantee.
"""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession, functions as F

_FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".fixtures",
)


def _sf_tag(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def _stage_jsonl(sf_dir: str) -> str:
    """documents as newline-delimited JSON, deterministic key order."""
    out_dir = os.path.join(_FIXTURES, f"jsonl_docs_{_sf_tag(sf_dir)}")
    out = os.path.join(out_dir, "docs.jsonl")
    if not os.path.exists(out):
        os.makedirs(out_dir, exist_ok=True)
        t = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
        )
        tmp = out + ".tmp"
        with open(tmp, "w") as f:
            for row in t.to_pylist():
                f.write(json.dumps(row, sort_keys=True) + "\n")
        os.replace(tmp, out)
    return out_dir


def _stage_orc(sf_dir: str) -> str:
    out_dir = os.path.join(_FIXTURES, f"orc_docs_{_sf_tag(sf_dir)}")
    out = os.path.join(out_dir, "docs.orc")
    if not os.path.exists(out):
        from pyarrow import orc

        os.makedirs(out_dir, exist_ok=True)
        t = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
        )
        tmp = out + ".tmp"
        orc.write_table(t, tmp)
        os.replace(tmp, out)
    return out_dir


def q138_jsonl_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL source in the hash gate: schema-declared read (S-format
    rule: never inferSchema in prod — a misdeclared type or a lossy
    serialize shows up as a value/hash mismatch)."""
    from prox_spark.io import read_jsonl
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_chars", LongType()),
            StructField("source", StringType()),
        ]
    )
    docs = read_jsonl(spark, _stage_jsonl(sf_dir), schema)
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("source")
    )


ORACLE_Q138 = """
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       max(doc_id) AS max_doc
FROM documents
GROUP BY source
ORDER BY source
"""


def q139_orc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source in the hash gate: columnar alternative with its own
    pushdown/stats path; min/max/avg-shaped aggregate distinguishes it
    from q138's sums."""
    from prox_spark.io import read_orc

    docs = read_orc(spark, _stage_orc(sf_dir))
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("source")
    )


ORACLE_Q139 = """
SELECT source,
       count(*) AS n_docs,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars
FROM documents
GROUP BY source
ORDER BY source
"""


QUERIES = {
    "q138_jsonl_scan": q138_jsonl_scan,
    "q139_orc_scan": q139_orc_scan,
}

ORACLES = {
    "q138_jsonl_scan": ORACLE_Q138,
    "q139_orc_scan": ORACLE_Q139,
}
