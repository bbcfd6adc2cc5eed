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


N_SYNTH_DOCS = 5_000
N_SYNTH_SHARDS = 8


def q140_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (Spark 4 API) in the hash gate: the
    ``synthdocs`` source (prox_spark/datasource.py) declares one
    InputPartition per shard — Spark schedules one task each, scan
    parallelism owned by the source itself. Every generated row is a
    closed-form function of doc_id, so the oracle reconstructs the
    whole corpus from generate_series: a hash match proves partition
    planning, the per-task generators, and the row decode end-to-end.
    (sf_dir is unused — the source IS the data.)"""
    from prox_spark.datasource import register

    register(spark)
    docs = (
        spark.read.format("synthdocs")
        .option("n_docs", str(N_SYNTH_DOCS))
        .option("shards", str(N_SYNTH_SHARDS))
        .load()
    )
    return (
        docs.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("sum_len"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("shard")
    )


ORACLE_Q140 = f"""
SELECT CAST(i % {N_SYNTH_SHARDS} AS INTEGER) AS shard,
       count(*) AS n_docs,
       CAST(sum(length('doc-' || i || '-' || md5(i::VARCHAR))) AS BIGINT) AS sum_len,
       min(i) AS min_doc,
       max(i) AS max_doc
FROM generate_series(0, {N_SYNTH_DOCS - 1}) t(i)
GROUP BY 1
ORDER BY 1
"""


def q141_python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING half of the Spark 4 Python connector API, run as
    a real stream: ``synthdocs_stream`` serves the corpus in
    offset-tracked micro-batches (SimpleDataSourceStreamReader —
    ``read`` advances a checkpointed dict offset, ``readBetweenOffsets``
    replays committed ranges identically, which is the exactly-once
    replay contract), drained with availableNow into a complete-mode
    streaming aggregate. The oracle rebuilds the same totals in closed
    form, so offset planning, batch boundaries, and replay all sit
    under the hash gate. (sf_dir unused — the source IS the data.)"""
    import uuid

    from prox_spark.datasource import register_stream
    from prox_spark.queries.streaming_q import _stream_partitions

    register_stream(spark)
    name = f"q141_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.format("synthdocs_stream")
        .option("n_docs", str(N_SYNTH_DOCS))
        .option("batch_size", "2000")
        .load()
    )
    agg = stream.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("sum_len"),
    )
    import time

    with _stream_partitions(spark):
        # Python micro-batch sources don't support availableNow (Spark
        # falls back to ONE batch, which would silently truncate the
        # corpus at the first offset range) — run a continuous
        # processing-time trigger and drain by polling the
        # complete-mode aggregate until every doc is accounted for
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(processingTime="0 seconds")
            .start()
        )
        stop_err = None
        try:
            deadline = time.monotonic() + 120
            while time.monotonic() < deadline:
                exc = q.exception()
                if exc is not None:
                    raise exc
                got = spark.table(name).agg(F.sum("n_docs")).collect()[0][0]
                if got == N_SYNTH_DOCS:
                    break
                time.sleep(0.1)
            else:
                raise TimeoutError("q141 stream did not drain in 120s")
        finally:
            try:
                q.stop()
            except Exception as e:  # surfaced after the primary error, if any
                stop_err = e

        def _benign_stop_race(e) -> bool:
            # the sink is PROVEN drained at this point (the poll above
            # saw every doc), so an error that is just the stop()
            # interrupt catching an in-flight no-op micro-batch is a
            # shutdown race, not a correctness signal. Anything else —
            # in particular the round-3 drained-path TypeError class —
            # still fails loudly. Match only the message HEAD: a py4j
            # repr carries the full Java trace, where a genuine source
            # error wrapped during stop can contain InterruptedException
            # frames deep in its caused-by chain — those must NOT make
            # it benign.
            s = str(e)[:200]
            return any(
                m in s
                for m in (
                    "InterruptedException",
                    "interrupted",
                    "QUERY_WAS_STOPPED",
                    "sparkContext was shut down",
                )
            )

        if stop_err is not None and not _benign_stop_race(stop_err):
            raise stop_err
        # the drained source idles on empty iterators (datasource.py
        # read() returns iter(...), satisfying the prefetch wrapper's
        # next(it) drained-path probe), so termination is clean — any
        # non-interrupt exception here is a real source bug
        exc = q.exception()
        if exc is not None and not _benign_stop_race(exc):
            raise exc
    return spark.table(name).orderBy("shard")


ORACLE_Q141 = f"""
SELECT CAST(i % 8 AS INTEGER) AS shard,
       count(*) AS n_docs,
       CAST(sum(length('doc-' || i || '-' || md5(i::VARCHAR))) AS BIGINT) AS sum_len
FROM generate_series(0, {N_SYNTH_DOCS - 1}) t(i)
GROUP BY 1
ORDER BY 1
"""


def _stage_xml(sf_dir: str) -> str:
    """documents as XML rows (Spark 4 ships a native XML source). The
    staged columns are numeric/enum-like only, so no escaping concerns;
    free-text payloads would go through xml.sax.saxutils.escape."""
    out_dir = os.path.join(_FIXTURES, f"xml_docs_{_sf_tag(sf_dir)}")
    out = os.path.join(out_dir, "docs.xml")
    if not os.path.exists(out):
        os.makedirs(out_dir, exist_ok=True)
        t = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
        )
        tmp = out + ".tmp"
        with open(tmp, "w") as f:
            f.write("<docs>\n")
            for row in t.to_pylist():
                f.write(
                    f"  <doc><doc_id>{row['doc_id']}</doc_id>"
                    f"<source>{row['source']}</source>"
                    f"<n_chars>{row['n_chars']}</n_chars></doc>\n"
                )
            f.write("</docs>\n")
        os.replace(tmp, out)
    return out


def q143_xml_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's NATIVE XML source in the hash gate (rowTag +
    declared schema — same no-inference rule as q138). Same
    recompute-from-the-clean-table oracle proof as the other formats:
    staged bytes derive from the table, so a hash match certifies the
    encode -> parse round-trip."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    docs = (
        spark.read.schema(schema)
        .option("rowTag", "doc")
        .xml(_stage_xml(sf_dir))
    )
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("sum_ids"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("source")
    )


ORACLE_Q143 = """
SELECT source,
       count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS sum_ids,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY source
ORDER BY source
"""


QUERIES = {
    "q138_jsonl_scan": q138_jsonl_scan,
    "q139_orc_scan": q139_orc_scan,
    "q140_python_datasource": q140_python_datasource,
    "q141_python_stream_source": q141_python_stream_source,
    "q143_xml_scan": q143_xml_scan,
}

ORACLES = {
    "q138_jsonl_scan": ORACLE_Q138,
    "q139_orc_scan": ORACLE_Q139,
    "q140_python_datasource": ORACLE_Q140,
    "q141_python_stream_source": ORACLE_Q141,
    "q143_xml_scan": ORACLE_Q143,
}
