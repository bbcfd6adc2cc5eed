"""Similarity search over the `embeddings` table (array<float>, dim 64)
— the ANN extension from BASELINE.json's north star.

Two paths:

- q40 brute-force cosine top-k: exact baseline. Query set broadcast,
  candidates scanned once; cosine computed as a *left fold* over the
  zipped arrays (``F.aggregate``), which is bit-identical to DuckDB's
  ``list_reduce`` fold — verified experimentally — so the oracle
  compares full-precision doubles, no rounding tricks needed.
- q41 random-hyperplane LSH: the scale path. An 8-bit signature from
  a deterministic ±1 hyperplane matrix (generated in Python from
  md5, embedded as literals in BOTH engines) buckets vectors; only
  same-bucket candidates are scored. Sub-linear candidate volume at
  100 TB: the bucket join replaces the all-pairs cross join.

Scale notes: brute force is O(Q*N) — fine for small Q (broadcast the
queries, scan candidates once, no shuffle beyond the final top-k).
For large Q*N, q41's bucket equi-join shuffles on the 8-bit bucket
key; more bits => smaller buckets => higher selectivity, tunable
recall/cost like any LSH.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

EMB_DIM = 64
N_QUERIES = 10  # vectors with vec_id < N_QUERIES form the query set
TOP_K = 3
LSH_BITS = 8


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prox_spark.queries.text import _spread

    return (
        _spread(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
        .withColumn("dd", F.expr("cast(embedding as array<double>)"))
    )


# fold-left expressions — MUST stay structurally identical across engines
DOT_SPARK = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)"
DOT_DUCK = "list_reduce(list_transform(list_zip({a}, {b}), x -> x[1] * x[2]), (acc, x) -> acc + x)"


def _cosine_spark(a: str, b: str) -> str:
    return (
        f"{DOT_SPARK.format(a=a, b=b)} / "
        f"(sqrt({DOT_SPARK.format(a=a, b=a)}) * sqrt({DOT_SPARK.format(a=b, b=b)}))"
    )


def _cosine_duck(a: str, b: str) -> str:
    return (
        f"{DOT_DUCK.format(a=a, b=b)} / "
        f"(sqrt({DOT_DUCK.format(a=a, b=a)}) * sqrt({DOT_DUCK.format(a=b, b=b)}))"
    )


# --- q40: brute-force cosine top-k (exact baseline) ------------------------

def q40_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("dd").alias("qv")
    )
    cand = emb.select("vec_id", "dd")
    scored = (
        cand.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.expr(_cosine_spark("qv", "dd")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "rank", "cosine")
        .orderBy("query_id", "rank")
    )


ORACLE_Q40 = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS dd FROM embeddings),
q AS (SELECT vec_id AS query_id, dd AS qv FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id,
         {_cosine_duck('q.qv', 'e.dd')} AS cosine
  FROM e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, vec_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, vec_id, rank, cosine
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


# --- q41: random-hyperplane LSH bucketed search (scale path) ---------------

def _hyperplanes(bits: int = LSH_BITS, dim: int = EMB_DIM) -> list[list[int]]:
    """Deterministic ±1 hyperplane matrix derived from md5 — identical
    constants are embedded in the Spark expression and the oracle SQL."""
    planes = []
    for b in range(bits):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"plane:{b}:{i}".encode()).hexdigest()
            row.append(1 if int(h[:2], 16) % 2 == 0 else -1)
        planes.append(row)
    return planes


_PLANES = _hyperplanes()


def _bucket_expr_spark(vec: str) -> str:
    terms = []
    for b, row in enumerate(_PLANES):
        arr = "array(" + ", ".join(f"{v}.0D" for v in row) + ")"
        dot = DOT_SPARK.format(a=vec, b=arr)
        terms.append(f"CASE WHEN {dot} > 0 THEN {1 << b} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def _bucket_expr_duck(vec: str) -> str:
    terms = []
    for b, row in enumerate(_PLANES):
        arr = "[" + ", ".join(f"{v}.0" for v in row) + "]::DOUBLE[]"
        dot = DOT_DUCK.format(a=vec, b=arr)
        terms.append(f"CASE WHEN {dot} > 0 THEN {1 << b} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def q41_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).withColumn(
        "bucket", F.expr(_bucket_expr_spark("dd")).cast("long")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("dd").alias("qv"), F.col("bucket").alias("qb")
    )
    cand = emb.select("vec_id", "dd", "bucket")
    scored = (
        cand.join(F.broadcast(queries), cand.bucket == queries.qb)
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.expr(_cosine_spark("qv", "dd")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "rank", "cosine")
        .orderBy("query_id", "rank")
    )


def _oracle_q41() -> str:
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS dd,
         {_bucket_expr_duck('embedding::DOUBLE[]')} AS bucket
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, dd AS qv, bucket AS qb FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id,
         {_cosine_duck('q.qv', 'e.dd')} AS cosine
  FROM e JOIN q ON e.bucket = q.qb
  WHERE e.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, vec_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, vec_id, rank, cosine
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


ORACLE_Q41 = _oracle_q41()


QUERIES = {
    "q40_cosine_topk": q40_cosine_topk,
    "q41_lsh_ann": q41_lsh_ann,
}

ORACLES = {
    "q40_cosine_topk": ORACLE_Q40,
    "q41_lsh_ann": ORACLE_Q41,
}
