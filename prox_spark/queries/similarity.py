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


# --- q42: embedding-cosine near-dup (multi-table LSH blocking) -------------

NEARDUP_COS = 0.42
ND_TABLES = 4   # L hash tables ...
ND_BITS = 5     # ... of b bits each: recall = 1 - (1 - p^b)^L

_ND_PLANES = [
    [
        [
            1 if int(hashlib.md5(f"ndplane:{t}:{b}:{i}".encode()).hexdigest()[:2], 16) % 2 == 0 else -1
            for i in range(EMB_DIM)
        ]
        for b in range(ND_BITS)
    ]
    for t in range(ND_TABLES)
]


def _nd_bucket_spark(vec: str, table: int) -> str:
    terms = []
    for b, row in enumerate(_ND_PLANES[table]):
        arr = "array(" + ", ".join(f"{v}.0D" for v in row) + ")"
        terms.append(f"CASE WHEN {DOT_SPARK.format(a=vec, b=arr)} > 0 THEN {1 << b} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def _nd_bucket_duck(vec: str, table: int) -> str:
    terms = []
    for b, row in enumerate(_ND_PLANES[table]):
        arr = "[" + ", ".join(f"{v}.0" for v in row) + "]::DOUBLE[]"
        terms.append(f"CASE WHEN {DOT_DUCK.format(a=vec, b=arr)} > 0 THEN {1 << b} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def q42_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate detection over embeddings — the vector-space
    counterpart of q36's MinHash-LSH: L=4 independent hyperplane tables
    of b=5 bits block the corpus; only same-bucket pairs (union over
    tables, distinct) get the exact cosine verification. Sub-quadratic
    where the brute-force all-pairs join is O(N^2): at 100 TB the bucket
    equi-join shuffles on a 5-bit key per table and candidate volume is
    ~N^2 * 2^-b per table — tunable recall/cost, no cross join anywhere.
    """
    # norm precomputed ONCE per vector: each candidate pair then costs a
    # single dot fold (vs 3 folds for inline cosine) — at N^2*2^-b
    # candidate volume this is the dominant term
    emb = _emb(spark, sf_dir).withColumn(
        "nrm", F.expr(f"sqrt({DOT_SPARK.format(a='dd', b='dd')})")
    )
    buckets_expr = "array(" + ", ".join(
        f"named_struct('t', {t}, 'bkt', {_nd_bucket_spark('dd', t)})" for t in range(ND_TABLES)
    ) + ")"
    tagged = (
        emb.select("vec_id", F.explode(F.expr(buckets_expr)).alias("tb"))
        .select("vec_id", F.col("tb.t").alias("t"), F.col("tb.bkt").alias("bkt"))
    )
    a = tagged.alias("a")
    b = tagged.alias("b")
    # candidate ids only (narrow shuffle), distinct BEFORE vectors rejoin
    cand = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id1"), F.col("b.vec_id").alias("id2"))
        .distinct()
    )
    e1 = emb.select(F.col("vec_id").alias("id1"), F.col("dd").alias("v1"), F.col("nrm").alias("n1"))
    e2 = emb.select(F.col("vec_id").alias("id2"), F.col("dd").alias("v2"), F.col("nrm").alias("n2"))
    return (
        cand.join(F.broadcast(e1), "id1")
        .join(F.broadcast(e2), "id2")
        .withColumn(
            "cosine",
            F.expr(f"{DOT_SPARK.format(a='v1', b='v2')} / (n1 * n2)"),
        )
        .filter(F.col("cosine") >= NEARDUP_COS)
        .select("id1", "id2", "cosine")
        .orderBy("id1", "id2")
    )


# DuckDB side: express the L tables as a UNION ALL (same candidate
# semantics as the Spark explode over per-table buckets).
_ND_TAGGED_DUCK = " UNION ALL ".join(
    f"SELECT vec_id, dd, {t} AS t, {_nd_bucket_duck('dd', t)} AS bkt FROM e"
    for t in range(ND_TABLES)
)

_ND_DOT = DOT_DUCK.format(a="e1.dd", b="e2.dd")

ORACLE_Q42 = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS dd,
         sqrt({DOT_DUCK.format(a='embedding::DOUBLE[]', b='embedding::DOUBLE[]')}) AS nrm
  FROM embeddings
),
tagged AS ({_ND_TAGGED_DUCK}),
cand AS (
  SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
  FROM tagged a JOIN tagged b
    ON a.t = b.t AND a.bkt = b.bkt AND a.vec_id < b.vec_id
)
SELECT id1, id2, {_ND_DOT} / (e1.nrm * e2.nrm) AS cosine
FROM cand JOIN e e1 ON id1 = e1.vec_id JOIN e e2 ON id2 = e2.vec_id
WHERE {_ND_DOT} / (e1.nrm * e2.nrm) >= {NEARDUP_COS}
ORDER BY id1, id2
"""


# --- q45: IVF-style ANN (coarse quantizer + cluster probe) -----------------

IVF_K = 8        # centroids (deterministic: the first K vectors by vec_id)
IVF_NPROBE = 2   # clusters probed per query


def q45_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-file ANN: a coarse quantizer (K fixed centroid vectors)
    partitions the corpus into cluster lists; each query probes only its
    NPROBE nearest clusters and scores those lists exactly.

    The scale path complementary to q41's LSH: assignment is one
    broadcast pass over the corpus (K tiny), the probe join is an
    equi-join on cluster id — candidate volume ~ NPROBE/K of the corpus
    per query. At 100 TB the cluster lists become the physical
    partitioning (write bucketed by cid) so a probe reads only its
    buckets. Centroids here are the first K vectors by vec_id —
    deterministic stand-ins for trained k-means centroids (training is
    an offline job; the serving plan is identical either way)."""
    emb = _emb(spark, sf_dir).withColumn(
        "nrm", F.expr(f"sqrt({DOT_SPARK.format(a='dd', b='dd')})")
    )
    cent = emb.filter(F.col("vec_id") < IVF_K).select(
        F.col("vec_id").alias("cid"), F.col("dd").alias("cdd"), F.col("nrm").alias("cnrm")
    )
    sim = F.expr(f"{DOT_SPARK.format(a='dd', b='cdd')} / (nrm * cnrm)")
    ranked = (
        emb.crossJoin(F.broadcast(cent))
        .withColumn("csim", sim)
        .withColumn(
            "crank",
            F.row_number().over(
                W.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cid"))
            ),
        )
    )
    assign = ranked.filter(F.col("crank") == 1).select("vec_id", "cid", "dd", "nrm")
    probes = (
        ranked.filter((F.col("vec_id") < N_QUERIES) & (F.col("crank") <= IVF_NPROBE))
        .select(F.col("vec_id").alias("query_id"), "cid",
                F.col("dd").alias("qv"), F.col("nrm").alias("qn"))
    )
    scored = (
        assign.join(F.broadcast(probes), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.expr(f"{DOT_SPARK.format(a='qv', b='dd')} / (qn * nrm)"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "rank", "cosine")
        .orderBy("query_id", "rank")
    )


ORACLE_Q45 = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS dd,
         sqrt({DOT_DUCK.format(a='embedding::DOUBLE[]', b='embedding::DOUBLE[]')}) AS nrm
  FROM embeddings
),
cent AS (SELECT vec_id AS cid, dd AS cdd, nrm AS cnrm FROM e WHERE vec_id < {IVF_K}),
ranked AS (
  SELECT e.vec_id, e.dd, e.nrm, cent.cid,
         {DOT_DUCK.format(a='e.dd', b='cent.cdd')} / (e.nrm * cent.cnrm) AS csim,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY {DOT_DUCK.format(a='e.dd', b='cent.cdd')} / (e.nrm * cent.cnrm) DESC, cent.cid ASC
         ) AS crank
  FROM e CROSS JOIN cent
),
assign AS (SELECT vec_id, cid, dd, nrm FROM ranked WHERE crank = 1),
probes AS (
  SELECT vec_id AS query_id, cid, dd AS qv, nrm AS qn
  FROM ranked WHERE vec_id < {N_QUERIES} AND crank <= {IVF_NPROBE}
),
scored AS (
  SELECT p.query_id, a.vec_id,
         {DOT_DUCK.format(a='p.qv', b='a.dd')} / (p.qn * a.nrm) AS cosine
  FROM assign a JOIN probes p ON a.cid = p.cid
  WHERE a.vec_id <> p.query_id
),
final AS (
  SELECT query_id, vec_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, vec_id, rank, cosine
FROM final WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


QUERIES = {
    "q40_cosine_topk": q40_cosine_topk,
    "q41_lsh_ann": q41_lsh_ann,
    "q42_embed_neardup": q42_embed_neardup,
    "q45_ivf_ann": q45_ivf_ann,
}

ORACLES = {
    "q40_cosine_topk": ORACLE_Q40,
    "q41_lsh_ann": ORACLE_Q41,
    "q42_embed_neardup": ORACLE_Q42,
    "q45_ivf_ann": ORACLE_Q45,
}
