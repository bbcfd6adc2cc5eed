"""Multimodal feature-extraction query: the documents table ingested
as opaque binary payloads (prox_spark/multimodal.py), features pulled
through an Arrow-batched ``mapInPandas`` decode pass.

The DuckDB oracle replays the *fake-decode* arithmetic in SQL over the
same utf-8 bytes — md5 digests are identical lowercase hex in both
engines, so the whole feature row is bit-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def q43_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prox_spark.multimodal import documents_as_media, extract_features
    from prox_spark.queries.text import _spread_py

    media = _spread_py(documents_as_media(spark, sf_dir))
    return extract_features(media, mode="fake").orderBy("media_id")


ORACLE_Q43 = """
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT)            AS n_bytes,
       md5(text)                                             AS digest,
       CAST(16 + octet_length(encode(text)) % 640 AS INTEGER)       AS width,
       CAST(16 + (octet_length(encode(text)) * 7) % 480 AS INTEGER) AS height,
       CAST(1 + octet_length(encode(text)) // 256 AS INTEGER)       AS n_frames
FROM documents
ORDER BY media_id
"""

QUERIES = {"q43_media_features": q43_media_features}
ORACLES = {"q43_media_features": ORACLE_Q43}
