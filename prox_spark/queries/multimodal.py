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

def q112_media_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-codec decode through the full Spark plumbing: synthesize an
    uncompressed BMP per document (dims derived from n_chars), then
    decode it with ``mode="real"`` — the stdlib BMP parser reads the
    actual header + validates the pixel array, so a wrong encoder, a
    truncated payload, or a broken decoder all fail the gate. The
    oracle recomputes the dims from n_chars arithmetically; the decoded
    values must round-trip through the real binary format to match.

    Scale shape: encode and decode run in ONE mapInPandas pass each —
    payloads live and die inside the task, only (id, dims) columns
    emerge; no shuffle until the final presentation sort."""
    from prox_spark.multimodal import FEATURE_SCHEMA, extract_features
    from prox_spark.queries.text import _spread_py

    import pandas as pd
    from pyspark.sql import functions as F

    docs = _spread_py(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "n_chars")
    )

    def encode(batches):
        import struct

        for pdf in batches:
            payloads = []
            for n in pdf["n_chars"]:
                w, h = int(16 + n % 48), int(8 + n % 32)
                row = (w * 24 + 31) // 32 * 4
                pixels = bytes(row * h)
                header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
                info = struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
                )
                payloads.append(header + info + pixels)
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].values,
                    "payload": payloads,
                    "meta": [
                        {"mime": "image/bmp", "source": "synth", "n_chars": int(n)}
                        for n in pdf["n_chars"]
                    ],
                }
            )

    from prox_spark.multimodal import MEDIA_SCHEMA

    media = docs.mapInPandas(encode, schema=MEDIA_SCHEMA)
    feats = extract_features(media, mode="real")
    return feats.select("media_id", "width", "height", "n_frames").orderBy("media_id")


ORACLE_Q112 = """
SELECT doc_id AS media_id,
       CAST(16 + n_chars % 48 AS INTEGER) AS width,
       CAST(8 + n_chars % 32 AS INTEGER)  AS height,
       CAST(1 AS INTEGER)                 AS n_frames
FROM documents
ORDER BY media_id
"""

QUERIES = {
    "q43_media_features": q43_media_features,
    "q112_media_real_decode": q112_media_real_decode,
}
ORACLES = {
    "q43_media_features": ORACLE_Q43,
    "q112_media_real_decode": ORACLE_Q112,
}
