"""Multimodal (image/audio/video) column plumbing.

The engine treats media as opaque ``binary`` payload columns with a
typed metadata struct, processed by Arrow-batched ``mapInPandas``
passes — the 100 TB-scale pattern for media pipelines: payloads never
leave the executor, each task streams Arrow batches through Python,
and extracted features are small typed columns that downstream
relational operators (dedup, similarity joins) consume.

The reference has no media processing (PROX is relational ETL only);
this module is part of the LLM-data-pipeline extension mandated by
BASELINE.json's north star. The actual codec step is STUBBED — the
container ships no image/audio libraries — behind ``decode_media``:
``mode="real"`` raises NotImplementedError; ``mode="fake"`` derives
deterministic pseudo-features from the payload bytes so the Spark-side
plumbing (schema, batching, partitioning) is fully real and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# media table shape: opaque payload + typed metadata
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("payload", BinaryType(), True),
    StructField("meta", StructType([
        StructField("mime", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("n_bytes", LongType(), True),
    StructField("digest", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_frames", IntegerType(), True),
])


def documents_as_media(spark, sf_dir: str) -> DataFrame:
    """Ingest the ``documents`` table as a media table: utf-8 payload
    bytes stand in for image/audio blobs (encode stays JVM-side — no
    Python round-trip for the heavy column)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("source").alias("source"),
            F.col("n_chars").alias("n_chars"),
        ).alias("meta"),
    )


def _decode_image_real(payload: bytes) -> tuple[int, int, int]:
    """Pillow-backed image decode, gated on import availability (the
    default container ships no media libraries). Returns
    (width, height, n_frames)."""
    try:
        import io

        from PIL import Image
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "mode='real' needs Pillow for image/* payloads; not installed"
        ) from exc
    with Image.open(io.BytesIO(payload)) as img:
        return img.width, img.height, int(getattr(img, "n_frames", 1))


def decode_media(payload: bytes, mime: str, mode: str = "fake") -> dict:
    """Codec dispatch. ``real`` decodes ``image/*`` via Pillow when the
    library is importable (NotImplementedError otherwise — audio/video
    would dispatch to soundfile/ffmpeg the same way). ``fake`` derives
    deterministic pseudo dimensions/frame counts from the byte length,
    keeping every downstream contract (types, ranges) realistic without
    any codec dependency."""
    n = len(payload)
    if mode == "real":
        if mime.startswith("image/"):
            width, height, n_frames = _decode_image_real(payload)
            return {
                "n_bytes": n,
                "digest": hashlib.md5(payload).hexdigest(),
                "width": width,
                "height": height,
                "n_frames": n_frames,
            }
        raise NotImplementedError(
            f"no real codec for {mime!r} in this environment; use mode='fake'"
        )
    return {
        "n_bytes": n,
        "digest": hashlib.md5(payload).hexdigest(),
        "width": 16 + n % 640,
        "height": 16 + (n * 7) % 480,
        "n_frames": 1 + n // 256,
    }


def extract_features(media: DataFrame, mode: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction: one ``mapInPandas`` pass, no
    shuffle — the plan is scan -> Python map -> project, and the wide
    payload column dies inside the task (only ~40 bytes/row emerge)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [
                decode_media(payload, meta["mime"], mode=mode)
                for payload, meta in zip(pdf["payload"], pdf["meta"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
