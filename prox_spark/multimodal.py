"""Multimodal (image/audio/video) column plumbing.

The engine treats media as opaque ``binary`` payload columns with a
typed metadata struct, processed by Arrow-batched ``mapInPandas``
passes — the 100 TB-scale pattern for media pipelines: payloads never
leave the executor, each task streams Arrow batches through Python,
and extracted features are small typed columns that downstream
relational operators (dedup, similarity joins) consume.

The reference has no media processing (PROX is relational ETL only);
this module is part of the LLM-data-pipeline extension mandated by
BASELINE.json's north star. ``decode_media(mode="real")`` ships
stdlib-only decoders for the uncompressed formats (BMP, PPM, WAV), so
the real path runs in any environment; compressed formats (PNG/JPEG,
MP3, video) dispatch to Pillow/soundfile/ffmpeg when importable and
raise NotImplementedError otherwise. ``mode="fake"`` derives
deterministic pseudo-features from the payload bytes so the Spark-side
plumbing (schema, batching, partitioning) stays testable with zero
codec assumptions.
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


def _decode_bmp(payload: bytes) -> tuple[int, int, int]:
    """Pure-stdlib decode of an uncompressed (BI_RGB) .bmp: 14-byte
    file header ('BM', pixel-array offset) + BITMAPINFOHEADER (width,
    height, bpp, compression). Validates that the pixel array the
    header promises actually fits in the payload — a truncated blob
    fails here, not downstream."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise ValueError(f"only uncompressed BI_RGB supported, got {compression}")
    height = abs(height)  # negative = top-down row order
    row_bytes = (width * bpp + 31) // 32 * 4  # rows pad to 4 bytes
    if len(payload) < pixel_off + row_bytes * height:
        raise ValueError("BMP pixel array truncated")
    return width, height, 1


def _decode_ppm(payload: bytes) -> tuple[int, int, int]:
    """Pure-stdlib decode of a binary PPM (P6): ASCII header of
    magic/width/height/maxval with '#' comments, then maxval-scaled
    raw RGB triples. Validates the pixel payload length."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raw pixels
    width, height, maxval = fields
    bytes_per_sample = 1 if maxval < 256 else 2
    if len(payload) < pos + width * height * 3 * bytes_per_sample:
        raise ValueError("PPM pixel data truncated")
    return width, height, 1


def _decode_wav(payload: bytes) -> tuple[int, int, int]:
    """Stdlib ``wave`` decode of uncompressed PCM: returns
    (n_channels, sample_rate_khz, n_frames) mapped onto the
    (width, height, n_frames) feature slots."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        return w.getnchannels(), w.getframerate() // 1000, w.getnframes()


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


_STDLIB_CODECS = {
    "image/bmp": _decode_bmp,
    "image/x-portable-pixmap": _decode_ppm,
    "image/x-ppm": _decode_ppm,
    "audio/wav": _decode_wav,
    "audio/x-wav": _decode_wav,
}


def decode_media(payload: bytes, mime: str, mode: str = "fake") -> dict:
    """Codec dispatch. ``real`` decodes the uncompressed formats (BMP,
    binary PPM, PCM WAV) with pure stdlib in any environment; other
    ``image/*`` mimes go through Pillow when importable
    (NotImplementedError otherwise — compressed audio/video would
    dispatch to soundfile/ffmpeg the same way). ``fake`` derives
    deterministic pseudo dimensions/frame counts from the byte length,
    keeping every downstream contract (types, ranges) realistic without
    any codec dependency."""
    n = len(payload)
    if mode == "real":
        codec = _STDLIB_CODECS.get(mime)
        if codec is None and mime.startswith("image/"):
            codec = _decode_image_real
        if codec is not None:
            width, height, n_frames = codec(payload)
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
