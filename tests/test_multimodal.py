from __future__ import annotations

import hashlib

import pytest

from prox_spark.multimodal import (
    FEATURE_SCHEMA,
    decode_media,
    documents_as_media,
    extract_features,
)

SF_DIR = "/root/testdata/sf0.001"


def test_media_ingest_schema(spark):
    media = documents_as_media(spark, SF_DIR)
    assert dict(media.dtypes) == {
        "media_id": "bigint",
        "payload": "binary",
        "meta": "struct<mime:string,source:string,n_chars:bigint>",
    }
    row = media.orderBy("media_id").first()
    assert isinstance(row.payload, bytes | bytearray)
    assert row.meta.mime == "text/plain"


def test_extract_features_fake_decode(spark):
    media = documents_as_media(spark, SF_DIR)
    feats = extract_features(media, mode="fake")
    assert feats.schema == FEATURE_SCHEMA
    joined = (
        media.select("media_id", "payload")
        .join(feats, "media_id")
        .orderBy("media_id")
        .limit(5)
        .collect()
    )
    assert len(joined) == 5
    for r in joined:
        ref = decode_media(bytes(r.payload), "text/plain", mode="fake")
        assert r.n_bytes == ref["n_bytes"]
        assert r.digest == hashlib.md5(bytes(r.payload)).hexdigest()
        assert (r.width, r.height, r.n_frames) == (
            ref["width"], ref["height"], ref["n_frames"],
        )


def _bmp_bytes(width: int, height: int) -> bytes:
    """Minimal uncompressed 24bpp bottom-up BMP."""
    import struct

    row = (width * 24 + 31) // 32 * 4
    pixels = bytes(row * height)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return header + info + pixels


def _ppm_bytes(width: int, height: int) -> bytes:
    return b"P6\n# comment\n%d %d\n255\n" % (width, height) + bytes(width * height * 3)


def _wav_bytes(n_frames: int) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(bytes(n_frames * 2 * 2))
    return buf.getvalue()


def test_real_decode_bmp_stdlib():
    out = decode_media(_bmp_bytes(5, 3), "image/bmp", mode="real")
    assert (out["width"], out["height"], out["n_frames"]) == (5, 3, 1)
    with pytest.raises(ValueError, match="truncated"):
        decode_media(_bmp_bytes(5, 3)[:-4], "image/bmp", mode="real")


def test_real_decode_ppm_stdlib():
    out = decode_media(_ppm_bytes(4, 7), "image/x-portable-pixmap", mode="real")
    assert (out["width"], out["height"], out["n_frames"]) == (4, 7, 1)
    with pytest.raises(ValueError, match="truncated"):
        decode_media(_ppm_bytes(4, 7)[:-2], "image/x-portable-pixmap", mode="real")


def test_real_decode_wav_stdlib():
    out = decode_media(_wav_bytes(123), "audio/wav", mode="real")
    # (channels, kHz, frames) in the (width, height, n_frames) slots
    assert (out["width"], out["height"], out["n_frames"]) == (2, 16, 123)


def test_extract_features_real_decode_end_to_end(spark):
    """mode='real' through the actual mapInPandas pass — runs in any
    environment via the stdlib BMP codec."""
    import pyspark.sql.functions as F

    rows = [(i, _bmp_bytes(16 + i, 9 + 2 * i), ("image/bmp", "synth", 0)) for i in range(6)]
    media = spark.createDataFrame(rows, "media_id long, payload binary, meta struct<mime:string,source:string,n_chars:long>")
    got = {r.media_id: (r.width, r.height) for r in extract_features(media, mode="real").collect()}
    assert got == {i: (16 + i, 9 + 2 * i) for i in range(6)}
    assert extract_features(media, mode="real").filter(F.col("n_frames") != 1).count() == 0


def test_real_decode_unsupported_mime():
    # non-media mimes have no real codec wired up in any environment
    with pytest.raises(NotImplementedError, match="no real codec"):
        decode_media(b"hello", "text/plain", mode="real")


def test_real_decode_image_without_pillow():
    # JPEG remains Pillow-gated (PNG now has a stdlib codec)
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="Pillow"):
            decode_media(b"\xff\xd8\xff", "image/jpeg", mode="real")
    else:
        pytest.skip("Pillow installed; covered by test_real_decode_image")


def _pseudo_pixels(n: int, tag: str) -> bytes:
    import hashlib

    out = bytearray()
    i = 0
    while len(out) < n:
        out += hashlib.md5(f"{tag}:{i}".encode()).digest()
        i += 1
    return bytes(out[:n])


def test_png_roundtrip_every_filter_and_color_type():
    """encode_png -> png_pixels must be the identity on the pixel
    buffer for every scanline filter (0-4) x channel count — this
    drives each unfilter branch (Sub/Up/Average/Paeth) with real
    zlib-compressed data, no Pillow anywhere."""
    from prox_spark.multimodal import encode_png, png_pixels

    for channels in (1, 3, 4):
        for ft in range(5):
            w, h = 13, 7  # odd sizes catch stride bugs
            px = _pseudo_pixels(w * h * channels, f"{channels}:{ft}")
            blob = encode_png(w, h, channels, px, filter_type=ft)
            gw, gh, gc, gpx = png_pixels(blob)
            assert (gw, gh, gc) == (w, h, channels), (channels, ft)
            assert gpx == px, (channels, ft)


def test_png_decode_via_media_dispatch():
    from prox_spark.multimodal import encode_png

    blob = encode_png(24, 9, 3, _pseudo_pixels(24 * 9 * 3, "d"), filter_type=4)
    out = decode_media(blob, "image/png", mode="real")
    assert (out["width"], out["height"], out["n_frames"]) == (24, 9, 1)
    assert out["n_bytes"] == len(blob)


def test_png_rejects_corruption():
    from prox_spark.multimodal import encode_png, png_pixels

    blob = bytearray(encode_png(8, 8, 3, _pseudo_pixels(8 * 8 * 3, "c")))
    with pytest.raises(ValueError, match="not a PNG"):
        png_pixels(b"\x89PNG" + bytes(blob[8:]))  # signature cut short
    flipped = bytearray(blob)
    flipped[40] ^= 0xFF  # inside IHDR/IDAT body -> CRC must catch it
    with pytest.raises(ValueError, match="CRC mismatch|unsupported|nonstandard"):
        png_pixels(bytes(flipped))
    with pytest.raises(ValueError, match="truncated|missing IHDR|length mismatch|inflate failed"):
        png_pixels(bytes(blob[: len(blob) // 2]))


def test_real_decode_image():
    PIL = pytest.importorskip("PIL")  # noqa: N806
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (3, 2)).save(buf, format="PNG")
    out = decode_media(buf.getvalue(), "image/png", mode="real")
    assert (out["width"], out["height"], out["n_frames"]) == (3, 2, 1)
    assert out["n_bytes"] == len(buf.getvalue())
