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
    # GIF remains Pillow-gated (PNG and JPEG now have built-in codecs)
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="Pillow"):
            decode_media(b"GIF89a", "image/gif", mode="real")
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


def test_jpeg_roundtrip_gray_and_rgb():
    """encode_jpeg -> decode_jpeg with an all-ones quant table is
    exact up to DCT rounding (±2): real Huffman entropy coding, byte
    stuffing, EXTEND/ZRL/EOB paths, color conversion — no Pillow."""
    import numpy as np

    from prox_spark.jpeg import decode_jpeg, encode_jpeg

    for channels, tag in ((1, "g"), (3, "c")):
        w, h = 21, 11  # non-multiple-of-8 drives edge-block replication
        px = _pseudo_pixels(w * h * channels, tag)
        blob = encode_jpeg(w, h, channels, px)
        gw, gh, gc, gpx = decode_jpeg(blob)
        assert (gw, gh, gc) == (w, h, channels)
        err = np.abs(
            np.frombuffer(gpx, np.uint8).astype(int)
            - np.frombuffer(px, np.uint8).astype(int)
        ).max()
        assert err <= 2, (channels, err)


def test_jpeg_constant_block_exact():
    from prox_spark.jpeg import decode_jpeg, encode_jpeg

    px = bytes([137]) * (16 * 8)
    _, _, _, gpx = decode_jpeg(encode_jpeg(16, 8, 1, px))
    assert gpx == px


def test_jpeg_restart_markers():
    """DRI/RSTn path: predictors reset, bit reader re-aligns."""
    import numpy as np

    from prox_spark.jpeg import decode_jpeg, encode_jpeg

    w, h = 40, 24  # 5x3 = 15 MCUs -> restarts at 2,4,...,14
    px = _pseudo_pixels(w * h, "r")
    blob = encode_jpeg(w, h, 1, px, restart_interval=2)
    assert b"\xff\xd0" in blob or b"\xff\xd1" in blob
    gw, gh, gc, gpx = decode_jpeg(blob)
    assert (gw, gh, gc) == (w, h, 1)
    err = np.abs(
        np.frombuffer(gpx, np.uint8).astype(int)
        - np.frombuffer(px, np.uint8).astype(int)
    ).max()
    assert err <= 2


def test_jpeg_lossy_quant_table_stays_close():
    """QTABLE_LUMA exercises real dequantization (the natural-vs-zigzag
    table-order bug class): a smooth gradient survives within a few
    grey levels on average."""
    import numpy as np

    from prox_spark.jpeg import QTABLE_LUMA, decode_jpeg, encode_jpeg

    w = h = 32
    grad = np.linspace(30, 220, w, dtype=np.float64)
    img = np.tile(grad, (h, 1)).round().astype(np.uint8)
    blob = encode_jpeg(w, h, 1, img.tobytes(), qtable=QTABLE_LUMA)
    _, _, _, gpx = decode_jpeg(blob)
    mean_err = np.abs(
        np.frombuffer(gpx, np.uint8).astype(float) - img.reshape(-1).astype(float)
    ).mean()
    assert mean_err < 3.0, mean_err
    assert len(blob) < w * h  # actually compresses


def test_jpeg_decode_via_media_dispatch():
    from prox_spark.jpeg import encode_jpeg

    blob = encode_jpeg(24, 9, 3, _pseudo_pixels(24 * 9 * 3, "d"))
    out = decode_media(blob, "image/jpeg", mode="real")
    assert (out["width"], out["height"], out["n_frames"]) == (24, 9, 1)
    assert out["n_bytes"] == len(blob)


def test_jpeg_rejects_out_of_envelope():
    from prox_spark.jpeg import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError, match="no SOI"):
        decode_jpeg(b"\x89PNG....")
    blob = bytearray(encode_jpeg(8, 8, 1, _pseudo_pixels(64, "e")))
    sof = blob.index(b"\xff\xc0")
    prog = bytearray(blob)
    prog[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(prog))
    sub = bytearray(blob)
    sub[sof + 11] = 0x22  # sampling factors 2x2 -> subsampled
    with pytest.raises(ValueError, match="subsampling"):
        decode_jpeg(bytes(sub))
    with pytest.raises(ValueError, match="truncated|Huffman|marker"):
        decode_jpeg(bytes(blob[: len(blob) // 2]))


def _mjpeg_avi(n_frames: int, w: int = 16, h: int = 8) -> bytes:
    from prox_spark.avi import encode_avi_mjpeg
    from prox_spark.jpeg import encode_jpeg

    frames = [
        encode_jpeg(w, h, 1, bytes([(23 * i + 10) % 256]) * (w * h))
        for i in range(n_frames)
    ]
    return encode_avi_mjpeg(frames, w, h, fps=5)


def test_avi_container_roundtrip_and_frame_sampling():
    """encode_avi_mjpeg -> avi_mjpeg_frames is the identity on the
    frame payloads; sample_frames keeps every Nth frame and decodes it
    through the real JPEG decoder — no ffmpeg anywhere."""
    import numpy as np

    from prox_spark.avi import avi_mjpeg_frames, sample_frames

    blob = _mjpeg_avi(9)
    w, h, fps, frames = avi_mjpeg_frames(blob)
    assert (w, h, fps, len(frames)) == (16, 8, 5, 9)
    sampled = sample_frames(blob, 4)  # frames 0, 4, 8
    assert len(sampled) == 3
    for i, (fw, fh, fc, px) in zip((0, 4, 8), sampled):
        assert (fw, fh, fc) == (16, 8, 1)
        mean = np.frombuffer(px, np.uint8).astype(int).mean()
        assert abs(mean - ((23 * i + 10) % 256)) <= 1, (i, mean)


def test_avi_decode_via_media_dispatch():
    blob = _mjpeg_avi(4)
    out = decode_media(blob, "video/x-msvideo", mode="real")
    assert (out["width"], out["height"], out["n_frames"]) == (16, 8, 4)
    assert out["n_bytes"] == len(blob)


def test_avi_rejects_malformed():
    import struct

    from prox_spark.avi import avi_mjpeg_frames

    blob = _mjpeg_avi(3)
    with pytest.raises(ValueError, match="magic missing"):
        avi_mjpeg_frames(b"RIFF" + blob[4:8] + b"WAVE" + blob[12:])
    with pytest.raises(ValueError, match="truncated|overruns"):
        avi_mjpeg_frames(blob[: len(blob) // 2])
    # flip the stream handler to a codec we cannot decode
    h264 = bytearray(blob)
    pos = h264.index(b"vids")
    h264[pos + 4 : pos + 8] = b"H264"
    with pytest.raises(ValueError, match="MJPG only"):
        avi_mjpeg_frames(bytes(h264))
    # header/movi frame-count disagreement must be caught
    short = bytearray(blob)
    avih = short.index(b"avih")
    struct.pack_into("<I", short, avih + 8 + 16, 7)  # dwTotalFrames := 7
    with pytest.raises(ValueError, match="frame count mismatch"):
        avi_mjpeg_frames(bytes(short))


def test_avi_extract_features_end_to_end(spark):
    """Video payloads through the actual Arrow-batched mapInPandas
    pass: n_frames comes from the real container walk."""
    rows = [
        (i, _mjpeg_avi(2 + i), ("video/x-msvideo", "synth", 0)) for i in range(4)
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, payload binary, meta struct<mime:string,source:string,n_chars:long>",
    )
    got = {
        r.media_id: (r.width, r.height, r.n_frames)
        for r in extract_features(media, mode="real").collect()
    }
    assert got == {i: (16, 8, 2 + i) for i in range(4)}


def test_jpeg_out_of_envelope_dispatch_fallback():
    """Out-of-envelope JPEGs (e.g. progressive) fall back to Pillow
    when importable; without Pillow the built-in decoder's clear
    envelope ValueError surfaces — never a NotImplementedError that
    would mask the diagnosis."""
    from prox_spark.jpeg import encode_jpeg

    blob = bytearray(encode_jpeg(8, 8, 1, _pseudo_pixels(64, "p")))
    blob[blob.index(b"\xff\xc0") + 1] = 0xC2  # SOF0 -> SOF2 progressive
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(ValueError, match="non-baseline"):
            decode_media(bytes(blob), "image/jpeg", mode="real")
    else:
        pytest.skip("Pillow installed; fallback would decode instead")
