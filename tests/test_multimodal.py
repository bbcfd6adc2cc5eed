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


def test_real_decode_unsupported_mime():
    # non-image media has no real codec wired up in any environment
    with pytest.raises(NotImplementedError, match="no real codec"):
        decode_media(b"hello", "text/plain", mode="real")


def test_real_decode_image_without_pillow():
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="Pillow"):
            decode_media(b"\x89PNG", "image/png", mode="real")
    else:
        pytest.skip("Pillow installed; covered by test_real_decode_image")


def test_real_decode_image():
    PIL = pytest.importorskip("PIL")  # noqa: N806
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (3, 2)).save(buf, format="PNG")
    out = decode_media(buf.getvalue(), "image/png", mode="real")
    assert (out["width"], out["height"], out["n_frames"]) == (3, 2, 1)
    assert out["n_bytes"] == len(buf.getvalue())
