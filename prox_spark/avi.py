"""Pure-stdlib AVI (RIFF) container parser + writer for MJPEG video.

Together with :mod:`prox_spark.jpeg` this makes the video path of the
multimodal layer runnable with zero external dependencies: an AVI file
whose video stream is Motion-JPEG is a RIFF tree with one JPEG per
``00dc`` chunk, so frame extraction = container walk + per-frame
baseline-JPEG decode. That covers the real container/codec plumbing a
frame-sampling pipeline needs (parse, validate, select every Nth
frame, decode); modern codecs (H.264/VP9) have no tractable pure-Python
decoder and still dispatch to ffmpeg behind the same interface.

Scope (validated, errors loudly outside it): RIFF/'AVI ' files with a
single 'vids' stream, frames stored uncompressed-list-style in the
'movi' LIST as '00dc'/'00db' chunks. The optional 'idx1' index is
ignored on read (the movi walk is authoritative) and written on encode
so players accept the output.

Spark-side posture is identical to the other codecs: payloads decode
inside their task via Arrow-batched mapInPandas and only scalar
features / sampled-frame stats leave the executor.
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    """A RIFF chunk: fourcc + size + body, padded to an even length."""
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Build a minimal standards-shaped MJPEG AVI from per-frame JPEG
    payloads (as produced by :func:`prox_spark.jpeg.encode_jpeg`)."""
    if not frames:
        raise ValueError("an AVI needs at least one frame")
    max_bytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_bytes * fps,   # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # AVIF_HASINDEX
        len(frames),       # dwTotalFrames
        0,                 # dwInitialFrames
        1,                 # dwStreams
        max_bytes,         # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4H",
        b"vids", b"MJPG",
        0, 0, 0, 0,        # dwFlags, wPriority, wLanguage, dwInitialFrames
        1, fps,            # dwScale / dwRate -> fps frames per second
        0, len(frames),    # dwStart, dwLength
        max_bytes, -1, 0,  # dwSuggestedBufferSize, dwQuality(-1=default), dwSampleSize
        0, 0, width, height,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_body)
    # idx1: one entry per frame, offsets relative to the movi list type
    idx_entries = bytearray()
    off = 4  # past the 'movi' fourcc
    for f in frames:
        idx_entries += struct.pack("<4sIII", b"00dc", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) % 2)
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx_entries))
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def avi_mjpeg_frames(payload: bytes) -> tuple[int, int, int, list[bytes]]:
    """Parse an MJPEG AVI -> (width, height, fps, [jpeg frame bytes]).

    Walks the RIFF tree (hdrl for dimensions and timing, movi for the
    frames); validates magic, chunk bounds, the MJPG/vids stream type,
    and that the frame count matches the main header. Raises
    ValueError on anything malformed or non-MJPEG rather than
    misreading it."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload (RIFF/'AVI ' magic missing)")
    riff_size = struct.unpack_from("<I", payload, 4)[0]
    if 8 + riff_size > len(payload):
        raise ValueError("AVI RIFF size exceeds payload (truncated)")

    width = height = total = None
    fps = 0
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, total, fps
        while pos + 8 <= end:
            fourcc = payload[pos : pos + 4]
            size = struct.unpack_from("<I", payload, pos + 4)[0]
            body_end = pos + 8 + size
            if body_end > end:
                raise ValueError(f"chunk {fourcc!r} overruns its parent (truncated)")
            if fourcc == b"LIST":
                walk(pos + 12, body_end)  # skip the list-type fourcc
            elif fourcc == b"avih":
                (_, _, _, _, total, _, _, _, width, height) = struct.unpack_from(
                    "<10I", payload, pos + 8
                )
            elif fourcc == b"strh":
                fcc_type, handler = struct.unpack_from("<4s4s", payload, pos + 8)
                if fcc_type == b"vids" and handler not in (b"MJPG", b"mjpg"):
                    raise ValueError(
                        f"video stream codec {handler!r} unsupported (MJPG only)"
                    )
                # dwScale/dwRate at strh body offset 20 (after fccType,
                # fccHandler, dwFlags, wPriority, wLanguage, dwInitialFrames)
                scale, rate = struct.unpack_from("<II", payload, pos + 8 + 20)
                if fcc_type == b"vids" and scale:
                    fps = rate // scale
            elif fourcc in (b"00dc", b"00db"):
                frames.append(payload[pos + 8 : body_end])
            pos = body_end + (size % 2)  # chunks pad to even

    walk(12, 8 + riff_size)
    if width is None:
        raise ValueError("AVI missing avih main header")
    if total is not None and total != len(frames):
        raise ValueError(
            f"frame count mismatch: header says {total}, movi has {len(frames)}"
        )
    return width, height, fps, frames


def decode_sampled(
    frames: list[bytes], stride: int
) -> list[tuple[int, int, int, bytes]]:
    """Decode every ``stride``-th frame of an already-parsed frame
    list (decode only what you keep). Shared by :func:`sample_frames`
    and callers that walked the container themselves — the stride
    semantics live in exactly one place."""
    from prox_spark.jpeg import decode_jpeg

    if stride < 1:
        raise ValueError("stride must be >= 1")
    return [decode_jpeg(f) for f in frames[::stride]]


def sample_frames(payload: bytes, stride: int) -> list[tuple[int, int, int, bytes]]:
    """Frame-sample an MJPEG AVI: keep every ``stride``-th frame and
    decode each kept frame to raw pixels via the baseline JPEG decoder.
    Returns [(width, height, channels, pixel bytes)] — the typical
    vision-pretraining ingest step (decode only what you keep)."""
    _, _, _, frames = avi_mjpeg_frames(payload)
    return decode_sampled(frames, stride)
