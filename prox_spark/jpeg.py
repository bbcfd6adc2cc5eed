"""Pure-Python/numpy baseline JPEG codec — no Pillow, no libjpeg.

Closes the last codec gap in the multimodal layer (BMP/PPM/WAV/PNG
already decode with stdlib): ``decode_jpeg`` is a real baseline
sequential DCT decoder — marker parse, Huffman entropy decode with
byte-unstuffing and restart markers, dequantization, inverse zigzag,
IDCT, level shift, YCbCr→RGB — and ``encode_jpeg`` is its test-side
counterpart. Scope (documented, checked, errors loudly outside it):

- baseline sequential DCT (SOF0), 8-bit precision;
- grayscale (1 component) and YCbCr 4:4:4 (3 components, no chroma
  subsampling — the encoder never subsamples, and corpus JPEGs that
  do are rejected with a clear error rather than decoded wrongly);
- one scan, non-progressive, standard Huffman tables or any tables
  carried in DHT segments.

The DCT is the exact orthonormal type-II matrix (numpy float64), so
encode→decode error is bounded by quantization alone: with an
all-ones quantization table the round-trip is within ±2 of the input
(asserted in tests), and a constant-color block survives exactly.

JPEG is the pipeline's pathological format — entropy-coded bitstreams
with no intra-image parallelism — so the Spark-side posture is
unchanged from the other codecs: payloads decode inside their task
via Arrow-batched mapInPandas (prox_spark.multimodal.extract_features)
and only scalar features leave.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# ITU-T T.81 Annex K.1 luminance quantization table (quality-50 base)
QTABLE_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 type-II DCT matrix."""
    m = np.zeros((8, 8))
    for k in range(8):
        for n in range(8):
            m[k, n] = np.cos(np.pi * (2 * n + 1) * k / 16)
    m *= np.sqrt(2.0 / 8)
    m[0, :] *= 1 / np.sqrt(2)
    return m


_DCT = _dct_matrix()


def _huff_code_table(bits: list[int], values: list[int]) -> dict[int, str]:
    """value -> canonical code string ('0'/'1'), per T.81 C.2."""
    out: dict[int, str] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[idx]] = format(code, f"0{length}b")
            idx += 1
            code += 1
        code <<= 1
    return out


def _huff_decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, the decode-side twin."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[idx]
            idx += 1
            code += 1
        code <<= 1
    return out


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; restart
    markers (FFD0-FFD7) are surfaced to the caller via ``at_marker``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("entropy-coded segment truncated")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("entropy-coded segment truncated")
            nxt = self.data[self.pos + 1]
            if nxt != 0x00:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} inside scan")
        v = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1 + (1 if b == 0xFF else 0)  # skip stuffed 0x00
        return v

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            b = self.data[self.pos]
            self.pos += 1 + (1 if b == 0xFF else 0)

    def at_restart(self) -> bool:
        return (
            self.bit == 0
            and self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        )

    def skip_restart(self) -> None:
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_block(
    r: _BitReader, dc_tbl: dict, ac_tbl: dict, pred: int, qt: np.ndarray
) -> tuple[np.ndarray, int]:
    def read_code(tbl: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | r.read_bit()
            length += 1
            if (length, code) in tbl:
                return tbl[(length, code)]
        raise ValueError("invalid Huffman code in scan")

    zz = np.zeros(64, dtype=np.int32)
    t = read_code(dc_tbl)
    diff = _extend(r.read_bits(t), t) if t else 0
    dc = pred + diff
    zz[0] = dc
    k = 1
    while k < 64:
        rs = read_code(ac_tbl)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(r.read_bits(size), size)
        k += 1
    coeffs = np.zeros(64, dtype=np.float64)
    coeffs[ZIGZAG] = zz * qt[ZIGZAG]  # zz is zigzag-ordered; qt natural
    block = coeffs.reshape(8, 8)
    return _DCT.T @ block @ _DCT, dc  # IDCT


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG -> (width, height, channels, pixel bytes,
    row-major; channels 1=gray, 3=RGB). Raises ValueError on anything
    outside the supported envelope (progressive, subsampled, 12-bit,
    arithmetic-coded) OR malformed (truncated segment bodies, short
    Huffman tables) instead of decoding it wrongly — the single
    exception type callers (and the Pillow-fallback dispatch) rely on."""
    try:
        return _decode_baseline(payload)
    except ValueError:
        raise
    except (IndexError, KeyError, struct.error) as exc:
        raise ValueError(
            f"malformed JPEG stream ({type(exc).__name__}: {exc})"
        ) from exc


def _decode_baseline(payload: bytes) -> tuple[int, int, int, bytes]:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id)
    frame = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
        if pos + 2 + seg_len > len(payload):
            raise ValueError(f"segment 0xFF{marker:02X} truncated")
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8).astype(
                    np.int32
                )
                q = np.zeros(64, dtype=np.int32)
                q[ZIGZAG] = tbl  # stored zigzag -> natural order
                qtables[tq] = q
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                values = list(body[i + 17 : i + 17 + n])
                htables[(tc, th)] = _huff_decode_table(bits, values)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"unsupported precision {prec}")
            comps = []
            for c in range(nc):
                cid, samp, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                if samp != 0x11:
                    raise ValueError(
                        "chroma subsampling unsupported (4:4:4 only)"
                    )
                comps.append((cid, tq))
            frame = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline frame type 0xFF{marker:02X} unsupported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            w, h, comps = frame
            ns = body[0]
            sel = {}
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                sel[cs] = (tt >> 4, tt & 0x0F)
            if ns != len(comps):
                raise ValueError(
                    "non-interleaved / multi-scan baseline JPEG unsupported "
                    f"(scan covers {ns} of {len(comps)} components)"
                )
            for cid, tq in comps:
                if cid not in sel:
                    raise ValueError(f"scan omits frame component {cid}")
                dct_id, act_id = sel[cid]
                if (0, dct_id) not in htables or (1, act_id) not in htables:
                    raise ValueError("scan references undeclared Huffman table")
                if tq not in qtables:
                    raise ValueError("frame references undeclared quant table")
            r = _BitReader(payload, pos + 2 + seg_len)
            bw, bh = (w + 7) // 8, (h + 7) // 8
            planes = [np.zeros((bh * 8, bw * 8)) for _ in comps]
            preds = [0] * len(comps)
            mcu = 0
            for by in range(bh):
                for bx in range(bw):
                    if restart_interval and mcu and mcu % restart_interval == 0:
                        r.align()
                        if not r.at_restart():
                            raise ValueError("expected restart marker")
                        r.skip_restart()
                        preds = [0] * len(comps)
                    for ci, (cid, tq) in enumerate(comps):
                        dct_id, act_id = sel[cid]
                        block, preds[ci] = _decode_block(
                            r,
                            htables[(0, dct_id)],
                            htables[(1, act_id)],
                            preds[ci],
                            qtables[tq],
                        )
                        planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
                    mcu += 1
            out = [np.clip(p[:h, :w] + 128.0, 0, 255) for p in planes]
            if len(out) == 1:
                px = out[0].round().astype(np.uint8)
                return w, h, 1, px.tobytes()
            if len(out) == 3:
                y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
                rgb = np.stack(
                    [
                        y + 1.402 * cr,
                        y - 0.344136 * cb - 0.714136 * cr,
                        y + 1.772 * cb,
                    ],
                    axis=-1,
                )
                px = np.clip(rgb, 0, 255).round().astype(np.uint8)
                return w, h, 3, px.tobytes()
            raise ValueError(f"unsupported component count {len(out)}")
        # APPn/COM and anything else: skip
        pos += 2 + seg_len
    raise ValueError("no SOS segment (truncated JPEG?)")


# --- encoder (test-side counterpart) ----------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: str) -> None:
        for ch in code:
            self.acc = (self.acc << 1) | (ch == "1")
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write("1")  # pad with 1s per convention


def _csize(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def _encode_block(
    w: _BitWriter, block: np.ndarray, pred: int, qt: np.ndarray,
    dc_codes: dict, ac_codes: dict,
) -> int:
    coeffs = _DCT @ block @ _DCT.T
    zz = np.round(coeffs.reshape(64)[ZIGZAG] / qt[ZIGZAG].astype(float)).astype(int)
    dc = int(zz[0])
    diff = dc - pred
    t = _csize(diff)
    w.write(dc_codes[t])
    if t:
        mag = diff if diff > 0 else diff + (1 << t) - 1
        w.write(format(mag, f"0{t}b"))
    last_nz = max(np.nonzero(zz)[0]) if np.any(zz) else 0
    k = 1
    while k <= last_nz:
        run = 0
        while zz[k] == 0:
            run += 1
            k += 1
        while run >= 16:
            w.write(ac_codes[0xF0])  # ZRL
            run -= 16
        v = int(zz[k])
        s = _csize(v)
        w.write(ac_codes[(run << 4) | s])
        mag = v if v > 0 else v + (1 << s) - 1
        w.write(format(mag, f"0{s}b"))
        k += 1
    if last_nz < 63:
        w.write(ac_codes[0x00])  # EOB
    return dc


def encode_jpeg(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    qtable: np.ndarray | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG encoder (grayscale or RGB 4:4:4, Annex-K Huffman
    tables, one quant table for all components). ``qtable`` defaults
    to all-ones — effectively lossless up to DCT rounding, which is
    what the round-trip tests need; pass QTABLE_LUMA for realistic
    compression. ``restart_interval`` > 0 emits a DRI segment and
    RSTn markers every that-many MCUs (resetting DC predictors), so
    tests can drive the decoder's restart path with real streams."""
    if channels not in (1, 3):
        raise ValueError("grayscale or RGB only")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    qt = (qtable if qtable is not None else np.ones(64, dtype=np.int32)).astype(
        np.int32
    )
    img = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
    if channels == 1:
        planes = [img.reshape(height, width)]
    else:
        rgb = img.reshape(height, width, 3)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    bw, bh = (width + 7) // 8, (height + 7) // 8
    # edge-replicate to full blocks (standard practice)
    padded = []
    for p in planes:
        q = np.zeros((bh * 8, bw * 8))
        q[:height, :width] = p
        q[height:, :width] = p[-1:, :]
        q[:, width:] = q[:, width - 1 : width]
        padded.append(q - 128.0)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    zz_q = qt[ZIGZAG]  # natural -> zigzag storage order
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in zz_q))
    nc = channels
    sof = struct.pack(">BHHB", 8, height, width, nc)
    for c in range(nc):
        sof += struct.pack(">BBB", c + 1, 0x11, 0)
    out += seg(0xC0, sof)
    for tc, (bits, values) in ((0, _DC_LUMA), (1, _AC_LUMA)):
        out += seg(
            0xC4, bytes([tc << 4]) + bytes(bits) + bytes(values)
        )
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    dc_codes = _huff_code_table(*_DC_LUMA)
    ac_codes = _huff_code_table(*_AC_LUMA)
    wtr = _BitWriter()
    preds = [0] * nc
    mcu = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                wtr.flush()  # pad to byte boundary with 1-bits
                wtr.out += bytes(
                    [0xFF, 0xD0 + (mcu // restart_interval - 1) % 8]
                )
                preds = [0] * nc
            for ci in range(nc):
                block = padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                preds[ci] = _encode_block(
                    wtr, block, preds[ci], qt, dc_codes, ac_codes
                )
            mcu += 1
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)
