"""Pure-stdlib baseline JPEG (JFIF) codec — struct + numpy only.

The reference decodes tile bytes with the ``image`` crate
(``/root/reference/src/pmtiles.rs:30-33``), which handles PNG *and*
JPEG-family formats. Round 3 built the PNG half (``sources/png.py``);
this module completes the picture for the multimodal suite so the
``media_*`` image path decodes real bytes end-to-end with no codec
library in the container. Everything here is from the public spec
(ITU-T T.81 / ISO 10918-1, JFIF 1.02).

Scope — baseline sequential DCT, 8-bit, Huffman:

- decode: SOF0 frames, greyscale (1 component) or YCbCr (3
  components), any sampling factors up to 2x2 (4:4:4 / 4:2:2 /
  4:2:0), multiple DQT/DHT segments, restart intervals (DRI + RSTn),
  0xFF00 byte stuffing.
- encode: greyscale or RGB, 4:4:4, Annex K quantization tables with
  IJG quality scaling, Annex K Huffman tables. Deterministic output
  (fixed tables, fixed rounding) so engine-written fixtures are
  byte-stable across runs.
- rejected loudly: progressive (SOF2), arithmetic coding, 12-bit
  precision, hierarchical — a clear error beats a silent misdecode.

Exactness contract used by the media_jpeg_decode oracle: a block-
constant image (every 8x8 tile one value) encoded at quality=100
(all-ones quantization) round-trips BIT-EXACTLY — the DC coefficient
of a constant block is 8*(v-128) (integral), every AC coefficient is
0, and the float64 DCT/IDCT error (~1e-13) vanishes under rint. The
DuckDB oracle can therefore re-derive decode output in closed form
from the generation formula, never from the engine's own decode.
General images round-trip within the usual lossy bound (tested).
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    """Malformed or unsupported JPEG bytes."""


# ------------------------------------------------------------------ tables
# zigzag scan order: ZIGZAG[k] = raster index of the k-th zigzag coef
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1/K.2 quantization tables (raster order)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8-point DCT-II basis: A[u, x] = C(u)/2 * cos((2x+1)u*pi/16)
# forward: coef = A @ block @ A.T ; inverse: block = A.T @ coef @ A
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 C.2: symbol -> (code, length) by canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for bit-serial decoding."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


def scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100; 100 = all-ones (lossless-ish)."""
    if not 1 <= quality <= 100:
        raise JpegError(f"quality {quality} out of range 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


# ------------------------------------------------------------------ encode
class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            byte = (self._acc >> (self._nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._nbits -= 8
            self._acc &= (1 << self._nbits) - 1

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (T.81 F.1.2.3)."""
        if self._nbits:
            self.write((1 << (8 - self._nbits)) - 1, 8 - self._nbits)

    def marker(self, m: int) -> None:
        """Byte-align and emit a raw marker (not subject to stuffing)."""
        self.flush()
        self.out += bytes([0xFF, m])


def _magnitude(v: int) -> tuple[int, int]:
    """T.81 F.1.2.1: value -> (size category, appended bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_plane_coeffs(
    plane: np.ndarray, qtab: np.ndarray, pad_to: int = 8
) -> np.ndarray:
    """plane -> quantized zigzag coefficients [bh, bw, 64] int64.
    ``pad_to``: pad dims to this multiple (16 for luma in a 4:2:0 MCU
    grid so partial MCUs carry full 2x2 luma blocks)."""
    h, w = plane.shape
    ph, pw = -h % pad_to, -w % pad_to
    padded = np.pad(plane, ((0, ph), (0, pw)), mode="edge").astype(np.float64)
    bh, bw = padded.shape[0] // 8, padded.shape[1] // 8
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    shifted = blocks - 128.0
    # batched DCT: for each block B: A @ B @ A.T
    coefs = np.einsum("ux,byxz,vz->byuv", _A, shifted, _A, optimize=True)
    flat = coefs.reshape(bh, bw, 64)
    quant = np.rint(flat / qtab.astype(np.float64)).astype(np.int64)
    return quant[:, :, ZIGZAG]


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _write_block(
    writer: _BitWriter,
    zz: np.ndarray,
    pred: list[int],
    ci: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> None:
    """Entropy-encode one zigzag coefficient block (T.81 F.1.2)."""
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    size, bits = _magnitude(diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    writer.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(bits, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)


def _box_down2(plane: np.ndarray) -> np.ndarray:
    """2x2 box-average downsample (edge-pad odd dims)."""
    h, w = plane.shape
    p = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")
    return (p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]) / 4.0


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 array -> baseline JFIF bytes. (h, w) -> greyscale;
    (h, w, 3) -> YCbCr at ``subsample`` ("444" or "420").
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs. Deterministic for fixed inputs."""
    a = np.ascontiguousarray(arr)
    if a.dtype != np.uint8:
        raise JpegError(f"encode_jpeg expects uint8, got {a.dtype}")
    if subsample not in ("444", "420"):
        raise JpegError(f"subsample {subsample!r} not supported (444/420)")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise JpegError("zero-dimension image")
    if h > 65535 or w > 65535:
        raise JpegError("dimension exceeds 65535")
    q_luma = scaled_quant(QUANT_LUMA, quality)  # raster order
    q_chroma = scaled_quant(QUANT_CHROMA, quality)
    # comps: (plane, hs, vs, qtab, pad_to)
    if a.ndim == 2:
        comps = [(a.astype(np.float64), 1, 1, q_luma, 8)]
    elif a.ndim == 3 and a.shape[2] == 3:
        ycc = _rgb_to_ycbcr(a)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample == "444":
            comps = [(y, 1, 1, q_luma, 8), (cb, 1, 1, q_chroma, 8), (cr, 1, 1, q_chroma, 8)]
        else:  # 420: luma 2x2 per MCU, chroma box-downsampled
            comps = [
                (y, 2, 2, q_luma, 16),
                (_box_down2(cb), 1, 1, q_chroma, 8),
                (_box_down2(cr), 1, 1, q_chroma, 8),
            ]
    else:
        raise JpegError(f"unsupported array shape {arr.shape}")
    n_comp = len(comps)

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0 JFIF 1.01, no units, 1:1 aspect, no thumbnail
    out += _seg(0xE0, b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00")
    # DQT payloads are zigzag-ordered per T.81 B.2.4.1
    out += _seg(0xDB, bytes([0]) + bytes(int(v) for v in q_luma[ZIGZAG]))
    if n_comp == 3:
        out += _seg(0xDB, bytes([1]) + bytes(int(v) for v in q_chroma[ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for ci, (_, hs, vs, _, _) in enumerate(comps):
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    out += _seg(0xC0, sof)
    # DHT segments (Annex K tables)
    hts = [(0x00, _DC_LUMA_BITS, _DC_LUMA_VALS), (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS)]
    if n_comp == 3:
        hts += [
            (0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
            (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
        ]
    for tc_th, bits, vals in hts:
        out += _seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([n_comp])
    for ci in range(n_comp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    dc_codes = [_canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)]
    ac_codes = [_canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)]
    if n_comp == 3:  # comps 0,1,2 -> luma, chroma, chroma
        dc_codes += [_canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)] * 2
        ac_codes += [_canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)] * 2

    coeffs = [
        _encode_plane_coeffs(p, qt, pad_to) for p, _, _, qt, pad_to in comps
    ]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    writer = _BitWriter()
    pred = [0] * n_comp
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_idx = my * mcux + mx
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                writer.marker(0xD0 + rst_n % 8)
                rst_n += 1
                pred = [0] * n_comp
            for ci, (_, hs, vs, _, _) in enumerate(comps):
                for v in range(vs):
                    for hh in range(hs):
                        zz = coeffs[ci][my * vs + v, mx * hs + hh]
                        _write_block(writer, zz, pred, ci, dc_codes[ci], ac_codes[ci])
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------------ decode
class _BitReader:
    """Entropy-coded-segment bit reader: un-stuffs FF00, stops at any
    other marker (recorded in .marker)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise JpegError("entropy data exhausted at marker")
        if self.pos >= len(self.data):
            raise JpegError("truncated entropy-coded data")
        byte = self.data[self.pos]
        if byte == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is None:
                raise JpegError("truncated after 0xFF")
            else:
                self.marker = nxt
                raise JpegError(f"unexpected marker 0xFF{nxt:02X} in entropy data")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | byte
        self._nbits += 8

    def read_bit(self) -> int:
        if self._nbits == 0:
            self._fill()
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code (no match in 16 bits)")

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self._acc = 0
        self._nbits = 0
        if self.marker is None:
            # marker not yet hit during fill — it must be next in the stream
            if (
                self.pos + 1 < len(self.data)
                and self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7
            ):
                self.pos += 2
                return
            raise JpegError("expected RST marker")
        if not 0xD0 <= self.marker <= 0xD7:
            raise JpegError(f"expected RST marker, got 0xFF{self.marker:02X}")
        self.marker = None


def _extend(bits: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: received bits -> signed value."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 array: (h, w) grey or (h, w, 3) RGB.

    Completes the JPEG half of the reference's
    ``ImageReader::with_guessed_format().decode()``
    (``/root/reference/src/pmtiles.rs:30-33``).
    """
    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, comps) comps = [(id, hs, vs, tq)]
    restart_interval = 0
    scan = None

    while pos < len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at offset {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > len(data):
            raise JpegError("truncated segment header")
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            raise JpegError("truncated segment body")
        pos += seglen
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                off += 1
                if pq == 0:
                    vals = np.frombuffer(body[off : off + 64], np.uint8).astype(np.int64)
                    off += 64
                elif pq == 1:
                    vals = np.frombuffer(body[off : off + 128], ">u2").astype(np.int64)
                    off += 128
                else:
                    raise JpegError(f"bad DQT precision {pq}")
                if len(vals) != 64:
                    raise JpegError("truncated DQT")
                raster = np.zeros(64, np.int64)
                raster[ZIGZAG] = vals  # table is stored in zigzag order
                qtabs[tq] = raster
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                if len(bits) != 16 or len(vals) != n:
                    raise JpegError("truncated DHT")
                htabs[(tc, th)] = _decode_table(bits, vals)
                off += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext. seq.)
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise JpegError(f"{prec}-bit precision not supported (8 only)")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(
                f"SOF marker 0xFF{marker:02X} not supported (baseline sequential only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            nc = body[0]
            scan = []
            for i in range(nc):
                cid, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cid, tt >> 4, tt & 0x0F))
            # Ss/Se/Ah/Al ignored for baseline (0, 63, 0)
            break  # entropy-coded data follows at `pos`
        # APPn/COM and anything else: skipped

    if frame is None or scan is None:
        raise JpegError("missing SOF/SOS")
    h, w, comps = frame
    if h == 0 or w == 0:
        raise JpegError("zero-dimension image")
    if len(comps) not in (1, 3):
        raise JpegError(f"{len(comps)} components not supported (1 or 3)")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax not in (1, 2) or vmax not in (1, 2):
        raise JpegError("sampling factors beyond 2x2 not supported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    by_id = {c[0]: c for c in comps}
    order = []  # per scan component: (comp idx, hs, vs, qtab, dc table, ac table)
    planes = []
    for cid, td, ta in scan:
        if cid not in by_id:
            raise JpegError(f"scan references unknown component {cid}")
        _, hs, vs, tq = by_id[cid]
        if tq not in qtabs:
            raise JpegError(f"missing quant table {tq}")
        if (0, td) not in htabs or (1, ta) not in htabs:
            raise JpegError("missing Huffman table")
        pw, ph = mcux * 8 * hs, mcuy * 8 * vs
        planes.append(np.zeros((ph, pw), np.float64))
        order.append((len(planes) - 1, hs, vs, qtabs[tq], htabs[(0, td)], htabs[(1, ta)]))

    reader = _BitReader(data, pos)
    pred = [0] * len(order)
    zz = np.zeros(64, np.int64)
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_idx = my * mcux + mx
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                reader.restart()
                pred = [0] * len(order)
            for si, (pi, hs, vs, qtab, dct, act) in enumerate(order):
                for v in range(vs):
                    for hh in range(hs):
                        zz[:] = 0
                        size = reader.decode_huff(dct)
                        diff = _extend(reader.receive(size), size)
                        pred[si] += diff
                        zz[0] = pred[si]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(act)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise JpegError("AC run overflows block")
                            zz[k] = _extend(reader.receive(size), size)
                            k += 1
                        coef = np.zeros(64, np.float64)
                        coef[ZIGZAG] = (zz * qtab[ZIGZAG]).astype(np.float64)
                        block = _A.T @ coef.reshape(8, 8) @ _A + 128.0
                        py = (my * vs + v) * 8
                        px = (mx * hs + hh) * 8
                        planes[pi][py : py + 8, px : px + 8] = block

    # upsample subsampled planes to full grid, crop, clamp
    full = []
    for si, (pi, hs, vs, _, _, _) in enumerate(order):
        p = planes[pi]
        if hs < hmax:
            p = np.repeat(p, hmax // hs, axis=1)
        if vs < vmax:
            p = np.repeat(p, vmax // vs, axis=0)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def jpeg_info(data: bytes) -> tuple[int, int, int]:
    """(width, height, components) from the SOF header only."""
    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at offset {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue
        (seglen,) = struct.unpack_from(">H", data, pos)
        if marker in (0xC0, 0xC1):
            _, h, w, nc = struct.unpack_from(">BHHB", data, pos + 2)
            return w, h, nc
        if marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(f"SOF 0xFF{marker:02X} not supported")
        if marker == 0xDA:
            break
        pos += seglen
    raise JpegError("missing SOF")
