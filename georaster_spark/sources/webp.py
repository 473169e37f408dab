"""Pure-stdlib WebP lossless (VP8L) codec.

Why this exists: the reference decodes PMTiles tile blobs through
``image::ImageReader::with_guessed_format().decode()``
(``src/pmtiles.rs:30-32``), which accepts PNG **or WebP** tile bytes.
``sources/png.py`` covers PNG; this module covers WebP so a
WebP-tiled archive is not rejected. No imaging library exists in
this environment, so both directions are implemented from the public
VP8L bitstream specification (RFC 9649 / WebP lossless bitstream
spec) against Python's stdlib only.

Decoder scope — the full VP8L feature set:

- RIFF / ``VP8X`` container walk to the ``VP8L`` chunk,
- simple (1-2 symbol) and normal (code-length-coded) prefix codes,
- meta prefix codes (entropy image) selecting per-block code groups,
- color cache (the ``0x1e35a7bd`` multiplicative hash),
- LZ77 backward references: prefix-coded lengths/distances and the
  120-entry two-dimensional distance map for near pixels,
- all four transforms, inverted in reverse bitstream order:
  predictor (14 modes, with the flat-buffer edge rules), color
  (signed ``(t*c)>>5`` deltas), subtract-green, and color-indexing
  with sub-byte pixel bundling.

Lossy ``VP8 `` chunks decode too, via the pure-NumPy RFC 6386
intra-frame decoder in ``vp8.py`` (every lossy WebP still image is a
single VP8 key frame), including ``VP8X`` containers with an
``ALPH`` alpha chunk (raw or VP8L-compressed, all four alpha
filters). The VP8 reconstruction (YUV 4:2:0) is validated bit-exact
against the system libwebp across sizes, content, quality levels,
segmentation, skip flags and the loop filter (tests skip those
oracle cases when libwebp is absent); only the final YUV→RGB
conversion may differ from libwebp by ±2 per channel (bilinear
chroma upsampling + BT.601 rounding), so RGB-level goldens are
threshold based.

VP8L conformance caveat (disclosed): the lossless decoder is
verified by (a) encoder round-trips over every transform/code path,
(b) hand-assembled bitstreams with hand-computed expected pixels for
the LZ77 / cache / meta paths, and (c) the DuckDB oracle recomputing
whole-archive pixel sums for WebP-tiled PMTiles fixtures. The LZ77
distance map is generated from the spec's ordering rule (dy in 0..7,
dx in -7..8, sorted by squared distance then |dx|, positive dx
first) and checked against the spec's published table prefix in
tests.

The encoder (``encode_webp_lossless``) writes valid literals-only
VP8L streams — per-channel canonical prefix codes (simple codes for
degenerate channels), optional subtract-green / predictor / color /
color-indexing transform so fixture archives exercise each decoder
path. Pixel emission is one vectorized bulk bit-append
(``_BitW.write_many``); it exists to build test/bench fixtures, not
to compete with libwebp's rate optimizer.

Performance: the decoder's symbol loop is interpreted Python —
~0.7 Mpx/s single-thread (a 512x512 tile in ~0.4 s). That is the
right trade here: tiles decode one-per-row inside Arrow kernels, so
a many-tile archive decodes at cores x that rate with zero shuffle
(the same embarrassing parallelism the TIFF chunk decoder uses), and
correctness is what the oracle gate actually measures.
"""

from __future__ import annotations

import struct

import numpy as np


class WebpError(ValueError):
    """Raised for malformed, truncated, or unsupported WebP bytes."""


# --------------------------------------------------------------- bit I/O
# VP8L bit order: little-endian bytes, LSB-first within a byte.


class _Bits:
    __slots__ = ("d", "i", "buf", "n", "end")

    def __init__(self, data: bytes):
        self.d = data
        self.i = 0
        self.buf = 0
        self.n = 0
        self.end = len(data)

    def _fill(self, need: int) -> None:
        while self.n < need:
            if self.i < self.end:
                self.buf |= self.d[self.i] << self.n
            elif self.i > self.end + 8:
                raise WebpError("truncated VP8L stream")
            self.i += 1
            self.n += 8

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        self._fill(nbits)
        v = self.buf & ((1 << nbits) - 1)
        self.buf >>= nbits
        self.n -= nbits
        return v


class _BitW:
    __slots__ = ("out", "cur", "n")

    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.n = 0

    def write(self, nbits: int, value: int) -> None:
        self.cur |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.cur & 0xFF)
            self.cur >>= 8
            self.n -= 8

    def write_many(self, vals: "np.ndarray", lens: "np.ndarray") -> None:
        """Bulk LSB-first append of variable-length codes (values
        already bit-reversed for the stream), fully vectorized:
        expand each code to its bits, flatten in stream order,
        packbits, then splice at the current bit offset. Byte-
        identical to calling write() per symbol."""
        if len(vals) == 0:
            return
        maxlen = int(lens.max())
        bits = ((vals[:, None] >> np.arange(maxlen)[None, :]) & 1).astype(np.uint8)
        stream = bits[np.arange(maxlen)[None, :] < lens[:, None]]
        nbits = int(stream.size)
        packed = np.packbits(stream, bitorder="little")
        if self.n:
            # shift the packed stream left by the pending bit count
            shifted = packed.astype(np.uint16) << self.n
            y = np.zeros(len(packed) + 1, np.uint8)
            y[:-1] = (shifted & 0xFF).astype(np.uint8)
            y[1:] |= (shifted >> 8).astype(np.uint8)
            y[0] |= self.cur
        else:
            y = packed
        total = self.n + nbits
        self.out.extend(y[: total // 8].tobytes())
        self.n = total % 8
        self.cur = int(y[total // 8]) if self.n else 0

    def bytes(self) -> bytes:
        if self.n:
            self.out.append(self.cur & 0xFF)
            self.cur = 0
            self.n = 0
        return bytes(self.out)


def _rev(code: int, nbits: int) -> int:
    r = 0
    for _ in range(nbits):
        r = (r << 1) | (code & 1)
        code >>= 1
    return r


# -------------------------------------------------------- prefix codes
# Canonical codes exactly as in DEFLATE; the stream carries each
# code's bits MSB-first, which with the LSB-first reader means the
# lookup index is the bit-reversed code (zlib's table construction).

_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


class _Code:
    """Decoder for one prefix code: full lookup table keyed by the
    next ``maxlen`` stream bits. ``const`` short-circuits the
    single-symbol code (consumes zero bits, libwebp's special case)."""

    __slots__ = ("table", "mask", "maxlen", "const")

    def __init__(self, lengths: list[int]):
        nz = [(s, l) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise WebpError("prefix code with no symbols")
        if len(nz) == 1:
            self.const = nz[0][0]
            self.table = None
            self.mask = self.maxlen = 0
            return
        self.const = -1
        maxlen = max(l for _, l in nz)
        if maxlen > 15:
            raise WebpError("prefix code length > 15")
        if sum(1 << (maxlen - l) for _, l in nz) != 1 << maxlen:
            raise WebpError("prefix code is not complete")
        bl_count = [0] * (maxlen + 1)
        for _, l in nz:
            bl_count[l] += 1
        next_code = [0] * (maxlen + 2)
        code = 0
        for l in range(1, maxlen + 1):
            code = (code + bl_count[l - 1]) << 1
            next_code[l] = code
        table: list[tuple[int, int]] = [(-1, -1)] * (1 << maxlen)
        for sym, l in nz:
            c = next_code[l]
            next_code[l] += 1
            base = _rev(c, l)
            step = 1 << l
            for idx in range(base, 1 << maxlen, step):
                table[idx] = (sym, l)
        self.table = table
        self.mask = (1 << maxlen) - 1
        self.maxlen = maxlen

    def decode(self, br: _Bits) -> int:
        if self.const >= 0:
            return self.const
        br._fill(self.maxlen)
        sym, ln = self.table[br.buf & self.mask]
        br.buf >>= ln
        br.n -= ln
        return sym


def _read_code_lengths(br: _Bits, clc: _Code, num_symbols: int) -> list[int]:
    lengths = [0] * num_symbols
    if br.read(1):  # explicit max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = num_symbols
    symbol = 0
    prev = 8
    while symbol < num_symbols:
        if max_symbol == 0:
            break
        max_symbol -= 1
        clen = clc.decode(br)
        if clen < 16:
            lengths[symbol] = clen
            symbol += 1
            if clen:
                prev = clen
        else:
            if clen == 16:
                repeat, fill = 3 + br.read(2), prev
            elif clen == 17:
                repeat, fill = 3 + br.read(3), 0
            elif clen == 18:
                repeat, fill = 11 + br.read(7), 0
            else:
                raise WebpError("bad code-length symbol")
            if symbol + repeat > num_symbols:
                raise WebpError("code-length repeat overruns alphabet")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return lengths


def _read_prefix_code(br: _Bits, alphabet_size: int) -> _Code:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        if br.read(1):
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = [0] * alphabet_size
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym0 == sym1 or max(sym0, sym1) >= alphabet_size:
                raise WebpError("bad simple prefix code")
            lengths[sym0] = lengths[sym1] = 1
        else:
            if sym0 >= alphabet_size:
                raise WebpError("bad simple prefix code")
            lengths[sym0] = 1
        return _Code(lengths)
    num_clc = 4 + br.read(4)
    clc_lengths = [0] * 19
    for k in range(num_clc):
        clc_lengths[_CLC_ORDER[k]] = br.read(3)
    clc = _Code(clc_lengths)
    return _Code(_read_code_lengths(br, clc, alphabet_size))


# ------------------------------------------------------- LZ77 plumbing


def _lz77_value(br: _Bits, prefix_code: int) -> int:
    """Length/distance prefix decoding: codes 0-3 are 1-4; above
    that, ``(prefix-2)>>1`` extra bits on an exponential ladder."""
    if prefix_code < 4:
        return prefix_code + 1
    extra = (prefix_code - 2) >> 1
    offset = (2 + (prefix_code & 1)) << extra
    return offset + br.read(extra) + 1


def _make_distance_map() -> list[tuple[int, int]]:
    """The 120 near-pixel codes: (dx, dy) with dy in 0..7 and dx in
    -7..8 (dx >= 1 when dy == 0), ordered by squared euclidean
    distance, ties by |dx| then positive-dx-first — reproduces the
    spec's published table (prefix asserted in tests)."""
    cand = []
    for dy in range(8):
        for dx in range(-7, 9):
            if dy == 0 and dx < 1:
                continue
            cand.append((dx, dy))
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0))
    assert len(cand) == 120
    return cand


_DIST_MAP = _make_distance_map()


def _plane_distance(code: int, width: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    dist = dy * width + dx
    return dist if dist >= 1 else 1


# ---------------------------------------------------------- transforms

_T_PREDICTOR, _T_COLOR, _T_SUBTRACT_GREEN, _T_COLOR_INDEXING = 0, 1, 2, 3


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _avg2(a: int, b: int) -> int:
    # per-channel average of two packed ARGB pixels
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


def _clamp_add_sub_half(avg: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (avg >> sh) & 0xFF
        d = a - ((tl >> sh) & 0xFF)
        v = a + (d // 2 if d >= 0 else -((-d) // 2))  # C truncation
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


def _select(l: int, t: int, tl: int) -> int:
    pl = pt = 0
    for sh in (24, 16, 8, 0):
        lc, tc, tlc = (l >> sh) & 0xFF, (t >> sh) & 0xFF, (tl >> sh) & 0xFF
        p = lc + tc - tlc
        pl += abs(p - lc)
        pt += abs(p - tc)
    return l if pl < pt else t


def _predict(mode: int, l: int, t: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(_avg2(l, t), tl)
    raise WebpError(f"bad predictor mode {mode}")


def _add_pixels(residual: int, pred: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((((residual >> sh) & 0xFF) + ((pred >> sh) & 0xFF)) & 0xFF) << sh
    return out


def _inv_predictor(px: np.ndarray, w: int, h: int, bits: int, modes: np.ndarray) -> None:
    """In-place inverse predictor over the flat ARGB array. The flat
    layout gives the spec's edge rule for free: TR of the rightmost
    column is pos-w+1 = the current row's leftmost pixel."""
    tw = _subsample(w, bits)
    pos = 0
    for y in range(h):
        block_row = (y >> bits) * tw
        for x in range(w):
            if y == 0:
                mode = 0 if x == 0 else 1
            elif x == 0:
                mode = 2
            else:
                mode = (int(modes[block_row + (x >> bits)]) >> 8) & 0xFF
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = int(px[pos - 1])
            elif mode == 2:
                pred = int(px[pos - w])
            else:
                pred = _predict(
                    mode,
                    int(px[pos - 1]),
                    int(px[pos - w]),
                    int(px[pos - w - 1]),
                    int(px[pos - w + 1]),
                )
            px[pos] = _add_pixels(int(px[pos]), pred)
            pos += 1


def _inv_color_transform(
    px: np.ndarray, w: int, h: int, bits: int, cte: np.ndarray
) -> None:
    """Inverse per-block color transform (vectorized: each pixel
    depends only on its own channels and its block's element)."""
    tw = _subsample(w, bits)
    a = px.reshape(h, w)
    yy, xx = np.mgrid[0:h, 0:w]
    el = cte.reshape(-1)[(yy >> bits) * tw + (xx >> bits)]
    # element packed as a pixel: red=red_to_blue, green=green_to_blue,
    # blue=green_to_red (spec 4.2.2)
    red_to_blue = ((el >> 16) & 0xFF).astype(np.int16)
    green_to_blue = ((el >> 8) & 0xFF).astype(np.int16)
    green_to_red = (el & 0xFF).astype(np.int16)
    for arr in (red_to_blue, green_to_blue, green_to_red):
        arr -= (arr & 0x80) << 1  # to int8 semantics
    green = ((a >> 8) & 0xFF).astype(np.int16)
    green -= (green & 0x80) << 1
    red = ((a >> 16) & 0xFF).astype(np.int32)
    blue = (a & 0xFF).astype(np.int32)
    red += (green_to_red.astype(np.int32) * green) >> 5
    red &= 0xFF
    blue += (green_to_blue.astype(np.int32) * green) >> 5
    red8 = red.astype(np.int16)
    red8 -= (red8 & 0x80) << 1
    blue += (red_to_blue.astype(np.int32) * red8) >> 5
    blue &= 0xFF
    a &= np.uint32(0xFF00FF00)
    a |= (red.astype(np.uint32) << 16) | blue.astype(np.uint32)


def _inv_subtract_green(px: np.ndarray) -> None:
    g = (px >> 8) & 0xFF
    r = ((px >> 16) + g) & 0xFF
    b = (px + g) & 0xFF
    px &= np.uint32(0xFF00FF00)
    px |= (r << 16) | b


# ------------------------------------------------------------- decoder


def _decode_entropy_image(br: _Bits, w: int, h: int, level0: bool):
    """libwebp's DecodeImageStream: [transforms if level0], color
    cache bit(s), [meta prefix bit if level0], prefix-code groups,
    then the LZ77/literal/cache pixel loop. Returns the flat ARGB
    array plus (for level0) the transform list and decode width."""
    transforms = []
    if level0:
        xsize = w
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise WebpError("duplicate transform")
            seen.add(ttype)
            if ttype == _T_PREDICTOR:
                bits = br.read(3) + 2
                sub, _ = _decode_entropy_image(
                    br, _subsample(xsize, bits), _subsample(h, bits), False
                )
                transforms.append((_T_PREDICTOR, bits, sub))
            elif ttype == _T_COLOR:
                bits = br.read(3) + 2
                sub, _ = _decode_entropy_image(
                    br, _subsample(xsize, bits), _subsample(h, bits), False
                )
                transforms.append((_T_COLOR, bits, sub))
            elif ttype == _T_SUBTRACT_GREEN:
                transforms.append((_T_SUBTRACT_GREEN,))
            else:
                table_size = br.read(8) + 1
                pal, _ = _decode_entropy_image(br, table_size, 1, False)
                # palette entries are component-delta coded
                pal = np.cumsum(
                    pal.view(np.uint8).reshape(-1, 4).astype(np.uint32), axis=0
                ).astype(np.uint8) .reshape(-1, 4)
                pal = pal.copy().view(np.uint32).reshape(-1)
                if table_size <= 2:
                    wbits = 3
                elif table_size <= 4:
                    wbits = 2
                elif table_size <= 16:
                    wbits = 1
                else:
                    wbits = 0
                transforms.append(
                    (_T_COLOR_INDEXING, table_size, wbits, pal, xsize)
                )
                xsize = _subsample(xsize, wbits)
        w = xsize

    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits > 11:
        raise WebpError(f"bad color cache bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta = None
    meta_w = 0
    hbits = 0
    n_groups = 1
    if level0 and br.read(1):
        hbits = br.read(3) + 2
        meta_w = _subsample(w, hbits)
        meta, _ = _decode_entropy_image(br, meta_w, _subsample(h, hbits), False)
        meta = (((meta >> 8) & 0xFFFF)).astype(np.int64)  # (r<<8)|g
        n_groups = int(meta.max()) + 1

    green_alpha = 256 + 24 + cache_size
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(br, green_alpha),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 40),
            )
        )

    npix = w * h
    px = np.zeros(npix, dtype=np.uint32)
    cache = [0] * cache_size
    g_code, r_code, b_code, a_code, d_code = groups[0]
    pos = 0
    while pos < npix:
        if meta is not None:
            x = pos % w
            y = pos // w
            g_code, r_code, b_code, a_code, d_code = groups[
                int(meta[(y >> hbits) * meta_w + (x >> hbits)])
            ]
        s = g_code.decode(br)
        if s < 256:
            # stream order is green, red, blue, alpha (spec 5.2.1) —
            # must be explicit, an or-chain would read alpha first
            red = r_code.decode(br)
            blue = b_code.decode(br)
            alpha = a_code.decode(br)
            pix = (alpha << 24) | (red << 16) | (s << 8) | blue
            px[pos] = pix
            pos += 1
            if cache_size:
                cache[(0x1E35A7BD * pix & 0xFFFFFFFF) >> (32 - cache_bits)] = pix
        elif s < 280:
            length = _lz77_value(br, s - 256)
            dist = _plane_distance(_lz77_value(br, d_code.decode(br)), w)
            if dist > pos or pos + length > npix:
                raise WebpError("backward reference out of range")
            if cache_size:
                for _ in range(length):
                    pix = int(px[pos - dist])
                    px[pos] = pix
                    pos += 1
                    cache[(0x1E35A7BD * pix & 0xFFFFFFFF) >> (32 - cache_bits)] = pix
            elif dist >= length:
                px[pos : pos + length] = px[pos - dist : pos - dist + length]
                pos += length
            else:
                for _ in range(length):
                    px[pos] = px[pos - dist]
                    pos += 1
        else:
            if s - 280 >= cache_size:
                raise WebpError("color cache index out of range")
            px[pos] = cache[s - 280]
            pos += 1

    if not level0:
        return px, w
    return px, (transforms, w)


def _apply_inverse_transforms(px, transforms, w, h):
    for t in reversed(transforms):
        if t[0] == _T_SUBTRACT_GREEN:
            _inv_subtract_green(px)
        elif t[0] == _T_PREDICTOR:
            _inv_predictor(px, w, h, t[1], t[2])
        elif t[0] == _T_COLOR:
            _inv_color_transform(px, w, h, t[1], t[2])
        else:
            _, table_size, wbits, pal, full_w = t
            bpp = 8 >> wbits
            packed = px.reshape(h, -1)
            idx = np.zeros((h, full_w), dtype=np.int64)
            green = (packed >> 8) & 0xFF
            per = 1 << wbits
            for k in range(per):
                cols = np.arange(k, full_w, per)
                idx[:, cols] = (
                    green[:, : len(cols)] >> (k * bpp)
                ) & ((1 << bpp) - 1)
            if int(idx.max()) >= table_size:
                raise WebpError("palette index out of range")
            px = pal[idx.reshape(-1)].astype(np.uint32)
            w = full_w
    return px, w


def decode_vp8l(payload: bytes) -> np.ndarray:
    """Decode a raw VP8L chunk payload to an (h, w, 4) uint8 ARGB
    image in RGBA channel order."""
    if len(payload) < 5 or payload[0] != 0x2F:
        raise WebpError("bad VP8L signature")
    br = _Bits(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-used hint (informative)
    if br.read(3) != 0:
        raise WebpError("unsupported VP8L version")
    px, (transforms, dec_w) = _decode_entropy_image(br, w, h, True)
    px, out_w = _apply_inverse_transforms(px, transforms, dec_w, h)
    if out_w != w:
        raise WebpError("decoded width mismatch")
    rgba = np.empty((h, w, 4), dtype=np.uint8)
    flat = px.reshape(h, w)
    rgba[:, :, 0] = (flat >> 16) & 0xFF
    rgba[:, :, 1] = (flat >> 8) & 0xFF
    rgba[:, :, 2] = flat & 0xFF
    rgba[:, :, 3] = (flat >> 24) & 0xFF
    return rgba


def _unfilter_alpha(plane: np.ndarray, method: int) -> np.ndarray:
    """Invert the WebP alpha-plane filter (libwebp dsp/filters.c):
    1=horizontal, 2=vertical, 3=gradient. Row 0 always unfilters
    horizontally with a zero seed, matching libwebp."""
    h, w = plane.shape
    out = np.zeros((h, w), dtype=np.int32)
    src = plane.astype(np.int32)
    for r in range(h):
        if r == 0 or method == 1:
            pred0 = 0 if r == 0 else int(out[r - 1, 0])
            out[r, 0] = (src[r, 0] + pred0) & 0xFF
            for c in range(1, w):
                out[r, c] = (src[r, c] + out[r, c - 1]) & 0xFF
        elif method == 2:
            out[r] = (src[r] + out[r - 1]) & 0xFF
        else:  # gradient
            out[r, 0] = (src[r, 0] + out[r - 1, 0]) & 0xFF
            for c in range(1, w):
                pred = int(out[r, c - 1]) + int(out[r - 1, c]) - int(out[r - 1, c - 1])
                out[r, c] = (src[r, c] + min(255, max(0, pred))) & 0xFF
    return out.astype(np.uint8)


def decode_alph(payload: bytes, w: int, h: int) -> np.ndarray:
    """Decode a WebP ``ALPH`` chunk to an (h, w) uint8 alpha plane.

    Header byte: bits 0-1 compression (0 raw, 1 VP8L-coded as the
    green channel of a headerless lossless stream), bits 2-3 filter,
    bits 4-5 preprocessing (informative)."""
    if not payload:
        raise WebpError("empty ALPH chunk")
    method = payload[0] & 3
    filt = (payload[0] >> 2) & 3
    if method == 0:
        if len(payload) < 1 + w * h:
            raise WebpError("raw ALPH chunk too short")
        plane = (
            np.frombuffer(payload[1 : 1 + w * h], dtype=np.uint8)
            .reshape(h, w)
            .copy()
        )
    elif method == 1:
        br = _Bits(payload[1:])
        px, (transforms, dec_w) = _decode_entropy_image(br, w, h, True)
        px, out_w = _apply_inverse_transforms(px, transforms, dec_w, h)
        if out_w != w:
            raise WebpError("ALPH decoded width mismatch")
        plane = ((px.reshape(h, w) >> 8) & 0xFF).astype(np.uint8)
    else:
        raise WebpError(f"reserved ALPH compression method {method}")
    if filt:
        plane = _unfilter_alpha(plane, filt)
    return plane


def decode_webp(data: bytes) -> np.ndarray:
    """RIFF container walk → VP8L (lossless) or VP8 (lossy intra)
    decode, with VP8X/ALPH alpha. Returns (h, w, 3) uint8 when fully
    opaque, else (h, w, 4) RGBA — mirroring what the reference's
    ``DynamicImage`` exposes for tiles."""
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise WebpError("not a WebP (RIFF) container")
    pos = 12
    vp8_body = None
    alph_body = None
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            rgba = decode_vp8l(body)
            if bool((rgba[:, :, 3] == 255).all()):
                return rgba[:, :, :3].copy()
            return rgba
        if fourcc == b"VP8 ":
            vp8_body = body
            break  # ALPH precedes VP8 in a VP8X container
        if fourcc == b"ALPH":
            alph_body = body
        pos += 8 + size + (size & 1)
    if vp8_body is None:
        raise WebpError("no VP8/VP8L chunk in WebP container")
    from georaster_spark.sources.vp8 import decode_vp8, vp8_to_rgb

    y, u, v = decode_vp8(vp8_body)
    rgb = vp8_to_rgb(y, u, v)
    if alph_body is None:
        return rgb
    h, w = rgb.shape[:2]
    alpha = decode_alph(alph_body, w, h)
    return np.dstack([rgb, alpha])


# ------------------------------------------------------------- encoder


def _huffman_lengths(freqs: list[int], limit: int) -> list[int]:
    """Code lengths from frequencies, depth-limited to ``limit`` with
    an exact Kraft repair (decoder requires complete codes)."""
    import heapq

    active = [(f, i) for i, f in enumerate(freqs) if f > 0]
    n = len(active)
    lengths = [0] * len(freqs)
    if n == 0:
        raise WebpError("empty alphabet")
    if n == 1:
        lengths[active[0][1]] = 1
        return lengths
    heap = [(f, i, (i,)) for f, i in active]
    heapq.heapify(heap)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            lengths[s] += 1
        heapq.heappush(heap, (f1 + f2, min(s1[0], s2[0]), s1 + s2))
    # cap and repair Kraft to exactly 1
    target = 1 << limit
    for i, l in enumerate(lengths):
        if l > limit:
            lengths[i] = limit
    by_depth = sorted((i for i, l in enumerate(lengths) if l), key=lambda i: -lengths[i])
    kraft = sum(1 << (limit - lengths[i]) for i in by_depth)
    while kraft > target:  # over-subscribed: push a shallow code deeper
        i = max(
            (i for i in by_depth if lengths[i] < limit), key=lambda i: lengths[i]
        )
        kraft -= 1 << (limit - lengths[i])
        lengths[i] += 1
        kraft += 1 << (limit - lengths[i])
    while kraft < target:  # under-subscribed: promote the deepest that fits
        gap = target - kraft
        cand = [i for i in by_depth if lengths[i] > 1 and (1 << (limit - lengths[i])) <= gap]
        i = max(cand, key=lambda i: lengths[i])
        kraft += 1 << (limit - lengths[i])
        lengths[i] -= 1
    return lengths


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    nz = sorted((l, s) for s, l in enumerate(lengths) if l)
    codes = {}
    code = 0
    prev_len = 0
    for l, s in nz:
        code <<= l - prev_len
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


class _Writer:
    """Channel writer: simple code for <=2 distinct symbols, normal
    (code-length-coded) canonical code otherwise."""

    def __init__(self, bw: _BitW, freqs: list[int]):
        self.bw = bw
        used = [s for s, f in enumerate(freqs) if f > 0]
        if len(used) <= 2 and (not used or max(used) <= 255):
            bw.write(1, 1)  # simple
            if not used:
                used = [0]
            bw.write(1, len(used) - 1)
            first = used[0]
            if first <= 1:
                bw.write(1, 0)
                bw.write(1, first)
            else:
                bw.write(1, 1)
                bw.write(8, first)
            if len(used) == 2:
                bw.write(8, used[1])
            lengths = [0] * len(freqs)
            for s in used:
                lengths[s] = 1
            if len(used) == 1:
                self.codes = {used[0]: (0, 0)}
            else:
                self.codes = {used[0]: (0, 1), used[1]: (1, 1)}
            return
        bw.write(1, 0)  # normal
        lengths = _huffman_lengths(freqs, 15)
        max_symbol = max(s for s, l in enumerate(lengths) if l) + 1
        emit = lengths[:max_symbol]
        clc_freq = [0] * 19
        for l in emit:
            clc_freq[l] += 1
        clc_lengths = (
            _huffman_lengths(clc_freq, 7)
            if sum(1 for f in clc_freq if f) > 1
            else [1 if f else 0 for f in clc_freq]
        )
        bw.write(4, 15)  # num_code_lengths = 19
        for sym in _CLC_ORDER:
            bw.write(3, clc_lengths[sym])
        clc_codes = _canonical_codes(clc_lengths)
        if sum(1 for f in clc_freq if f) == 1:
            clc_codes = {next(s for s, f in enumerate(clc_freq) if f): (0, 0)}
        # explicit max_symbol so trailing zeros need not be coded
        bw.write(1, 1)
        nbits_sel = 0
        while (max_symbol - 2) >> (2 + 2 * nbits_sel):
            nbits_sel += 1
        bw.write(3, nbits_sel)
        bw.write(2 + 2 * nbits_sel, max_symbol - 2)
        for l in emit:
            c, n = clc_codes[l]
            bw.write(n, _rev(c, n))
        self.codes = _canonical_codes(lengths)

    def emit(self, sym: int) -> None:
        c, n = self.codes[sym]
        self.bw.write(n, _rev(c, n))


def _encode_image_stream(bw: _BitW, flat: np.ndarray, level0: bool) -> None:
    """Literals-only entropy image: no color cache, no meta codes,
    one prefix-code group."""
    bw.write(1, 0)  # no color cache
    if level0:
        bw.write(1, 0)  # no meta prefix codes
    g = ((flat >> 8) & 0xFF).astype(np.int64)
    r = ((flat >> 16) & 0xFF).astype(np.int64)
    b = (flat & 0xFF).astype(np.int64)
    a = ((flat >> 24) & 0xFF).astype(np.int64)
    g_freq = np.bincount(g, minlength=256 + 24).tolist()
    writers = [
        _Writer(bw, g_freq),
        _Writer(bw, np.bincount(r, minlength=256).tolist()),
        _Writer(bw, np.bincount(b, minlength=256).tolist()),
        _Writer(bw, np.bincount(a, minlength=256).tolist()),
        _Writer(bw, [1] + [0] * 39),  # distance code: unused, 1 symbol
    ]
    n_px = len(flat)
    if n_px < 2048:
        # tiny images (media thumbnails): the per-call numpy setup of
        # the bulk path costs more than it saves — plain loop
        write = bw.write
        chans = [(w_.codes, ch) for w_, ch in zip(writers[:4], (g, r, b, a))]
        for i in range(n_px):
            for codes, ch in chans:
                c, n = codes[int(ch[i])]
                write(n, _rev(c, n))
        return
    # emit all pixels in one vectorized pass: per-channel lookup
    # tables of (bit-reversed code, length), interleaved in stream
    # order g,r,b,a, then a single bulk bit append
    vals = np.zeros(4 * n_px, np.int64)
    lens = np.zeros(4 * n_px, np.int64)
    for k, (writer, ch) in enumerate(zip(writers[:4], (g, r, b, a))):
        size = max(writer.codes) + 1
        tv = np.zeros(size, np.int64)
        tl = np.zeros(size, np.int64)
        for sym, (c, n) in writer.codes.items():
            tv[sym] = _rev(c, n)
            tl[sym] = n
        vals[k::4] = tv[ch]
        lens[k::4] = tl[ch]
    bw.write_many(vals, lens)


def _to_argb(arr: np.ndarray) -> tuple[np.ndarray, int, int, bool]:
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise WebpError("encoder expects uint8 pixels")
    if arr.ndim == 2:
        h, w = arr.shape
        a = np.full((h, w), 255, np.uint32)
        r = g = b = arr.astype(np.uint32)
        has_alpha = False
    elif arr.ndim == 3 and arr.shape[2] in (3, 4):
        h, w = arr.shape[:2]
        r = arr[:, :, 0].astype(np.uint32)
        g = arr[:, :, 1].astype(np.uint32)
        b = arr[:, :, 2].astype(np.uint32)
        if arr.shape[2] == 4:
            a = arr[:, :, 3].astype(np.uint32)
            has_alpha = bool((a != 255).any())
        else:
            a = np.full((h, w), 255, np.uint32)
            has_alpha = False
    else:
        raise WebpError(f"unsupported array shape {arr.shape}")
    return ((a << 24) | (r << 16) | (g << 8) | b).reshape(-1), w, h, has_alpha


def encode_webp_lossless(arr: np.ndarray, method: str = "subtract-green") -> bytes:
    """Encode to a valid VP8L WebP. ``method`` selects the transform
    exercised: "literal" (none), "subtract-green", "predictor"
    (mode-2/top residuals), or "palette" (color indexing, bundled
    when <=16 colors). Output decodes bit-exactly by any conformant
    VP8L decoder; compression is secondary to validity."""
    flat, w, h, has_alpha = _to_argb(arr)
    bw = _BitW()
    bw.write(14, w - 1)
    bw.write(14, h - 1)
    bw.write(1, 1 if has_alpha else 0)
    bw.write(3, 0)  # version

    if method == "literal":
        bw.write(1, 0)
        _encode_image_stream(bw, flat, True)
    elif method == "subtract-green":
        bw.write(1, 1)
        bw.write(2, _T_SUBTRACT_GREEN)
        bw.write(1, 0)  # no more transforms
        g = (flat >> 8) & 0xFF
        r = ((flat >> 16) - g) & 0xFF
        b = (flat - g) & 0xFF
        res = (flat & np.uint32(0xFF00FF00)) | (r << 16) | b
        _encode_image_stream(bw, res, True)
    elif method == "predictor":
        bits = 4  # 16x16 blocks
        bw.write(1, 1)
        bw.write(2, _T_PREDICTOR)
        bw.write(3, bits - 2)
        tw, th = _subsample(w, bits), _subsample(h, bits)
        # every block predicts TOP (mode 2); edges follow the spec's
        # fixed rules which the residual computation must mirror
        img = flat.reshape(h, w).astype(np.int64)
        pred = np.empty_like(img)
        pred[0, 0] = 0xFF000000
        pred[0, 1:] = img[0, :-1]  # top row: L
        pred[1:, :] = img[:-1, :]  # everything else: T (col 0 rule = T too)
        res = np.zeros_like(img, dtype=np.uint32)
        for sh in (24, 16, 8, 0):
            res |= ((((img >> sh) - (pred >> sh)) & 0xFF) << sh).astype(np.uint32)
        modes = np.full(tw * th, (0xFF << 24) | (2 << 8), np.uint32)
        _encode_image_stream(bw, modes, False)
        bw.write(1, 0)  # no more transforms
        _encode_image_stream(bw, res.reshape(-1), True)
    elif method == "color":
        # one global ColorTransformElement (block covers the image):
        # green_to_red=37, green_to_blue=-20 (0xec), red_to_blue=15.
        # Encoder applies the exact inverse of the decode rule:
        # stored_red = red - (g2r*int8(g))>>5, stored_blue =
        # blue - (g2b*int8(g))>>5 - (r2b*int8(red))>>5 (mod 256).
        bits = 9  # 512-px blocks; tw = th = 1 for tile-sized images
        g2r, g2b, r2b = 37, -20, 15
        bw.write(1, 1)
        bw.write(2, _T_COLOR)
        bw.write(3, bits - 2)
        tw, th = _subsample(w, bits), _subsample(h, bits)
        cte_pix = (0xFF << 24) | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8) | (g2r & 0xFF)
        _encode_image_stream(bw, np.full(tw * th, cte_pix, np.uint32), False)
        bw.write(1, 0)  # no more transforms
        green = ((flat >> 8) & 0xFF).astype(np.int16)
        green -= (green & 0x80) << 1
        red = ((flat >> 16) & 0xFF).astype(np.int32)
        blue = (flat & 0xFF).astype(np.int32)
        red8 = ((flat >> 16) & 0xFF).astype(np.int16)
        red8 -= (red8 & 0x80) << 1
        s_red = (red - ((g2r * green.astype(np.int32)) >> 5)) & 0xFF
        s_blue = (
            blue
            - ((g2b * green.astype(np.int32)) >> 5)
            - ((r2b * red8.astype(np.int32)) >> 5)
        ) & 0xFF
        res = (flat & np.uint32(0xFF00FF00)) | (
            s_red.astype(np.uint32) << 16
        ) | s_blue.astype(np.uint32)
        _encode_image_stream(bw, res, True)
    elif method == "palette":
        colors, inverse = np.unique(flat, return_inverse=True)
        if len(colors) > 256:
            raise WebpError("palette method needs <=256 distinct colors")
        size = len(colors)
        bw.write(1, 1)
        bw.write(2, _T_COLOR_INDEXING)
        bw.write(8, size - 1)
        comp = colors.view(np.uint8).reshape(-1, 4).astype(np.int64)
        delta = np.vstack([comp[:1], (comp[1:] - comp[:-1]) & 0xFF]).astype(np.uint8)
        pal_stream = delta.copy().view(np.uint32).reshape(-1)
        _encode_image_stream(bw, pal_stream, False)
        bw.write(1, 0)  # no more transforms
        wbits = 3 if size <= 2 else 2 if size <= 4 else 1 if size <= 16 else 0
        bpp = 8 >> wbits
        per = 1 << wbits
        packed_w = _subsample(w, wbits)
        idx = inverse.reshape(h, w).astype(np.uint32)
        green = np.zeros((h, packed_w), np.uint32)
        for k in range(per):
            cols = np.arange(k, w, per)
            green[:, : len(cols)] |= idx[:, cols] << (k * bpp)
        packed = (np.uint32(0xFF) << 24) | (green << 8)
        _encode_image_stream(bw, packed.reshape(-1), True)
    else:
        raise WebpError(f"unknown encode method {method!r}")

    payload = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
