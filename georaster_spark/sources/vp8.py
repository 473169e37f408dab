"""Pure-stdlib/NumPy VP8 intra-frame (key-frame) decoder — RFC 6386.

Lossy WebP still images are, by construction, a single VP8 key frame,
and PMTiles raster tiles are standalone WebP stills — so an
intra-only decoder covers every lossy-WebP tile the reference engine
can read through the ``image`` crate's format sniffing
(``/root/reference/src/pmtiles.rs:30-32``).  Inter frames (golden /
altref reference buffers, motion vectors) do not occur in stills and
are rejected loudly.

Scope and fidelity:

- Bool (arithmetic) decoder, frame header, segmentation, per-MB
  intra mode parsing, DCT/WHT token decoding with the full context
  model, dequantization, the exact integer inverse transforms, all
  intra predictors (16x16, chroma, and the ten 4x4 B_PRED modes),
  and the normal + simple loop filters — all per RFC 6386.
- Output is the reconstructed YUV 4:2:0 exactly as the spec's
  reconstruction produces it; RGB conversion (BT.601 studio swing,
  bilinear chroma upsampling) happens in :func:`vp8_to_rgb`.
- Decoding is scalar Python over one image — fine for tiles (a
  256x256 tile is 1024 macroblocks); at corpus scale blobs decode
  inside Arrow-batched kernels across executors, so throughput comes
  from partition parallelism, not from this inner loop.

Constant tables live in :mod:`vp8_tables` with RFC section citations.
"""

from __future__ import annotations

import struct

import numpy as np

from georaster_spark.sources.vp8_tables import (
    AC_QLOOKUP,
    B_DC_PRED,
    B_HE_PRED,
    B_PRED,
    B_TM_PRED,
    B_VE_PRED,
    BMODE_TREE,
    CAT_BASE,
    CAT_PROBS,
    COEF_BANDS,
    COEF_TREE,
    COEF_UPDATE_PROBS,
    DC_PRED,
    DC_QLOOKUP,
    DCT_0,
    DCT_1,
    DCT_4,
    DCT_CAT1,
    DCT_EOB,
    DEFAULT_COEF_PROBS,
    H_PRED,
    KF_BMODE_PROB,
    KF_UV_MODE_PROB,
    KF_YMODE_PROB,
    KF_YMODE_TREE,
    MODE_TO_BMODE,
    TM_PRED,
    UV_MODE_TREE,
    V_PRED,
    ZIGZAG,
)


class Vp8Error(ValueError):
    """Malformed or out-of-scope (inter-frame) VP8 payload."""


# ------------------------------------------------------------- §7 bool


class BoolDecoder:
    """RFC 6386 §7.3 boolean entropy decoder.

    ``value`` holds a 16-bit window (invariant: value < range << 8),
    refilled a byte at a time; reads past the end of the partition
    supply zero bytes, as the spec's reference decoder does.
    """

    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes):
        self.data = data
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.value = (b0 << 8) | b1
        self.pos = 2
        self.range = 255
        self.bit_count = 0

    def bool_(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big_split = split << 8
        if self.value >= big_split:
            ret = 1
            self.range -= split
            self.value -= big_split
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                self.pos += 1
                self.value |= nxt
        return ret

    def literal(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.bool_(128)
        return v

    def signed_literal(self, nbits: int) -> int:
        v = self.literal(nbits)
        return -v if self.bool_(128) else v

    def flag_signed(self, nbits: int) -> int:
        """Optional update field: flag bit, then sign-magnitude value."""
        return self.signed_literal(nbits) if self.bool_(128) else 0

    def tree(self, tree: tuple, probs, start: int = 0) -> int:
        i = start
        while True:
            node = tree[i + self.bool_(probs[i >> 1])]
            if node <= 0:
                return -node
            i = node


# ------------------------------------------------------ §14 transforms


def iwht4x4(coeffs) -> np.ndarray:
    """Inverse Walsh-Hadamard for the Y2 block (§14.3); exact ints."""
    ip = list(coeffs)
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[i] - ip[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 3]
        b1 = tmp[r + 1] + tmp[r + 2]
        c1 = tmp[r + 1] - tmp[r + 2]
        d1 = tmp[r] - tmp[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return np.array(out, dtype=np.int32).reshape(4, 4)


_COSPI8SQRT2MINUS1 = 20091
_SINPI8SQRT2 = 35468


def idct4x4(coeffs) -> np.ndarray:
    """The VP8 4x4 inverse "DCT" (§14.4); exact integer butterflies."""
    ip = list(coeffs)
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[8 + i]
        b1 = ip[i] - ip[8 + i]
        t1 = (ip[4 + i] * _SINPI8SQRT2) >> 16
        t2 = ip[12 + i] + ((ip[12 + i] * _COSPI8SQRT2MINUS1) >> 16)
        c1 = t1 - t2
        t1 = ip[4 + i] + ((ip[4 + i] * _COSPI8SQRT2MINUS1) >> 16)
        t2 = (ip[12 + i] * _SINPI8SQRT2) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 2]
        b1 = tmp[r] - tmp[r + 2]
        t1 = (tmp[r + 1] * _SINPI8SQRT2) >> 16
        t2 = tmp[r + 3] + ((tmp[r + 3] * _COSPI8SQRT2MINUS1) >> 16)
        c1 = t1 - t2
        t1 = tmp[r + 1] + ((tmp[r + 1] * _COSPI8SQRT2MINUS1) >> 16)
        t2 = (tmp[r + 3] * _SINPI8SQRT2) >> 16
        d1 = t1 + t2
        out[r] = (a1 + d1 + 4) >> 3
        out[r + 3] = (a1 - d1 + 4) >> 3
        out[r + 1] = (b1 + c1 + 4) >> 3
        out[r + 2] = (b1 - c1 + 4) >> 3
    return np.array(out, dtype=np.int32).reshape(4, 4)


# -------------------------------------------------- §12 intra predictors


def _clip255(a: np.ndarray) -> np.ndarray:
    return np.clip(a, 0, 255)


def predict_block(mode: int, size: int, above: np.ndarray, left: np.ndarray,
                  above_left: int, above_right: np.ndarray | None,
                  have_above: bool, have_left: bool) -> np.ndarray:
    """16x16 / 8x8 whole-plane intra prediction (§12.2) for DC/V/H/TM.

    ``above``/``left`` carry the synthetic 127/129 edges when the
    neighbour is off-frame; ``have_*`` drive the DC averaging rule.
    """
    a = above.astype(np.int32)
    l = left.astype(np.int32)
    if mode == DC_PRED:
        if have_above and have_left:
            dc = (int(a.sum()) + int(l.sum()) + size) >> _dc_shift(size, 2)
        elif have_above:
            dc = (int(a.sum()) + (size >> 1)) >> _dc_shift(size, 1)
        elif have_left:
            dc = (int(l.sum()) + (size >> 1)) >> _dc_shift(size, 1)
        else:
            dc = 128
        return np.full((size, size), dc, dtype=np.int32)
    if mode == V_PRED:
        return np.tile(a, (size, 1))
    if mode == H_PRED:
        return np.tile(l.reshape(size, 1), (1, size))
    if mode == TM_PRED:
        return _clip255(l.reshape(size, 1) + a.reshape(1, size) - above_left)
    raise Vp8Error(f"bad whole-block mode {mode}")


def _dc_shift(size: int, nsources: int) -> int:
    base = {16: 4, 8: 3}[size]
    return base + (1 if nsources == 2 else 0)


def _avg2(a: int, b: int) -> int:
    return (a + b + 1) >> 1


def _avg3(a: int, b: int, c: int) -> int:
    return (a + 2 * b + c + 2) >> 2


def predict_b(mode: int, a: np.ndarray, l: np.ndarray, tl: int,
              ar: np.ndarray) -> np.ndarray:
    """4x4 sub-block intra prediction, all ten B modes (§12.3).

    ``a``: 4 above pixels, ``ar``: 4 above-right, ``l``: 4 left,
    ``tl``: above-left — all already resolved by the caller.  The
    diagonal modes use the spec's explicit per-pixel averages over
    ``pp = [L3, L2, L1, L0, TL, A0, A1, A2, A3]`` / ``t = A ++ AR``.
    """
    A = [int(x) for x in a]
    L = [int(x) for x in l]
    AR = [int(x) for x in ar]
    pp = [L[3], L[2], L[1], L[0], tl] + A
    t = A + AR
    p = np.zeros((4, 4), dtype=np.int32)
    if mode == B_DC_PRED:
        p[:] = (sum(A) + sum(L) + 4) >> 3
    elif mode == B_TM_PRED:
        p = _clip255(
            np.array(L, dtype=np.int32).reshape(4, 1)
            + np.array(A, dtype=np.int32).reshape(1, 4)
            - tl
        )
    elif mode == B_VE_PRED:
        ctx = [tl] + A + [AR[0]]
        row = [_avg3(ctx[i], ctx[i + 1], ctx[i + 2]) for i in range(4)]
        p[:] = np.array(row, dtype=np.int32)
    elif mode == B_HE_PRED:
        ctx = [tl] + L
        col = [_avg3(ctx[i], ctx[i + 1], ctx[i + 2]) for i in range(3)]
        col.append(_avg3(L[2], L[3], L[3]))
        p[:] = np.array(col, dtype=np.int32).reshape(4, 1)
    elif mode == 6:  # B_LD_PRED (down-left)
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    p[r, c] = _avg3(t[i], t[i + 1], t[i + 2])
                else:
                    p[r, c] = _avg3(t[6], t[7], t[7])
    elif mode == 4:  # B_RD_PRED (down-right)
        for r in range(4):
            for c in range(4):
                i = c - r + 4
                p[r, c] = _avg3(pp[i - 1], pp[i], pp[i + 1])
    elif mode == 5:  # B_VR_PRED (vertical-right)
        p[0] = [_avg2(pp[4], pp[5]), _avg2(pp[5], pp[6]),
                _avg2(pp[6], pp[7]), _avg2(pp[7], pp[8])]
        p[1] = [_avg3(pp[3], pp[4], pp[5]), _avg3(pp[4], pp[5], pp[6]),
                _avg3(pp[5], pp[6], pp[7]), _avg3(pp[6], pp[7], pp[8])]
        p[2] = [_avg3(pp[2], pp[3], pp[4]), p[0, 0], p[0, 1], p[0, 2]]
        p[3] = [_avg3(pp[1], pp[2], pp[3]), p[1, 0], p[1, 1], p[1, 2]]
    elif mode == 7:  # B_VL_PRED (vertical-left)
        p[0] = [_avg2(t[0], t[1]), _avg2(t[1], t[2]),
                _avg2(t[2], t[3]), _avg2(t[3], t[4])]
        p[1] = [_avg3(t[0], t[1], t[2]), _avg3(t[1], t[2], t[3]),
                _avg3(t[2], t[3], t[4]), _avg3(t[3], t[4], t[5])]
        p[2] = [p[0, 1], p[0, 2], p[0, 3], _avg3(t[4], t[5], t[6])]
        p[3] = [p[1, 1], p[1, 2], p[1, 3], _avg3(t[5], t[6], t[7])]
    elif mode == 8:  # B_HD_PRED (horizontal-down)
        p[0] = [_avg2(pp[3], pp[4]), _avg3(pp[3], pp[4], pp[5]),
                _avg3(pp[4], pp[5], pp[6]), _avg3(pp[5], pp[6], pp[7])]
        p[1] = [_avg2(pp[2], pp[3]), _avg3(pp[2], pp[3], pp[4]),
                p[0, 0], p[0, 1]]
        p[2] = [_avg2(pp[1], pp[2]), _avg3(pp[1], pp[2], pp[3]),
                p[1, 0], p[1, 1]]
        p[3] = [_avg2(pp[0], pp[1]), _avg3(pp[0], pp[1], pp[2]),
                p[2, 0], p[2, 1]]
    elif mode == 9:  # B_HU_PRED (horizontal-up)
        p[0] = [_avg2(L[0], L[1]), _avg3(L[0], L[1], L[2]),
                _avg2(L[1], L[2]), _avg3(L[1], L[2], L[3])]
        p[1] = [p[0, 2], p[0, 3], _avg2(L[2], L[3]),
                _avg3(L[2], L[3], L[3])]
        p[2] = [p[1, 2], p[1, 3], L[3], L[3]]
        p[3] = [L[3], L[3], L[3], L[3]]
    else:
        raise Vp8Error(f"bad b mode {mode}")
    return p


# ------------------------------------------------------ §15 loop filter


def _u2s(v: int) -> int:
    return v - 128


def _s2u(v: int) -> int:
    return min(255, max(0, v + 128))


def _c(v: int) -> int:
    return min(127, max(-128, v))


def _filter_mask(I: int, E: int, p3, p2, p1, p0, q0, q1, q2, q3) -> bool:
    return (
        abs(p3 - p2) <= I and abs(p2 - p1) <= I and abs(p1 - p0) <= I
        and abs(q1 - q0) <= I and abs(q2 - q1) <= I and abs(q3 - q2) <= I
        and abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= E
    )


def _hev(thresh: int, p1, p0, q0, q1) -> bool:
    return abs(p1 - p0) > thresh or abs(q1 - q0) > thresh


def _common_adjust(use_outer: bool, px: list) -> int:
    # px = [p1, p0, q0, q1] as unsigned; adjusted in place
    P1, P0, Q0, Q1 = (_u2s(v) for v in px)
    a = _c((_c(P1 - Q1) if use_outer else 0) + 3 * (Q0 - P0))
    f1 = _c(a + 4) >> 3
    f2 = _c(a + 3) >> 3
    px[2] = _s2u(Q0 - f1)
    px[1] = _s2u(P0 + f2)
    return f1


def _subblock_filter(hev_t: int, I: int, E: int, v: list) -> None:
    p3, p2, p1, p0, q0, q1, q2, q3 = v
    if not _filter_mask(I, E, p3, p2, p1, p0, q0, q1, q2, q3):
        return
    hv = _hev(hev_t, p1, p0, q0, q1)
    px = [p1, p0, q0, q1]
    a = _common_adjust(hv, px)
    if not hv:
        a = (a + 1) >> 1
        px[3] = _s2u(_u2s(px[3]) - a)
        px[0] = _s2u(_u2s(px[0]) + a)
    v[2], v[3], v[4], v[5] = px


def _mb_filter(hev_t: int, I: int, E: int, v: list) -> None:
    p3, p2, p1, p0, q0, q1, q2, q3 = v
    if not _filter_mask(I, E, p3, p2, p1, p0, q0, q1, q2, q3):
        return
    if _hev(hev_t, p1, p0, q0, q1):
        px = [p1, p0, q0, q1]
        _common_adjust(True, px)
        v[2], v[3], v[4], v[5] = px
        return
    P2, P1, P0, Q0, Q1, Q2 = (_u2s(x) for x in (p2, p1, p0, q0, q1, q2))
    w = _c(_c(P1 - Q1) + 3 * (Q0 - P0))
    a = _c((27 * w + 63) >> 7)
    Q0, P0 = Q0 - a, P0 + a
    a = _c((18 * w + 63) >> 7)
    Q1, P1 = Q1 - a, P1 + a
    a = _c((9 * w + 63) >> 7)
    Q2, P2 = Q2 - a, P2 + a
    v[1], v[2], v[3], v[4], v[5], v[6] = (
        _s2u(P2), _s2u(P1), _s2u(P0), _s2u(Q0), _s2u(Q1), _s2u(Q2)
    )


def _filter_edge(plane: np.ndarray, x0: int, y0: int, n: int, vertical: bool,
                 mb_edge: bool, hev_t: int, I: int, E: int) -> None:
    """Filter one edge of length ``n`` at (x0, y0) on ``plane``.

    ``vertical``: the EDGE is vertical (pixels left/right of column
    x0 are filtered, for each of n rows). Operates on 8 taps centered
    on the edge.
    """
    f = _mb_filter if mb_edge else _subblock_filter
    if vertical:
        for r in range(n):
            row = plane[y0 + r]
            v = [int(row[x0 + i]) for i in range(-4, 4)]
            f(hev_t, I, E, v)
            for i in range(-4, 4):
                row[x0 + i] = v[i + 4]
    else:
        for ccol in range(n):
            col = plane[:, x0 + ccol]
            v = [int(col[y0 + i]) for i in range(-4, 4)]
            f(hev_t, I, E, v)
            for i in range(-4, 4):
                col[y0 + i] = v[i + 4]


def _simple_filter_edge(plane: np.ndarray, x0: int, y0: int, n: int,
                        vertical: bool, E: int) -> None:
    for k in range(n):
        if vertical:
            sl = plane[y0 + k]
            idx = x0
            p1, p0, q0, q1 = (int(sl[idx - 2]), int(sl[idx - 1]),
                              int(sl[idx]), int(sl[idx + 1]))
        else:
            sl = plane[:, x0 + k]
            idx = y0
            p1, p0, q0, q1 = (int(sl[idx - 2]), int(sl[idx - 1]),
                              int(sl[idx]), int(sl[idx + 1]))
        if abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= E:
            px = [p1, p0, q0, q1]
            _common_adjust(True, px)
            sl[idx - 1] = px[1]
            sl[idx] = px[2]


# ------------------------------------------------------------- decoder


class _Quant:
    __slots__ = ("y1dc", "y1ac", "y2dc", "y2ac", "uvdc", "uvac")


def _quant_for(qi: int, d: dict) -> _Quant:
    def look(table, base, delta):
        return table[min(127, max(0, base + delta))]

    q = _Quant()
    q.y1dc = look(DC_QLOOKUP, qi, d["ydc"])
    q.y1ac = look(AC_QLOOKUP, qi, 0)
    q.y2dc = look(DC_QLOOKUP, qi, d["y2dc"]) * 2
    q.y2ac = look(AC_QLOOKUP, qi, d["y2ac"]) * 155 // 100
    if q.y2ac < 8:
        q.y2ac = 8
    q.uvdc = look(DC_QLOOKUP, qi, d["uvdc"])
    if q.uvdc > 132:
        q.uvdc = 132
    q.uvac = look(AC_QLOOKUP, qi, d["uvac"])
    return q


def decode_vp8(data: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a VP8 key-frame payload to (Y, U, V) uint8 planes.

    Y is (h, w); U and V are the 4:2:0 half-resolution planes.
    Raises :class:`Vp8Error` on inter frames or malformed data.
    """
    if len(data) < 10:
        raise Vp8Error("VP8 payload too short")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise Vp8Error("inter frame: only key frames occur in WebP stills")
    part0_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise Vp8Error("bad VP8 start code")
    (wraw,) = struct.unpack("<H", data[6:8])
    (hraw,) = struct.unpack("<H", data[8:10])
    w, h = wraw & 0x3FFF, hraw & 0x3FFF
    if w == 0 or h == 0:
        raise Vp8Error("zero frame dimension")
    if 10 + part0_size > len(data):
        raise Vp8Error("first partition overruns payload")
    bd = BoolDecoder(data[10 : 10 + part0_size])

    bd.literal(1)  # color space (must be 0, but tolerate)
    bd.literal(1)  # clamping type

    # §9.3 segmentation
    seg_enabled = bd.bool_(128)
    update_map = False
    seg_tree_probs = [255, 255, 255]
    seg_abs = False
    seg_q = [0, 0, 0, 0]
    seg_lf = [0, 0, 0, 0]
    if seg_enabled:
        update_map = bool(bd.bool_(128))
        update_data = bd.bool_(128)
        if update_data:
            seg_abs = bool(bd.bool_(128))
            for i in range(4):
                seg_q[i] = bd.flag_signed(7)
            for i in range(4):
                seg_lf[i] = bd.flag_signed(6)
        if update_map:
            for i in range(3):
                seg_tree_probs[i] = bd.literal(8) if bd.bool_(128) else 255

    # §9.4 loop filter header
    filter_type_simple = bool(bd.bool_(128))
    filter_level = bd.literal(6)
    sharpness = bd.literal(3)
    lf_delta_enabled = bool(bd.bool_(128))
    ref_lf_delta = [0, 0, 0, 0]
    mode_lf_delta = [0, 0, 0, 0]
    if lf_delta_enabled:
        if bd.bool_(128):  # mode_ref_lf_delta_update
            for i in range(4):
                if bd.bool_(128):
                    ref_lf_delta[i] = bd.signed_literal(6)
            for i in range(4):
                if bd.bool_(128):
                    mode_lf_delta[i] = bd.signed_literal(6)

    # §9.5 token partitions
    nparts = 1 << bd.literal(2)
    part_area = data[10 + part0_size :]
    sizes_bytes = 3 * (nparts - 1)
    if len(part_area) < sizes_bytes:
        raise Vp8Error("truncated partition size table")
    parts = []
    off = sizes_bytes
    for i in range(nparts):
        if i < nparts - 1:
            sz = (part_area[3 * i] | (part_area[3 * i + 1] << 8)
                  | (part_area[3 * i + 2] << 16))
        else:
            sz = len(part_area) - off
        if off + sz > len(part_area) or sz < 0:
            raise Vp8Error("token partition overruns payload")
        parts.append(BoolDecoder(part_area[off : off + sz]))
        off += sz

    # §9.6 quantizer
    yac_qi = bd.literal(7)
    deltas = {
        "ydc": bd.flag_signed(4),
        "y2dc": bd.flag_signed(4),
        "y2ac": bd.flag_signed(4),
        "uvdc": bd.flag_signed(4),
        "uvac": bd.flag_signed(4),
    }
    seg_quant = []
    for s in range(4):
        if seg_enabled:
            qi = seg_q[s] if seg_abs else yac_qi + seg_q[s]
        else:
            qi = yac_qi
        seg_quant.append(_quant_for(min(127, max(0, qi)), deltas))

    bd.bool_(128)  # refresh entropy probs (key frame: no effect on decode)

    # §13.4 token probability updates
    coef_probs = [
        [[list(DEFAULT_COEF_PROBS[i][j][k]) for k in range(3)] for j in range(8)]
        for i in range(4)
    ]
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l in range(11):
                    if bd.bool_(COEF_UPDATE_PROBS[i][j][k][l]):
                        coef_probs[i][j][k][l] = bd.literal(8)

    mb_no_skip = bd.bool_(128)
    prob_skip_false = bd.literal(8) if mb_no_skip else 0

    mb_w = (w + 15) >> 4
    mb_h = (h + 15) >> 4

    # Padded reconstruction planes: 8-pixel border on every side so the
    # loop filter's 8-tap window and the 127/129 intra edges never
    # bounds-check. Top border 127, left border 129, corner 127 (§12.2).
    P = 8
    yw, yh = mb_w * 16, mb_h * 16
    cw, ch = mb_w * 8, mb_h * 8
    Y = np.empty((yh + 2 * P, yw + 2 * P), dtype=np.uint8)
    U = np.empty((ch + 2 * P, cw + 2 * P), dtype=np.uint8)
    V = np.empty((ch + 2 * P, cw + 2 * P), dtype=np.uint8)
    for pl in (Y, U, V):
        pl[: P, :] = 127
        pl[:, : P] = 129
        pl[P - 1, : P] = 127  # above-left corner of (0, 0) reads 127

    # Per-MB info needed by the loop-filter pass.
    mb_info = np.zeros((mb_h, mb_w, 3), dtype=np.int32)  # (bpred, inner, seg)

    # Entropy contexts: above per MB column, left per MB (reset each row).
    above_y = np.zeros((mb_w, 4), dtype=np.int8)
    above_u = np.zeros((mb_w, 2), dtype=np.int8)
    above_v = np.zeros((mb_w, 2), dtype=np.int8)
    above_y2 = np.zeros(mb_w, dtype=np.int8)
    # Sub-block mode rows for kf_bmode context (B_DC for off-frame).
    above_bmode = np.full((mb_w, 4), B_DC_PRED, dtype=np.int8)

    zero16 = [0] * 16

    def decode_coeffs(p: BoolDecoder, block_type: int, ctx: int, start: int,
                      dcq: int, acq: int):
        """§13: one block's tokens → dequantized coeff list + context.

        The returned flag is the entropy context for neighbours:
        whether ANY token was decoded before EOB (position > start),
        exactly libvpx's ``a[0] = l[0] = (c > !type)`` — not merely
        whether a non-zero coefficient landed.
        """
        probs_t = coef_probs[block_type]
        coeffs = None
        n = start
        last_zero = False
        while n < 16:
            pr = probs_t[COEF_BANDS[n]][ctx]
            tok = p.tree(COEF_TREE, pr, start=2 if last_zero else 0)
            if tok == DCT_EOB:
                break
            if tok == DCT_0:
                ctx = 0
                last_zero = True
                n += 1
                continue
            last_zero = False
            if tok <= DCT_4:
                v = tok  # DCT_1..DCT_4 carry their value
            else:
                cat = tok - DCT_CAT1
                v = 0
                for cp in CAT_PROBS[cat]:
                    v = (v << 1) | p.bool_(cp)
                v += CAT_BASE[cat]
            ctx = 1 if v == 1 else 2
            if p.bool_(128):
                v = -v
            if coeffs is None:
                coeffs = list(zero16)
            coeffs[ZIGZAG[n]] = v * (dcq if n == 0 else acq)
            n += 1
        return coeffs, (1 if n > start else 0)

    for mb_y in range(mb_h):
        part = parts[mb_y % nparts]
        left_y = np.zeros(4, dtype=np.int8)
        left_u = np.zeros(2, dtype=np.int8)
        left_v = np.zeros(2, dtype=np.int8)
        left_y2 = 0
        left_bmode = np.full(4, B_DC_PRED, dtype=np.int8)
        for mb_x in range(mb_w):
            # ---- modes (first partition)
            seg = 0
            if seg_enabled and update_map:
                if bd.bool_(seg_tree_probs[0]):
                    seg = 2 + bd.bool_(seg_tree_probs[2])
                else:
                    seg = bd.bool_(seg_tree_probs[1])
            skip = bd.bool_(prob_skip_false) if mb_no_skip else 0
            ymode = bd.tree(KF_YMODE_TREE, KF_YMODE_PROB)
            if ymode == B_PRED:
                sub = np.empty((4, 4), dtype=np.int8)
                for r in range(4):
                    for c in range(4):
                        ab = above_bmode[mb_x][c] if r == 0 else sub[r - 1][c]
                        lf = (left_bmode[r] if c == 0 else sub[r][c - 1])
                        sub[r][c] = bd.tree(
                            BMODE_TREE, KF_BMODE_PROB[ab][lf]
                        )
            else:
                sub = np.full((4, 4), MODE_TO_BMODE[ymode], dtype=np.int8)
            uvmode = bd.tree(UV_MODE_TREE, KF_UV_MODE_PROB)

            # ---- residuals (token partition)
            q = seg_quant[seg]
            has_y2 = ymode != B_PRED
            y_blocks = [[None] * 4 for _ in range(4)]
            u_blocks = [[None] * 2 for _ in range(2)]
            v_blocks = [[None] * 2 for _ in range(2)]
            y2 = None
            mb_nonzero = 0
            if skip:
                left_y[:] = 0
                above_y[mb_x][:] = 0
                left_u[:] = 0
                above_u[mb_x][:] = 0
                left_v[:] = 0
                above_v[mb_x][:] = 0
                if has_y2:
                    left_y2 = 0
                    above_y2[mb_x] = 0
            else:
                if has_y2:
                    ctx = int(above_y2[mb_x]) + left_y2
                    y2c, nz = decode_coeffs(part, 1, ctx, 0, q.y2dc, q.y2ac)
                    above_y2[mb_x] = nz
                    left_y2 = nz
                    mb_nonzero |= nz
                    y2 = iwht4x4(y2c or zero16) if y2c else None
                ytype = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                for r in range(4):
                    for c in range(4):
                        ctx = int(above_y[mb_x][c]) + int(left_y[r])
                        coeffs, nz = decode_coeffs(
                            part, ytype, ctx, first, q.y1dc, q.y1ac
                        )
                        above_y[mb_x][c] = nz
                        left_y[r] = nz
                        mb_nonzero |= nz
                        y_blocks[r][c] = coeffs
                for blocks, above_c, left_c in (
                    (u_blocks, above_u, left_u),
                    (v_blocks, above_v, left_v),
                ):
                    for r in range(2):
                        for c in range(2):
                            ctx = int(above_c[mb_x][c]) + int(left_c[r])
                            coeffs, nz = decode_coeffs(
                                part, 2, ctx, 0, q.uvdc, q.uvac
                            )
                            above_c[mb_x][c] = nz
                            left_c[r] = nz
                            mb_nonzero |= nz
                            blocks[r][c] = coeffs

            # ---- reconstruction
            x0, y0 = P + 16 * mb_x, P + 16 * mb_y
            have_above = mb_y > 0
            have_left = mb_x > 0
            if ymode != B_PRED:
                above = Y[y0 - 1, x0 : x0 + 16]
                left = Y[y0 : y0 + 16, x0 - 1]
                al = int(Y[y0 - 1, x0 - 1])
                pred = predict_block(
                    ymode, 16, above, left, al, None, have_above, have_left
                )
                recon = pred.copy()
                for r in range(4):
                    for c in range(4):
                        coeffs = y_blocks[r][c]
                        dc = int(y2[r, c]) if y2 is not None else 0
                        if coeffs is None and dc == 0:
                            continue
                        cl = coeffs or list(zero16)
                        if y2 is not None:
                            cl = [dc] + cl[1:]
                        res = idct4x4(cl)
                        recon[4 * r : 4 * r + 4, 4 * c : 4 * c + 4] += res
                Y[y0 : y0 + 16, x0 : x0 + 16] = _clip255(recon).astype(np.uint8)
            else:
                # 4x4 sub-block prediction interleaved with reconstruction.
                # Above-right of the MB: from the above MB row; for the
                # last MB column (rows > 0) libvpx's border extension
                # replicates the rightmost above pixel.
                if mb_x == mb_w - 1 and mb_y > 0:
                    mb_ar = np.full(4, Y[y0 - 1, x0 + 15], dtype=np.uint8)
                else:
                    mb_ar = Y[y0 - 1, x0 + 16 : x0 + 20].copy()
                for r in range(4):
                    for c in range(4):
                        bx, by = x0 + 4 * c, y0 + 4 * r
                        a = Y[by - 1, bx : bx + 4].copy()
                        l = Y[by : by + 4, bx - 1].copy()
                        tl = int(Y[by - 1, bx - 1])
                        if c == 3:
                            # sub-blocks 3/7/11/15 share the MB's
                            # above-right row (§12.3): for r > 0 those
                            # pixels are not yet reconstructed.
                            ar = mb_ar
                        else:
                            ar = Y[by - 1, bx + 4 : bx + 8].copy()
                        pred = predict_b(int(sub[r][c]), a, l, tl, ar)
                        coeffs = y_blocks[r][c]
                        if coeffs is not None:
                            pred = pred + idct4x4(coeffs)
                        Y[by : by + 4, bx : bx + 4] = _clip255(pred).astype(
                            np.uint8
                        )
            # chroma
            cx0, cy0 = P + 8 * mb_x, P + 8 * mb_y
            for plane, blocks in ((U, u_blocks), (V, v_blocks)):
                above = plane[cy0 - 1, cx0 : cx0 + 8]
                left = plane[cy0 : cy0 + 8, cx0 - 1]
                al = int(plane[cy0 - 1, cx0 - 1])
                pred = predict_block(
                    uvmode, 8, above, left, al, None, have_above, have_left
                )
                recon = pred.copy()
                for r in range(2):
                    for c in range(2):
                        coeffs = blocks[r][c]
                        if coeffs is None:
                            continue
                        res = idct4x4(coeffs)
                        recon[4 * r : 4 * r + 4, 4 * c : 4 * c + 4] += res
                plane[cy0 : cy0 + 8, cx0 : cx0 + 8] = _clip255(recon).astype(
                    np.uint8
                )

            mb_info[mb_y, mb_x, 0] = 1 if ymode == B_PRED else 0
            mb_info[mb_y, mb_x, 1] = 1 if (mb_nonzero or ymode == B_PRED) else 0
            mb_info[mb_y, mb_x, 2] = seg
            left_bmode = sub[:, 3].copy()
            above_bmode[mb_x] = sub[3, :].copy()

    # ---- §15 loop filter
    if filter_level > 0:
        _loop_filter(
            Y, U, V, P, mb_w, mb_h, mb_info, filter_level, sharpness,
            filter_type_simple, seg_enabled, seg_abs, seg_lf,
            lf_delta_enabled, ref_lf_delta, mode_lf_delta,
        )

    y_out = Y[P : P + h, P : P + w].copy()
    u_out = U[P : P + ((h + 1) >> 1), P : P + ((w + 1) >> 1)].copy()
    v_out = V[P : P + ((h + 1) >> 1), P : P + ((w + 1) >> 1)].copy()
    return y_out, u_out, v_out


def _loop_filter(Y, U, V, P, mb_w, mb_h, mb_info, filter_level, sharpness,
                 simple, seg_enabled, seg_abs, seg_lf, lf_delta_enabled,
                 ref_lf_delta, mode_lf_delta) -> None:
    """§15.1/15.2 frame-level filtering, MB raster order."""
    for mb_y in range(mb_h):
        for mb_x in range(mb_w):
            bpred, inner, seg = mb_info[mb_y, mb_x]
            level = filter_level
            if seg_enabled:
                level = seg_lf[seg] if seg_abs else level + seg_lf[seg]
            if lf_delta_enabled:
                level += ref_lf_delta[0]  # keyframe: INTRA_FRAME
                if bpred:
                    level += mode_lf_delta[0]
            level = min(63, max(0, level))
            if level == 0:
                continue
            interior = level
            if sharpness:
                interior >>= 2 if sharpness > 4 else 1
                if interior > 9 - sharpness:
                    interior = 9 - sharpness
            if interior < 1:
                interior = 1
            # key-frame high-edge-variance thresholds (§15.2): the
            # lower boundary is 15, not 16
            hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
            mb_e = ((level + 2) * 2) + interior
            sb_e = (level * 2) + interior
            x0, y0 = P + 16 * mb_x, P + 16 * mb_y
            cx0, cy0 = P + 8 * mb_x, P + 8 * mb_y
            if simple:
                if mb_x > 0:
                    _simple_filter_edge(Y, x0, y0, 16, True, mb_e)
                if inner:
                    for c in (4, 8, 12):
                        _simple_filter_edge(Y, x0 + c, y0, 16, True, sb_e)
                if mb_y > 0:
                    _simple_filter_edge(Y, x0, y0, 16, False, mb_e)
                if inner:
                    for r in (4, 8, 12):
                        _simple_filter_edge(Y, x0, y0 + r, 16, False, sb_e)
                continue
            if mb_x > 0:
                _filter_edge(Y, x0, y0, 16, True, True, hev_t, interior, mb_e)
                _filter_edge(U, cx0, cy0, 8, True, True, hev_t, interior, mb_e)
                _filter_edge(V, cx0, cy0, 8, True, True, hev_t, interior, mb_e)
            if inner:
                for c in (4, 8, 12):
                    _filter_edge(Y, x0 + c, y0, 16, True, False, hev_t,
                                 interior, sb_e)
                _filter_edge(U, cx0 + 4, cy0, 8, True, False, hev_t,
                             interior, sb_e)
                _filter_edge(V, cx0 + 4, cy0, 8, True, False, hev_t,
                             interior, sb_e)
            if mb_y > 0:
                _filter_edge(Y, x0, y0, 16, False, True, hev_t, interior, mb_e)
                _filter_edge(U, cx0, cy0, 8, False, True, hev_t, interior, mb_e)
                _filter_edge(V, cx0, cy0, 8, False, True, hev_t, interior, mb_e)
            if inner:
                for r in (4, 8, 12):
                    _filter_edge(Y, x0, y0 + r, 16, False, False, hev_t,
                                 interior, sb_e)
                _filter_edge(U, cx0, cy0 + 4, 8, False, False, hev_t,
                             interior, sb_e)
                _filter_edge(V, cx0, cy0 + 4, 8, False, False, hev_t,
                             interior, sb_e)


# ----------------------------------------------------------- YUV → RGB


def vp8_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """BT.601 studio-swing YUV 4:2:0 → (h, w, 3) uint8 RGB.

    Chroma upsamples bilinearly with co-sited half-pel weights
    (9:3:3:1), matching libwebp's "fancy" layout; the final rounding
    is plain nearest, so pixel values may differ from libwebp by ±2 —
    the decoder's goldens are threshold (PSNR) based for this reason.
    """
    h, w = y.shape
    uf = _upsample2(u.astype(np.float64), h, w)
    vf = _upsample2(v.astype(np.float64), h, w)
    yf = y.astype(np.float64)
    c = 1.164 * (yf - 16.0)
    r = c + 1.596 * (vf - 128.0)
    g = c - 0.391 * (uf - 128.0) - 0.813 * (vf - 128.0)
    b = c + 2.018 * (uf - 128.0)
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def _upsample2(p: np.ndarray, h: int, w: int) -> np.ndarray:
    """2x bilinear upsample with 9:3:3:1 half-pel weights, then crop."""
    ph, pw = p.shape
    # pad with edge replication so every output pixel has 4 sources
    pp = np.pad(p, 1, mode="edge")
    out = np.empty((2 * ph, 2 * pw), dtype=np.float64)
    c = pp[1:-1, 1:-1]
    up, down = pp[:-2, 1:-1], pp[2:, 1:-1]
    lf, rt = pp[1:-1, :-2], pp[1:-1, 2:]
    ul, ur = pp[:-2, :-2], pp[:-2, 2:]
    dl, dr = pp[2:, :-2], pp[2:, 2:]
    out[0::2, 0::2] = (9 * c + 3 * up + 3 * lf + ul) / 16.0
    out[0::2, 1::2] = (9 * c + 3 * up + 3 * rt + ur) / 16.0
    out[1::2, 0::2] = (9 * c + 3 * down + 3 * lf + dl) / 16.0
    out[1::2, 1::2] = (9 * c + 3 * down + 3 * rt + dr) / 16.0
    return out[:h, :w]
