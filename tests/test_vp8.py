"""Lossy-WebP (VP8 intra) decoder tests.

Three layers of evidence, strongest first:

1. A real libwebp-encoded golden (the 16x16 Python-logo WebP shipped
   in CPython's own test data, PSF licensed) embedded below: decodes
   through the public ``decode_webp`` API; the ALPH alpha plane must
   be byte-exact and the RGBA must match the pinned regression bytes
   (which were validated bit-exact at the YUV level against the
   system libwebp when pinned).
2. When the system libwebp is present, a randomized campaign:
   encode synthetic images with libwebp at assorted sizes/qualities,
   decode with this repo's pure-NumPy decoder, and require the
   reconstructed YUV planes to be BIT-EXACT against libwebp's own
   ``WebPDecodeYUV`` (loop filter, segmentation, skip flags, every
   intra mode included).
3. Deterministic hand-assembled bitstreams (sources/vp8_enc) with
   spec-computed expected pixels — no external decoder needed.
"""

from __future__ import annotations

import base64
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from georaster_spark.sources.vp8 import (  # noqa: E402
    BoolDecoder,
    Vp8Error,
    decode_vp8,
    idct4x4,
    iwht4x4,
    vp8_to_rgb,
)
from georaster_spark.sources.webp import decode_webp  # noqa: E402

# CPython test-data golden (Lib/test/test_email/data/python.webp, PSF
# license): 16x16 lossy VP8 + VP8L-compressed ALPH alpha.
GOLDEN_WEBP = base64.b64decode(
    "UklGRqgBAABXRUJQVlA4WAoAAAAQAAAADwAADwAAQUxQSMMAAAABJ6KokSTleucY"
    "X+ffKpmImP90cY3gJjDi4Yt3MsjBEVyDKzDosHgVjnhRNcEIDAJPkqBqsFUZHNa2"
    "bUYvTsZ2PLbtd/uvKa4hov9J0f2PkPe6REkkGzolkTTzFG0Ox9PlFiD0CxS+kOGD"
    "txoynjaCfx0pfk52CPuInrOR75lzRugygtv4zEiy90UwfSD9NheMITJWLaXWayO8"
    "XeOlWRXVnIGk2W6WdYoYMQ+KqixQNPowgt+6a1BSKbUtz+lUFAoBAAAAVlA4IL4A"
    "AACQAgCdASoQABAAAwA0JbACdDBPCIUMfAMdCCz96AD+/XSg/QKbH4r3Q3ycN/bS"
    "DK/T/zVo4u6nvclvG/SqxWOuup+XhN9BojvaW+Tv+MvxvX/hr/o/5Qns9LtmX/+q"
    "Kdl/yWznhuasl7nkxvSTI4xf3Y85VSB/lU/8Ofj/b9JrA+ifvIOYZm2x1RP/dhfm"
    "sf5diuSfR7+z+r/+HR3zEo/+XM/B+vkYw73Pzx+ROaAB/ZoBSzEs3rzZe6qsAAAA"
)

# Pinned expected RGBA of the golden — YUV validated bit-exact
# against libwebp.so at pin time; RGB is this repo's BT.601
# conversion (within +-2 of libwebp's).
GOLDEN_RGBA = np.frombuffer(
    base64.b64decode(
        "DgAAABQGAAAAAAAAAAALAGOAmq9WgqjtTIa2/0SAtv89can/PGmX9z9mfpIABhIL"
        "AAEKAwEAAAALAAAAEAAAAA0EAAAHAgAAAwkQAAAFFwBcf53/x/f//0iEtv8+fLH/"
        "O3Oj/ztrkf8/Z3z/AAYRKAABCQsBAAAACgAAAA4AAAAAAw4AAAgWAAAFGgAADisA"
        "VoOq/0uDsv9Cg7j/MXSl/zh3mP84b4T/Pmh4/wAGEEEAAgUVAAAAAAYAAAAKAAAA"
        "AA0oAGKDoH5gh6igVIGnoU2BraNAe6ynMXGnqjFzoao4eJP/OW+A/0Nld/8ABAhI"
        "AAMAGAUCAAAHAAAACgAAAF6Ntb1ZirP/U4aw/1GFsf9Ifqz/P3io/zp1pv89eKP/"
        "MWmI/zhkff9MX3j/AQQASOHdl//g2H732M6Ngg8EAApSjL3/T4i4/0uDsv9GfKr/"
        "P3Og/zxumf88bZf/N2eN/ztqiP9EZXj/XWNotgUAAEPu3XL/7Nld/+HNeO0XBAAk"
        "Soi8/0iEtv9Hf63/SHql/0Rwl/8+ZYj/SGuK/0prh/9CY3z3S15gtg0HAE/iynGI"
        "/dtV//rVTf/symz/IwIAPUaEvf9FgLX/RXqp/0p2lv9Lana2GS4tXAAMA0wABQBI"
        "AAUARxAPAEHWwGVr8MxL9//bQf//00P/8Mlk/yUCAEZFf733RHu0/0+Arv9EZ3aq"
        "CRYATtzbmabx65738OOM//PegP/42mr//tVL///SNv/6zCb/9Ms1/+XFWfchBwBH"
        "SHex10x4q/9FbZL/HTUyW+bln7P66nv//+tv//ziXP//4FL//91I///YOP//1S7/"
        "/9Ys//TRPv/XvFrCIAoAQVNym29QbI73T2l7/wADAEv/9Zn//+tm//viTf//40b/"
        "/N5C//jXOv/30jL/888s//XXMv/ly0X/tJpUehcAADQAARsIAAQWIQABBDwAAwA1"
        "9eR9//PXR//63T//6MspqujMMankyTSp38QzqdrAOKnPuD2puKJHeSEJAEEXAAAg"
        "AAAJAgACBwkAAAATBQIAEvDacv/73E//+91G//rdR//x1Uz/6tJU/9fEU/8VAwBB"
        "FQIANREAACwQAAAeEAAACwAAAAAAAgAAAAAAAAUBAADp1HT38tVY//LWVP/x1lb/"
        "69Fc////lv/UyXD3EQkAQAoAABwHAAoJCAACBQkAAAEAAQAAAAQAAAAAAAABAQAA"
        "3cyATOTMa8zjzG3348xt/+fQcP/ZyXDYlJFIewACADsAAAASAAAJAAQABgAHAAUA"
        "AAIAAAAEAAAAAAAAAAIAABMEAAgbBQAdGQUANRkFAEIcBwBHFgcARQkIADgABAAf"
        "AAAACAAACQACAAgABgAIAA=="
    ),
    dtype=np.uint8,
).reshape(16, 16, 4)


def test_idct_dc_only():
    # DC-only block: every output pixel is (dc + 4) >> 3
    assert (idct4x4([33] + [0] * 15) == (33 + 4) >> 3).all()
    assert (idct4x4([-33] + [0] * 15) == (-33 + 4) >> 3).all()


def test_iwht_dc_only():
    # WHT distributes dc across the 16 outputs with (x + 3) >> 3
    out = iwht4x4([66] + [0] * 15)
    assert (out == (66 + 3) >> 3).all()


def test_bool_decoder_roundtrip():
    from georaster_spark.sources.vp8_enc import BoolEncoder

    rng = np.random.RandomState(5)
    probs = [int(p) for p in rng.choice([1, 15, 77, 128, 200, 254], 500)]
    bits = [int(b) for b in rng.randint(0, 2, 500)]
    e = BoolEncoder()
    for b, p in zip(bits, probs):
        e.bool_(b, p)
    data = e.flush()
    d = BoolDecoder(data)
    assert [d.bool_(p) for p in probs] == bits


def test_golden_decode_rgba():
    rgba = decode_webp(GOLDEN_WEBP)
    assert rgba.shape == (16, 16, 4)
    assert np.array_equal(rgba, GOLDEN_RGBA)


def test_golden_yuv_planes():
    # decode the raw VP8 chunk: stable plane stats (spec-determined)
    import struct

    pos, vp8 = 12, None
    while pos + 8 <= len(GOLDEN_WEBP):
        tag = GOLDEN_WEBP[pos : pos + 4]
        (size,) = struct.unpack("<I", GOLDEN_WEBP[pos + 4 : pos + 8])
        if tag == b"VP8 ":
            vp8 = GOLDEN_WEBP[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    y, u, v = decode_vp8(vp8)
    assert y.shape == (16, 16) and u.shape == (8, 8) and v.shape == (8, 8)
    # plane checksums pinned while the YUV was verified bit-exact
    # against the system libwebp
    assert int(y.astype(np.int64).sum()) == 25314
    assert int(u.astype(np.int64).sum()) == 7349
    assert int(v.astype(np.int64).sum()) == 8176


def test_inter_frame_rejected():
    bad = bytearray(GOLDEN_WEBP)
    # find the VP8 chunk and set the inter-frame bit of the tag
    i = bytes(bad).find(b"VP8 ") + 8
    bad[i] |= 1
    with pytest.raises(Vp8Error, match="inter"):
        decode_webp(bytes(bad))


def _libwebp():
    from vp8_ref import load_libwebp

    return load_libwebp()


@pytest.mark.skipif(_libwebp() is None, reason="system libwebp absent")
def test_yuv_bit_exact_vs_libwebp_campaign():
    from vp8_ref import decode_yuv, encode_rgb, vp8_chunk

    lw = _libwebp()
    rng = np.random.RandomState(4242)
    sizes = [(1, 1), (3, 5), (16, 16), (15, 17), (33, 47), (64, 48)]
    for h, w in sizes:
        for kind in range(3):
            if kind == 0:
                img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
            elif kind == 1:
                img = (128 + rng.randint(-25, 25, (h, w, 1))).astype(
                    np.uint8
                ).repeat(3, 2)
            else:
                yy, xx = np.mgrid[0:h, 0:w]
                img = np.stack(
                    [
                        (128 + 90 * np.sin(xx / 5)).astype(np.uint8),
                        (128 + 90 * np.cos(yy / 7)).astype(np.uint8),
                        ((xx + 2 * yy) % 256).astype(np.uint8),
                    ],
                    axis=2,
                )
            q = float(rng.choice([8, 25, 50, 75, 90, 97]))
            data = encode_rgb(lw, img, q)
            ry, ru, rv = decode_yuv(lw, data)
            my, mu, mv = decode_vp8(vp8_chunk(data))
            for a, b in ((my, ry), (mu, ru), (mv, rv)):
                assert np.array_equal(a, b), (h, w, kind, q)


@pytest.mark.skipif(_libwebp() is None, reason="system libwebp absent")
def test_builder_streams_match_libwebp():
    """Hand-assembled streams (all ten 4x4 modes, big coefficients,
    segmentation, skip flags, loop filter levels) must decode
    identically by this repo's decoder and by libwebp."""
    from georaster_spark.sources.vp8_enc import build_keyframe, wrap_webp
    from vp8_ref import decode_yuv

    lw = _libwebp()
    rng = np.random.RandomState(77)

    def blk():
        l = [0] * 16
        for _ in range(int(rng.randint(0, 5))):
            l[int(rng.randint(0, 16))] = int(rng.randint(-9, 10))
        return l

    def mb(seg):
        ym = int(rng.choice([0, 1, 2, 3, 4]))
        m = {
            "ymode": ym,
            "uvmode": int(rng.randint(0, 4)),
            "segment": seg,
            "skip": False,
            "y": [blk() for _ in range(16)],
            "u": [blk() for _ in range(4)],
            "v": [blk() for _ in range(4)],
        }
        if ym == 4:
            m["sub"] = [
                [int(rng.randint(0, 10)) for _ in range(4)] for _ in range(4)
            ]
        else:
            m["y2"] = blk()
        return m

    for trial in range(3):
        mbs = [mb(int(rng.randint(0, 4))) for _ in range(9)]
        payload = build_keyframe(
            48, 48, mbs, qi=25,
            filter_level=int(rng.choice([0, 15, 40, 63])),
            sharpness=int(rng.choice([0, 3])),
            segments={"abs": True, "quant": [40, 30, 20, 10],
                      "lf": [63, 15, 30, 3]},
        )
        ry, ru, rv = decode_yuv(lw, wrap_webp(payload))
        my, mu, mv = decode_vp8(payload)
        for a, b in ((my, ry), (mu, ru), (mv, rv)):
            assert np.array_equal(a, b), trial


def test_builder_flat_dc16_spec_math():
    """No external decoder: a single DC16 macroblock whose Y2 block
    carries dc level 3 at qi=8 must reconstruct, by the spec's exact
    integer math, to a uniform luma of 129:
    y2 quant dc = 2 * dc_q[8] = 22 -> coeff 66; iWHT spreads
    (66 + 3) >> 3 = 8 to every sub-block dc; DC16 prediction with no
    neighbours is 128; idct dc-only adds (8 + 4) >> 3 = 1."""
    from georaster_spark.sources.vp8_enc import build_keyframe, wrap_webp

    z = [0] * 16
    mb = {
        "ymode": 0, "uvmode": 0,
        "y2": [3] + [0] * 15,
        "y": [list(z) for _ in range(16)],
        "u": [list(z) for _ in range(4)],
        "v": [list(z) for _ in range(4)],
    }
    payload = build_keyframe(16, 16, [mb], qi=8)
    y, u, v = decode_vp8(payload)
    assert (y == 129).all() and (u == 128).all() and (v == 128).all()
    rgb = vp8_to_rgb(y, u, v)
    assert (rgb == 132).all()


@pytest.mark.skipif(_libwebp() is None, reason="system libwebp absent")
def test_multi_partition_and_simple_filter_vs_libwebp():
    """The two decoder paths a real encoder rarely emits — 2/4/8
    token partitions (per-MB-row partition selection) and the SIMPLE
    loop filter — must decode bit-exact against libwebp on
    hand-assembled streams."""
    from georaster_spark.sources.vp8_enc import build_keyframe, wrap_webp
    from vp8_ref import decode_yuv

    lw = _libwebp()
    rng = np.random.RandomState(31)

    def mb():
        ym = int(rng.choice([0, 1, 2, 3, 4]))
        def blk():
            l = [0] * 16
            for _ in range(int(rng.randint(0, 5))):
                l[int(rng.randint(0, 16))] = int(rng.randint(-8, 9))
            return l
        m = {"ymode": ym, "uvmode": int(rng.randint(0, 4)),
             "y": [blk() for _ in range(16)],
             "u": [blk() for _ in range(4)],
             "v": [blk() for _ in range(4)]}
        if ym == 4:
            m["sub"] = [[int(rng.randint(0, 10)) for _ in range(4)]
                        for _ in range(4)]
        else:
            m["y2"] = blk()
        return m

    for n_parts in (2, 4, 8):
        payload = build_keyframe(48, 64, [mb() for _ in range(12)], qi=25,
                                 filter_level=20, n_partitions=n_parts)
        ry, ru, rv = decode_yuv(lw, wrap_webp(payload))
        my, mu, mv = decode_vp8(payload)
        for a, b in ((my, ry), (mu, ru), (mv, rv)):
            assert np.array_equal(a, b), ("partitions", n_parts)
    for lvl in (15, 63):
        payload = build_keyframe(48, 48, [mb() for _ in range(9)], qi=25,
                                 filter_level=lvl, simple_filter=True)
        ry, ru, rv = decode_yuv(lw, wrap_webp(payload))
        my, mu, mv = decode_vp8(payload)
        for a, b in ((my, ry), (mu, ru), (mv, rv)):
            assert np.array_equal(a, b), ("simple", lvl)


def _forward_alpha_filter(alpha: np.ndarray, method: int) -> np.ndarray:
    """Spec's forward alpha filtering (tests only): residual = value
    - pred with row 0 horizontal and column 0 vertical seeds."""
    h, w = alpha.shape
    a = alpha.astype(np.int32)
    out = np.zeros_like(a)
    for r in range(h):
        for c in range(w):
            if r == 0 and c == 0:
                pred = 0
            elif r == 0:
                pred = a[0, c - 1]
            elif c == 0:
                pred = a[r - 1, 0]
            elif method == 1:
                pred = a[r, c - 1]
            elif method == 2:
                pred = a[r - 1, c]
            else:
                pred = min(255, max(0, a[r, c - 1] + a[r - 1, c]
                                    - a[r - 1, c - 1]))
            out[r, c] = (a[r, c] - pred) & 0xFF
    return out.astype(np.uint8)


@pytest.mark.skipif(_libwebp() is None, reason="system libwebp absent")
def test_alph_filters_vs_libwebp():
    """Raw ALPH planes pre-filtered with methods 1-3 (horizontal /
    vertical / gradient): this repo's unfilter must agree with
    libwebp AND reproduce the intended plane exactly."""
    import ctypes
    import struct as _s

    from georaster_spark.sources.vp8_enc import build_keyframe

    lw = _libwebp()
    lw.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    z = [0] * 16
    mb = {"ymode": 0, "uvmode": 0, "y2": [2] + [0] * 15,
          "y": [list(z) for _ in range(16)],
          "u": [list(z) for _ in range(4)],
          "v": [list(z) for _ in range(4)]}
    payload = build_keyframe(16, 16, [mb], qi=8)
    rng = np.random.RandomState(3)
    alpha = np.kron(rng.randint(0, 256, (4, 4)), np.ones((4, 4))).astype(
        np.uint8
    )
    for method in (1, 2, 3):
        filt = _forward_alpha_filter(alpha, method).tobytes()
        vp8x = bytes([0x10, 0, 0, 0]) + (15).to_bytes(3, "little") * 2
        body = b"VP8X" + _s.pack("<I", len(vp8x)) + vp8x
        alph = bytes([method << 2]) + filt
        body += b"ALPH" + _s.pack("<I", len(alph)) + alph
        if len(alph) & 1:
            body += b"\x00"
        body += b"VP8 " + _s.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            body += b"\x00"
        data = b"RIFF" + _s.pack("<I", 4 + len(body)) + b"WEBP" + body
        W = ctypes.c_int()
        H = ctypes.c_int()
        p = lw.WebPDecodeRGBA(data, len(data), ctypes.byref(W), ctypes.byref(H))
        assert p, ("libwebp rejected the built container", method)
        ref = np.ctypeslib.as_array(p, (16, 16, 4)).copy()
        mine = decode_webp(data)
        assert np.array_equal(mine[:, :, 3], alpha), method
        assert np.array_equal(mine[:, :, 3], ref[:, :, 3]), method


@pytest.mark.skipif(_libwebp() is None, reason="system libwebp absent")
def test_rgba_alpha_roundtrip_vs_libwebp():
    """Real WebPEncodeRGBA output (exercises raw AND VP8L-compressed
    ALPH, with the encoder's own filter choice): the lossless alpha
    channel must decode byte-exact."""
    import ctypes

    lw = _libwebp()
    lw.WebPEncodeRGBA.restype = ctypes.c_size_t
    lw.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    rng = np.random.RandomState(8)
    grad = np.tile(np.arange(40, dtype=np.uint8) * 6, (40, 1))
    for alpha in (grad, grad.T.copy(),
                  rng.randint(0, 256, (40, 40)).astype(np.uint8)):
        rgba = np.dstack(
            [rng.randint(0, 256, (40, 40, 3)).astype(np.uint8), alpha]
        )
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = lw.WebPEncodeRGBA(rgba.tobytes(), 40, 40, 160, 75.0,
                              ctypes.byref(out))
        data = bytes(np.ctypeslib.as_array(out, (n,)))
        lw.WebPFree(out)
        dec = decode_webp(data)
        assert dec.shape == (40, 40, 4)
        assert np.array_equal(dec[:, :, 3], alpha)
