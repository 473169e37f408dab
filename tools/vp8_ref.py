"""ctypes bindings to the system libwebp — TEST ORACLE ONLY.

The production decoder (georaster_spark/sources/vp8.py) is pure
NumPy/stdlib; this module exists so tests can (a) encode arbitrary
synthetic images into real lossy WebP bitstreams and (b) obtain
libwebp's own YUV reconstruction for bit-exact comparison. Tests
using it must skip gracefully when the shared library is absent.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct

import numpy as np


def load_libwebp():
    """Return a CDLL for libwebp, or None when unavailable."""
    for name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            lw = ctypes.CDLL(name)
        except OSError:
            continue
        lw.WebPEncodeRGB.restype = ctypes.c_size_t
        lw.WebPEncodeRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lw.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
        lw.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        return lw
    return None


def encode_rgb(lw, rgb: np.ndarray, quality: float = 75.0) -> bytes:
    """RGB (h, w, 3) uint8 → lossy WebP bytes via libwebp."""
    h, w, _ = rgb.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lw.WebPEncodeRGB(
        np.ascontiguousarray(rgb).tobytes(), w, h, w * 3,
        ctypes.c_float(quality), ctypes.byref(out),
    )
    if n == 0:
        raise RuntimeError("libwebp encode failed")
    data = bytes(np.ctypeslib.as_array(out, (n,)))
    lw.WebPFree(out)
    return data


def decode_yuv(lw, data: bytes):
    """libwebp's reconstructed (Y, U, V) planes for a WebP payload."""
    W = ctypes.c_int()
    H = ctypes.c_int()
    pu = ctypes.POINTER(ctypes.c_uint8)()
    pv = ctypes.POINTER(ctypes.c_uint8)()
    st = ctypes.c_int()
    uvst = ctypes.c_int()
    py = lw.WebPDecodeYUV(
        data, len(data), ctypes.byref(W), ctypes.byref(H),
        ctypes.byref(pu), ctypes.byref(pv), ctypes.byref(st),
        ctypes.byref(uvst),
    )
    if not py:
        raise RuntimeError("libwebp decode failed")
    w, h = W.value, H.value
    y = np.ctypeslib.as_array(py, (h, st.value))[:, :w].copy()
    u = np.ctypeslib.as_array(pu, ((h + 1) // 2, uvst.value))[:, : (w + 1) // 2].copy()
    v = np.ctypeslib.as_array(pv, ((h + 1) // 2, uvst.value))[:, : (w + 1) // 2].copy()
    lw.WebPFree(py)
    return y, u, v


def vp8_chunk(data: bytes) -> bytes | None:
    """Extract the raw 'VP8 ' chunk payload from a WebP container."""
    off = 12
    while off + 8 <= len(data):
        tag = data[off : off + 4]
        (size,) = struct.unpack("<I", data[off + 4 : off + 8])
        if tag == b"VP8 ":
            return data[off + 8 : off + 8 + size]
        off += 8 + size + (size & 1)
    return None
