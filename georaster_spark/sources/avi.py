"""Pure-stdlib AVI (RIFF) container codec for Motion-JPEG video.

De-stubs the multimodal suite's video path for the one video coding
this container can honestly decode: MJPEG, where every frame is a
standalone baseline JPEG — handled by the engine's own
``sources/jpeg.py``. Inter-frame codecs (H.264/VP9/AV1) stay on the
disclosed digest stub; a motion-compensated decoder is out of scope
without a codec library.

The writer emits a minimal spec-correct file (hdrl with avih +
strl/strh/strf, then the movi LIST of ``00dc`` frame chunks); the
reader walks RIFF generically, so files with extra chunks, an
``idx1`` index, or ``00db`` (uncompressed-flagged) frame ids parse
the same.
"""

from __future__ import annotations

import struct

import numpy as np


class AviError(ValueError):
    """Raised for malformed, truncated, or non-MJPEG AVI bytes."""


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(
    frames: list[np.ndarray], usec_per_frame: int = 40000
) -> bytes:
    """Greyscale uint8 frames (all same h×w) → MJPEG AVI bytes. Each
    frame is encoded at quality 100 by ``sources/jpeg.py`` (exact for
    block-constant content — same argument as the JPEG media pairs)."""
    from georaster_spark.sources.jpeg import encode_jpeg

    if not frames:
        raise AviError("refusing to write an empty AVI")
    h, w = frames[0].shape[:2]
    blobs = [encode_jpeg(f, quality=100) for f in frames]
    avih = struct.pack(
        "<14I",
        usec_per_frame, 0, 0, 0, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, 1_000_000 // usec_per_frame or 1,
                      0, len(frames), 0, 0xFFFFFFFF - (1 << 31), 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", b) for b in blobs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(data: bytes):
    """AVI bytes → (frames: list of uint8 ndarrays, usec_per_frame).
    Frames decode through the stdlib JPEG codec; any frame that is
    not JPEG raises ``AviError`` (inter-frame codecs are out of
    scope, disclosed)."""
    from georaster_spark.sources.jpeg import decode_jpeg

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviError("not a RIFF/AVI stream")
    usec = None
    frames: list[np.ndarray] = []

    def walk(buf: bytes) -> None:
        nonlocal usec
        pos = 0
        while pos + 8 <= len(buf):
            fourcc = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body = buf[pos + 8 : pos + 8 + size]
            if len(body) != size:
                raise AviError("truncated chunk")
            if fourcc == b"LIST":
                walk(body[4:])
            elif fourcc == b"avih":
                usec = struct.unpack("<I", body[:4])[0]
            elif fourcc[2:] in (b"dc", b"db") and fourcc[:2].isdigit():
                if body[:3] != b"\xff\xd8\xff":
                    raise AviError(
                        "non-JPEG frame bytes — only MJPEG AVIs decode "
                        "(inter-frame codecs keep the disclosed stub)"
                    )
                frames.append(decode_jpeg(body))
            pos += 8 + size + (size & 1)

    walk(data[12:])
    if usec is None or not frames:
        raise AviError("missing avih header or frame chunks")
    return frames, int(usec)
