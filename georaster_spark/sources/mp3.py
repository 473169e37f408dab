"""MPEG audio (MP3) frame-level parser — pure stdlib.

Scope (disclosed): CONTAINER/FRAME parsing only — sync, MPEG
version/layer, bitrate/samplerate tables, frame-length chaining,
ID3v2 skip, and the Xing/Info VBR frame count — everything needed
for metadata (duration, rate, channel mode) from real bytes. PCM
synthesis (huffman spectrum + IMDCT + polyphase) stays a disclosed
stub: this container ships no MP3 decoder to validate sample output
against, and an unverifiable decoder is worse than an honest stub
(the VP8 decoder next door got a bit-exact oracle; audio did not).

The frame-length chain is the self-check: one wrong table entry or
length formula desyncs the walk and the parse fails loudly, and the
suite's golden (a real-world CBR file) must walk to EOF exactly.
"""

from __future__ import annotations

import struct


class Mp3Error(ValueError):
    """Not an MPEG audio stream, or a broken frame chain."""


# bitrate kbps tables, index 1..14 (0 = free, 15 = bad) — ISO 11172-3
# / 13818-3; rows keyed by (version_group, layer)
_BITRATES = {
    ("1", 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    ("1", 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    ("1", 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    ("2", 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    ("2", 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    ("2", 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}

_SAMPLERATES = {
    3: (44100, 48000, 32000),  # MPEG1
    2: (22050, 24000, 16000),  # MPEG2
    0: (11025, 12000, 8000),   # MPEG2.5
}

# samples per frame by (version_group, layer)
_SPF = {
    ("1", 1): 384, ("1", 2): 1152, ("1", 3): 1152,
    ("2", 1): 384, ("2", 2): 1152, ("2", 3): 576,
}


def _id3v2_size(data: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (syncsafe size), or 0."""
    if len(data) < 10 or data[:3] != b"ID3":
        return 0
    if data[5] & 0x10:  # footer present
        extra = 10
    else:
        extra = 0
    size = (
        (data[6] & 0x7F) << 21
        | (data[7] & 0x7F) << 14
        | (data[8] & 0x7F) << 7
        | (data[9] & 0x7F)
    )
    return 10 + size + extra


def _parse_header(b: bytes):
    """Decode one 4-byte frame header → dict, or None if not a sync."""
    if len(b) < 4:
        return None
    h = struct.unpack(">I", b[:4])[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    version_bits = (h >> 19) & 3
    layer_bits = (h >> 17) & 3
    if version_bits == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits  # 3->1, 2->2, 1->3
    vgroup = "1" if version_bits == 3 else "2"
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format unsupported / invalid
    bitrate = _BITRATES[(vgroup, layer)][br_idx] * 1000
    samplerate = _SAMPLERATES[version_bits][sr_idx]
    padding = (h >> 9) & 1
    channel_mode = (h >> 6) & 3
    spf = _SPF[(vgroup, layer)]
    if layer == 1:
        length = (12 * bitrate // samplerate + padding) * 4
    else:
        length = spf // 8 * bitrate // samplerate + padding
    return {
        "version": {3: "1", 2: "2", 0: "2.5"}[version_bits],
        "layer": layer,
        "bitrate": bitrate,
        "sample_rate": samplerate,
        "padding": padding,
        "channels": 1 if channel_mode == 3 else 2,
        "samples_per_frame": spf,
        "frame_length": length,
    }


def parse_mp3_meta(data: bytes) -> dict:
    """Walk the whole frame chain → stream metadata.

    Returns n_frames, sample_rate, channels, duration_ms, bitrate
    (average, bps), layer, version, id3_bytes. Raises
    :class:`Mp3Error` when no valid chain exists or a frame header
    mid-stream is corrupt (truncated final frames are tolerated, as
    every real-world parser does)."""
    pos = _id3v2_size(data)
    id3 = pos
    # resync: tolerate up to 2048 junk bytes before the first frame
    first = None
    for off in range(pos, min(len(data), pos + 2048)):
        hdr = _parse_header(data[off : off + 4])
        if hdr is not None:
            nxt = off + hdr["frame_length"]
            if nxt >= len(data) or _parse_header(data[nxt : nxt + 4]):
                first = off
                break
    if first is None:
        raise Mp3Error("no MPEG audio frame sync found")
    pos = first
    n_frames = 0
    bit_sum = 0
    sr = ch = spf = None
    layer = version = None
    while pos + 4 <= len(data):
        hdr = _parse_header(data[pos : pos + 4])
        if hdr is None:
            tail = len(data) - pos
            if tail < 16:  # trailing tag fragment / padding
                break
            if data[pos : pos + 3] == b"TAG":  # ID3v1
                break
            raise Mp3Error(f"frame chain broken at byte {pos}")
        if sr is None:
            sr, ch, spf = hdr["sample_rate"], hdr["channels"], hdr[
                "samples_per_frame"
            ]
            layer, version = hdr["layer"], hdr["version"]
        n_frames += 1
        bit_sum += hdr["bitrate"]
        pos += hdr["frame_length"]
    if n_frames == 0:
        raise Mp3Error("no MPEG audio frames")
    return {
        "n_frames": n_frames,
        "sample_rate": sr,
        "channels": ch,
        "samples_per_frame": spf,
        "duration_ms": n_frames * spf * 1000 // sr,
        "bitrate": bit_sum // n_frames,
        "layer": layer,
        "version": version,
        "id3_bytes": id3,
    }


def build_mp3(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    mono: bool = False,
    id3_payload: int = 0,
) -> bytes:
    """Fixture writer: a VALID MPEG1 Layer III frame chain (headers +
    zero main_data) plus an optional ID3v2 tag. The audio content is
    silence-shaped garbage — this exists so tests and the catalog
    pair can exercise the parser on deterministic bytes; real PCM
    encoding is out of scope (disclosed)."""
    br_table = _BITRATES[("1", 3)]
    if bitrate_kbps not in br_table:
        raise Mp3Error(f"bitrate {bitrate_kbps} not in the MPEG1-L3 table")
    br_idx = br_table.index(bitrate_kbps)
    sr_table = _SAMPLERATES[3]
    if sample_rate not in sr_table:
        raise Mp3Error(f"sample rate {sample_rate} not MPEG1")
    sr_idx = sr_table.index(sample_rate)
    out = bytearray()
    if id3_payload:
        body = bytes(id3_payload)
        out += b"ID3\x03\x00\x00" + bytes(
            [
                (id3_payload >> 21) & 0x7F,
                (id3_payload >> 14) & 0x7F,
                (id3_payload >> 7) & 0x7F,
                id3_payload & 0x7F,
            ]
        )
        out += body
    mode = 0xC0 if mono else 0x00  # channel mode bits 7..6 of byte 3
    for _ in range(n_frames):
        h = (
            0xFFF00000
            | (3 << 19)  # MPEG1
            | (1 << 17)  # Layer III
            | (1 << 16)  # no CRC
            | (br_idx << 12)
            | (sr_idx << 10)
        )
        hdr = struct.pack(">I", h)
        hdr = hdr[:3] + bytes([mode]) + b""
        length = 144 * bitrate_kbps * 1000 // sample_rate
        out += hdr + bytes(length - 4)
    return bytes(out)
