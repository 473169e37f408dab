"""MPEG-audio frame parser tests (sources/mp3.py).

The parser is metadata-only by design (PCM synthesis is the disclosed
stub); what must be RIGHT is the header tables and the frame-length
chaining — validated here by (a) a real-world golden that must walk
to EOF exactly, (b) fixture round-trips across the parameter space,
and (c) loud failure on broken chains.
"""

from __future__ import annotations

import os

import pytest

from georaster_spark.sources.mp3 import Mp3Error, build_mp3, parse_mp3_meta

GOLDEN = "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3"


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="golden mp3 absent")
def test_real_world_golden_chain_walks_to_eof():
    """45 contiguous MPEG2-L3 frames: a single wrong bitrate /
    samplerate table entry or length formula desyncs the walk and
    raises — so a clean parse pins the tables against real encoder
    output."""
    meta = parse_mp3_meta(open(GOLDEN, "rb").read())
    assert meta == {
        "n_frames": 45,
        "sample_rate": 22050,
        "channels": 1,
        "samples_per_frame": 576,
        "duration_ms": 1175,
        "bitrate": 64000,
        "layer": 3,
        "version": "2",
        "id3_bytes": 32,
    }


@pytest.mark.parametrize("n,kbps,rate,mono", [
    (2, 32, 44100, False),
    (7, 128, 48000, True),
    (10, 320, 32000, False),
    (1, 96, 44100, True),
])
def test_fixture_roundtrip(n, kbps, rate, mono):
    data = build_mp3(n, kbps, rate, mono, id3_payload=n * 3)
    m = parse_mp3_meta(data)
    assert m["n_frames"] == n
    assert m["bitrate"] == kbps * 1000
    assert m["sample_rate"] == rate
    assert m["channels"] == (1 if mono else 2)
    assert m["samples_per_frame"] == 1152
    assert m["duration_ms"] == n * 1152 * 1000 // rate
    assert m["id3_bytes"] == 10 + n * 3


def test_no_id3_and_resync_junk():
    data = build_mp3(3, 64, 44100)
    assert parse_mp3_meta(data)["n_frames"] == 3
    # junk before the first sync is tolerated (resync window)
    assert parse_mp3_meta(b"\x00" * 100 + data)["n_frames"] == 3


def test_broken_chain_raises():
    data = bytearray(build_mp3(4, 64, 44100))
    # corrupt the THIRD frame's sync word: the start of stream is a
    # valid 2-frame chain (so the initial resync accepts offset 0),
    # then the walk must fail loudly mid-stream
    frame_len = 144 * 64000 // 44100
    data[2 * frame_len] = 0x00
    with pytest.raises(Mp3Error, match="broken"):
        parse_mp3_meta(bytes(data))


def test_corrupt_second_frame_resyncs_to_later_chain():
    """Corrupting frame 1 rejects the offset-0 start (its next-header
    check fails) and the resync window finds the intact tail chain —
    the same graceful recovery real-world parsers do."""
    data = bytearray(build_mp3(4, 64, 44100))
    frame_len = 144 * 64000 // 44100
    data[frame_len] = 0x00
    assert parse_mp3_meta(bytes(data))["n_frames"] == 2


def test_not_audio_raises():
    with pytest.raises(Mp3Error, match="sync"):
        parse_mp3_meta(b"definitely not mpeg audio" * 10)


def test_trailing_id3v1_tag_tolerated():
    data = build_mp3(2, 64, 44100) + b"TAG" + b"\x00" * 125
    assert parse_mp3_meta(data)["n_frames"] == 2
