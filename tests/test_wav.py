"""WAV (RIFF/WAVE PCM) codec + audio-feature kernel tests."""

import struct

import numpy as np
import pytest

from georaster_spark.sources.wav import WavError, decode_wav, encode_wav


class TestRoundTrip:
    @pytest.mark.parametrize("shape", [(1,), (100,), (257, 1), (64, 2), (33, 6)])
    @pytest.mark.parametrize("rate", [8000, 44100])
    def test_pcm16(self, shape, rate):
        rng = np.random.default_rng(hash((shape, rate)) % 2**32)
        s = rng.integers(-32768, 32768, shape, dtype=np.int16)
        out, out_rate = decode_wav(encode_wav(s, rate))
        exp = s[:, None] if s.ndim == 1 else s
        assert out_rate == rate
        assert out.dtype == np.int16
        assert (out == exp).all()

    def test_odd_data_size_gets_pad_byte(self):
        # 1 mono sample -> 2 data bytes (even); 3 channels x 1 sample
        # of 8-bit would be odd, but our encoder is 16-bit — craft an
        # odd chunk via a trailing extra chunk instead
        s = np.array([123], np.int16)
        blob = encode_wav(s, 8000) + b"LIST" + struct.pack("<I", 3) + b"abc\x00"
        out, rate = decode_wav(blob)
        assert (out == [[123]]).all() and rate == 8000


class TestDecoder:
    def test_8bit_pcm_widens(self):
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        data = bytes([0, 128, 255])
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 3) + data + b"\x00"
        )
        out, rate = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
        assert out[:, 0].tolist() == [(-128) << 8, 0, 127 << 8]

    def test_unknown_chunks_skipped(self):
        s = np.array([[5, -5]], np.int16)
        blob = encode_wav(s, 16000)
        # splice a junk chunk between WAVE and fmt
        junk = b"JUNK" + struct.pack("<I", 5) + b"xxxxx" + b"\x00"
        spliced = blob[:12] + junk + blob[12:]
        spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
        out, rate = decode_wav(spliced)
        assert (out == s).all()

    def test_non_pcm_rejected(self):
        fmt = struct.pack("<HHIIHH", 85, 1, 44100, 0, 0, 0)  # 85 = MP3
        body = (
            b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 0)
        )
        with pytest.raises(WavError, match="non-PCM"):
            decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)

    def test_not_riff(self):
        with pytest.raises(WavError, match="RIFF"):
            decode_wav(b"ID3\x04" + b"\x00" * 30)

    def test_truncated_chunk(self):
        blob = encode_wav(np.zeros(50, np.int16), 8000)
        with pytest.raises(WavError, match="truncated"):
            decode_wav(blob[:-10])


def test_audio_feature_kernel_real_and_fallback(spark):
    """WAV rows decode for real; a non-RIFF blob keeps the disclosed
    digest fallback. Hand-checked doc: 4 samples [100,-200,300,-400]
    at 8 kHz -> mean_abs = 250, duration 0 ms."""
    from georaster_spark.operators.multimodal import decode_audio_features

    blob = encode_wav(np.array([100, -200, 300, -400], np.int16), 8000)
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(b"MP3junkbytes"))],
        "doc_id long, media binary",
    )
    rows = {r["doc_id"]: r for r in decode_audio_features(df).collect()}
    assert rows[1]["kind"] == "wav"
    assert (rows[1]["n_samples"], rows[1]["sample_rate"]) == (4, 8000)
    assert rows[1]["mean_abs"] == 250
    assert rows[2]["kind"] == "other"


class TestAviMjpeg:
    def test_round_trip_exact(self):
        from georaster_spark.sources.avi import decode_avi_mjpeg, encode_avi_mjpeg

        frames = []
        for f in range(5):
            py, px = np.mgrid[0:16, 0:24]
            frames.append(
                (((px // 8) * 5 + (py // 8) * 11 + f * 17) % 256).astype(np.uint8)
            )
        out, usec = decode_avi_mjpeg(encode_avi_mjpeg(frames, usec_per_frame=50000))
        assert usec == 50000 and len(out) == 5
        for a, b in zip(frames, out):
            assert (a == b).all()

    def test_not_avi_and_non_jpeg_frame(self):
        from georaster_spark.sources.avi import (
            AviError,
            decode_avi_mjpeg,
            encode_avi_mjpeg,
        )

        with pytest.raises(AviError, match="RIFF/AVI"):
            decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
        blob = encode_avi_mjpeg([np.zeros((8, 8), np.uint8)])
        # corrupt the frame bytes so they are no longer JPEG
        i = blob.find(b"\xff\xd8\xff")
        bad = blob[:i] + b"H264" + blob[i + 4 :]
        with pytest.raises(AviError, match="non-JPEG frame"):
            decode_avi_mjpeg(bad)

    def test_video_feature_kernel_real_and_fallback(self, spark):
        """Hand-checked: 3 constant 8x8 frames [10, 27, 44] at stride 2
        sample frames 0 and 2 -> mean (10+44)//2 = 27."""
        from georaster_spark.operators.multimodal import decode_video_features
        from georaster_spark.sources.avi import encode_avi_mjpeg

        frames = [np.full((8, 8), 10 + 17 * f, np.uint8) for f in range(3)]
        blob = encode_avi_mjpeg(frames, usec_per_frame=7000)
        df = spark.createDataFrame(
            [(1, bytearray(blob)), (2, bytearray(b"notavideo"))],
            "doc_id long, media binary",
        )
        rows = {r["doc_id"]: r for r in decode_video_features(df, stride=2).collect()}
        r = rows[1]
        assert r["kind"] == "mjpeg"
        assert (r["n_frames"], r["n_sampled"]) == (3, 2)
        assert (r["width"], r["height"], r["usec_per_frame"]) == (8, 8, 7000)
        assert r["mean_luma"] == 27
        assert rows[2]["kind"] == "other"
