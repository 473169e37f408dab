"""Pure-codec tests for sources/jpeg.py (no Spark session needed).

The reference decodes tile bytes via the ``image`` crate
(``/root/reference/src/pmtiles.rs:30-33``); this codec is the
engine's stdlib JPEG half of that surface. Correctness strategy with
no external codec in the container: (a) bit-exact round-trips on
block-constant images at quality 100 (a mathematical identity, see
the module docstring), (b) bounded-error round-trips on general
images, (c) structural conformance of the emitted JFIF stream, and
(d) loud rejection of everything out of scope."""

from __future__ import annotations

import numpy as np
import pytest

from georaster_spark.sources.jpeg import (
    JpegError,
    decode_jpeg,
    encode_jpeg,
    jpeg_info,
    scaled_quant,
    QUANT_LUMA,
)


def _block_constant(w: int, h: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    bw, bh = -(-w // 8), -(-h // 8)
    tiles = rng.integers(0, 256, (bh, bw), dtype=np.uint8)
    return np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)[:h, :w]


@pytest.mark.parametrize("w,h", [(8, 8), (16, 8), (20, 19), (33, 27), (64, 48)])
def test_block_constant_roundtrip_is_bit_exact_at_q100(w, h):
    img = _block_constant(w, h, seed=w * 100 + h)
    dec = decode_jpeg(encode_jpeg(img, quality=100))
    assert dec.shape == (h, w)
    assert np.array_equal(dec, img)


def test_grey_q100_error_bound_on_random_noise():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (41, 53), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=100))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 6


def test_smooth_grey_q90_stays_close():
    yy, xx = np.mgrid[0:40, 0:56]
    img = ((np.sin(xx / 9) + np.cos(yy / 7)) * 60 + 128).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 12


@pytest.mark.parametrize("subsample,bound", [("444", 12), ("420", 40)])
def test_rgb_roundtrip(subsample, bound):
    yy, xx = np.mgrid[0:40, 0:56]
    smooth = ((np.sin(xx / 9) + np.cos(yy / 7)) * 60 + 128).astype(np.uint8)
    rgb = np.stack(
        [smooth, np.roll(smooth, 5, 1), np.roll(smooth, 9, 0)], axis=-1
    )
    enc = encode_jpeg(rgb, quality=92, subsample=subsample)
    dec = decode_jpeg(enc)
    assert dec.shape == rgb.shape
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= bound
    assert jpeg_info(enc) == (56, 40, 3)


def test_odd_dims_420_partial_mcu():
    yy, xx = np.mgrid[0:37, 0:51]
    smooth = ((xx * 2 + yy * 3) % 200 + 20).astype(np.uint8)
    rgb = np.stack([smooth, smooth, smooth], axis=-1)
    dec = decode_jpeg(encode_jpeg(rgb, quality=92, subsample="420"))
    assert dec.shape == (37, 51, 3)


@pytest.mark.parametrize("ri", [1, 2, 3, 7])
def test_restart_intervals_do_not_change_pixels(ri):
    img = _block_constant(40, 24, seed=ri)
    with_rst = decode_jpeg(encode_jpeg(img, quality=100, restart_interval=ri))
    without = decode_jpeg(encode_jpeg(img, quality=100))
    assert np.array_equal(with_rst, without)
    assert np.array_equal(with_rst, img)


def test_restart_intervals_420():
    yy, xx = np.mgrid[0:40, 0:56]
    smooth = ((np.sin(xx / 9) + np.cos(yy / 7)) * 60 + 128).astype(np.uint8)
    rgb = np.stack([smooth, smooth, smooth], axis=-1)
    a = decode_jpeg(encode_jpeg(rgb, quality=92, subsample="420", restart_interval=2))
    b = decode_jpeg(encode_jpeg(rgb, quality=92, subsample="420"))
    assert np.array_equal(a, b)


def test_encode_is_deterministic():
    img = _block_constant(24, 24, seed=9)
    assert encode_jpeg(img, quality=80) == encode_jpeg(img, quality=80)


def test_stream_structure_is_valid_jfif():
    """SOI, APP0-JFIF, byte-stuffed entropy data, EOI."""
    img = _block_constant(16, 16, seed=1)
    enc = encode_jpeg(img, quality=100)
    assert enc[:2] == b"\xff\xd8"
    assert enc[2:4] == b"\xff\xe0" and enc[6:11] == b"JFIF\x00"
    assert enc[-2:] == b"\xff\xd9"
    # every 0xFF in the entropy segment must be stuffed or a marker:
    # decoding succeeding end-to-end is the functional check
    assert jpeg_info(enc) == (16, 16, 1)


def test_quality_scaling_endpoints():
    assert np.all(scaled_quant(QUANT_LUMA, 100) == 1)
    assert np.all(scaled_quant(QUANT_LUMA, 50) == QUANT_LUMA)
    q10 = scaled_quant(QUANT_LUMA, 10)
    assert q10.max() <= 255 and np.all(q10 >= QUANT_LUMA)
    with pytest.raises(JpegError):
        scaled_quant(QUANT_LUMA, 0)


def test_rejects_out_of_scope_inputs():
    with pytest.raises(JpegError):
        decode_jpeg(b"")
    with pytest.raises(JpegError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(JpegError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # no frame
    img = _block_constant(16, 16, seed=2)
    with pytest.raises(JpegError):
        encode_jpeg(img.astype(np.int32))
    with pytest.raises(JpegError):
        encode_jpeg(img, subsample="422")
    with pytest.raises(JpegError):
        encode_jpeg(np.zeros((0, 4), np.uint8))
    # progressive SOF2 must be rejected loudly, not misdecoded
    enc = bytearray(encode_jpeg(img, quality=90))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC2
    with pytest.raises(JpegError, match="not supported"):
        decode_jpeg(bytes(enc))


def test_truncation_and_corruption_fail_loudly():
    img = _block_constant(24, 24, seed=3)
    enc = encode_jpeg(img, quality=90)
    with pytest.raises(JpegError):
        decode_jpeg(enc[: len(enc) // 2])
    # corrupt a DHT length field
    bad = bytearray(enc)
    dht = bad.find(b"\xff\xc4")
    bad[dht + 2] = 0xFF
    with pytest.raises(JpegError):
        decode_jpeg(bytes(bad))
