"""VP8L (lossless WebP) codec tests.

The reference accepts WebP tile bytes through the ``image`` crate's
``with_guessed_format`` (``/root/reference/src/pmtiles.rs:30-32``);
``sources/webp.py`` supplies that capability stdlib-only. No WebP
library exists in this container, so coverage is three-legged:
encoder round-trips over every transform, HAND-ASSEMBLED bitstreams
with hand-computed pixels for paths the encoder never emits (LZ77
backward references, color cache, meta prefix codes), and the
``pmtiles_webp_ingest`` DuckDB oracle which recomputes whole-archive
pixel sums without running the decoder.
"""

import numpy as np
import pytest

from georaster_spark.sources.webp import (
    _DIST_MAP,
    _Bits,
    _BitW,
    _Writer,
    WebpError,
    decode_vp8l,
    decode_webp,
    encode_webp_lossless,
)


def _wrap(payload: bytes) -> bytes:
    import struct

    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _argb(a, r, g, b):
    return (a << 24) | (r << 16) | (g << 8) | b


def _hand_stream(w, h, freqs, emit, cache_bits=0):
    """Assemble a raw VP8L payload: no transforms, optional color
    cache, no meta codes, one prefix-code group, then an arbitrary
    (code_index, symbol) / ("bits", value, nbits) emission list."""
    bw = _BitW()
    bw.write(14, w - 1)
    bw.write(14, h - 1)
    bw.write(1, 0)
    bw.write(3, 0)
    bw.write(1, 0)  # no transforms
    if cache_bits:
        bw.write(1, 1)
        bw.write(4, cache_bits)
    else:
        bw.write(1, 0)
    bw.write(1, 0)  # no meta prefix codes
    writers = [_Writer(bw, f) for f in freqs]
    for item in emit:
        if item[0] == "bits":
            bw.write(item[2], item[1])
        else:
            writers[item[0]].emit(item[1])
    return b"\x2f" + bw.bytes()


def _freqs_from_emit(emit, cache_size=0):
    """Frequency tables for the 5 codes from the emission list."""
    sizes = [256 + 24 + cache_size, 256, 256, 256, 40]
    freqs = [[0] * s for s in sizes]
    for item in emit:
        if item[0] != "bits":
            freqs[item[0]][item[1]] += 1
    for f in freqs:
        if not any(f):
            f[0] = 1  # unused code still needs one symbol
    return freqs


def _literal(r, g, b, a=255):
    # stream order: green, red, blue, alpha
    return [(0, g), (1, r), (2, b), (3, a)]


class TestRoundTrip:
    @pytest.mark.parametrize("method", ["literal", "subtract-green", "predictor", "color"])
    @pytest.mark.parametrize("shape", [(1, 1, 3), (7, 1, 4), (1, 40, 3), (33, 50, 3), (16, 16, 4)])
    def test_random_images(self, method, shape):
        rng = np.random.default_rng(hash((method, shape)) % 2**32)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_webp(encode_webp_lossless(img, method=method))
        exp = img if (shape[2] == 4 and (img[:, :, 3] != 255).any()) else img[:, :, :3]
        assert out.shape == exp.shape
        assert (out == exp).all()

    def test_gray_expands_to_rgb(self):
        rng = np.random.default_rng(3)
        g = rng.integers(0, 256, (9, 11), dtype=np.uint8)
        out = decode_webp(encode_webp_lossless(g, method="subtract-green"))
        assert (out == np.stack([g] * 3, axis=-1)).all()

    @pytest.mark.parametrize("n_colors", [1, 2, 3, 4, 5, 16, 17, 200, 256])
    def test_palette_bundling_levels(self, n_colors):
        """Each color-count regime exercises a different packing
        width (8/4/2/1 pixels per byte)."""
        rng = np.random.default_rng(n_colors)
        cols = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
        img = cols[rng.integers(0, n_colors, (23, 37))]
        out = decode_webp(encode_webp_lossless(img, method="palette"))
        assert (out == img).all()

    def test_palette_with_translucent_colors(self):
        rng = np.random.default_rng(9)
        cols = rng.integers(0, 256, (6, 4), dtype=np.uint8)
        img = cols[rng.integers(0, 6, (8, 8))]
        out = decode_webp(encode_webp_lossless(img, method="palette"))
        assert out.shape == img.shape and (out == img).all()

    def test_palette_too_many_colors_rejected(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        with pytest.raises(WebpError, match="palette"):
            encode_webp_lossless(img, method="palette")


class TestHandAssembledStreams:
    """Decoder paths the encoder never writes, with hand-computed
    expected pixels."""

    def test_lz77_2d_distance_copies_previous_row(self):
        # 4x2: row 0 = literals, then one backward ref of length 4 at
        # 2D distance code 1 = (dx=0, dy=1) -> distance = width
        px = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (5, 6, 7)]
        emit = []
        for r, g, b in px:
            emit += _literal(r, g, b)
        emit += [(0, 256 + 3), (4, 0)]  # length code 3 = 4, dist code 0 -> value 1
        payload = _hand_stream(4, 2, _freqs_from_emit(emit), emit)
        out = decode_vp8l(payload)
        assert out.shape == (2, 4, 4)
        assert (out[1] == out[0]).all()
        assert tuple(out[0, 2, :3]) == (70, 80, 90)

    def test_lz77_linear_distance_run(self):
        # 5x1: one literal then length-4 copy at linear distance 1
        # (plane code 121 = prefix 13 + five extra bits of 24)
        emit = _literal(200, 100, 50) + [
            (0, 256 + 3),
            (4, 13),
            ("bits", 24, 5),
        ]
        payload = _hand_stream(5, 1, _freqs_from_emit(emit), emit)
        out = decode_vp8l(payload)
        assert out.shape == (1, 5, 4)
        assert (out[0] == np.array([200, 100, 50, 255], np.uint8)).all()

    def test_color_cache_hit(self):
        cache_bits = 4
        p = _argb(255, 1, 2, 3)
        idx = ((0x1E35A7BD * p) & 0xFFFFFFFF) >> (32 - cache_bits)
        emit = (
            _literal(1, 2, 3)
            + _literal(9, 8, 7)
            + [(0, 256 + 24 + idx)]  # cache reference to the first pixel
        )
        payload = _hand_stream(
            3, 1, _freqs_from_emit(emit, cache_size=16), emit, cache_bits=cache_bits
        )
        out = decode_vp8l(payload)
        assert tuple(out[0, 0, :3]) == (1, 2, 3)
        assert tuple(out[0, 1, :3]) == (9, 8, 7)
        assert (out[0, 2] == out[0, 0]).all()

    def test_meta_prefix_groups(self):
        """8x1 image, huffman-block bits 2 -> two 4-pixel blocks, each
        mapped to its own code group emitting a different pixel."""
        bw = _BitW()
        bw.write(14, 7)  # w-1
        bw.write(14, 0)  # h-1
        bw.write(1, 0)
        bw.write(3, 0)
        bw.write(1, 0)  # no transforms
        bw.write(1, 0)  # no color cache
        bw.write(1, 1)  # meta prefix codes present
        bw.write(3, 0)  # hbits = 2 -> blocks of 4 px, meta image 2x1
        # meta entropy image (not level0): its own cache bit + 1 group
        bw.write(1, 0)
        meta_emit = _literal(0, 0, 0) + _literal(0, 1, 0)  # groups 0, 1
        meta_freqs = _freqs_from_emit(meta_emit)
        mw = [_Writer(bw, f) for f in meta_freqs]
        for code_idx, sym in meta_emit:
            mw[code_idx].emit(sym)
        # two groups of 5 codes for the main image
        g0 = _literal(11, 22, 33)
        g1 = _literal(44, 55, 66)
        w0 = [_Writer(bw, f) for f in _freqs_from_emit(g0)]
        w1 = [_Writer(bw, f) for f in _freqs_from_emit(g1)]
        for _ in range(4):
            for code_idx, sym in g0:
                w0[code_idx].emit(sym)
        for _ in range(4):
            for code_idx, sym in g1:
                w1[code_idx].emit(sym)
        out = decode_vp8l(b"\x2f" + bw.bytes())
        assert out.shape == (1, 8, 4)
        assert (out[0, :4, :3] == [11, 22, 33]).all()
        assert (out[0, 4:, :3] == [44, 55, 66]).all()

    def test_backward_reference_before_start_rejected(self):
        emit = _literal(1, 1, 1) + [(0, 256 + 3), (4, 13), ("bits", 30, 5)]
        payload = _hand_stream(5, 1, _freqs_from_emit(emit), emit)
        with pytest.raises(WebpError, match="backward reference"):
            decode_vp8l(payload)


class TestDistanceMap:
    def test_matches_spec_table_prefix(self):
        """First 88 entries of the spec's published table (RFC 9649)
        — the generation rule must reproduce them exactly."""
        spec_prefix = [
            (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
            (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
            (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
            (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
            (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
            (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
            (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
            (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
            (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
            (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
            (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
        ]
        assert _DIST_MAP[: len(spec_prefix)] == spec_prefix

    def test_shape_invariants(self):
        assert len(_DIST_MAP) == 120
        assert len(set(_DIST_MAP)) == 120
        d2 = [dx * dx + dy * dy for dx, dy in _DIST_MAP]
        assert d2 == sorted(d2)
        assert all(0 <= dy <= 7 and -7 <= dx <= 8 for dx, dy in _DIST_MAP)


class TestErrorSurface:
    def test_malformed_vp8_chunk_rejected(self):
        # lossy VP8 now decodes (sources/vp8.py); a garbage VP8 chunk
        # must still fail loudly, not emit pixels
        import struct

        from georaster_spark.sources.vp8 import Vp8Error

        body = b"\x00" * 10
        chunk = b"VP8 " + struct.pack("<I", len(body)) + body
        data = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
        with pytest.raises(Vp8Error):
            decode_webp(data)

    def test_not_riff(self):
        with pytest.raises(WebpError, match="RIFF"):
            decode_webp(b"\x89PNG\r\n\x1a\n" + b"\x00" * 40)

    def test_no_vp8l_chunk(self):
        import struct

        chunk = b"JUNK" + struct.pack("<I", 2) + b"ab"
        data = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
        with pytest.raises(WebpError, match="no VP8"):
            decode_webp(data)

    def test_bad_signature_byte(self):
        with pytest.raises(WebpError, match="signature"):
            decode_vp8l(b"\x30" + b"\x00" * 10)

    def test_truncated_stream(self):
        img = (np.arange(300) % 256).astype(np.uint8).reshape(10, 10, 3)
        blob = encode_webp_lossless(img, method="literal")
        with pytest.raises(WebpError):
            decode_webp(blob[:40] + blob[40 + 8 :])  # drop 8 payload bytes

    def test_bits_reader_overrun_guard(self):
        br = _Bits(b"\x01")
        br.read(8)
        with pytest.raises(WebpError, match="truncated"):
            for _ in range(20):
                br.read(8)


class TestTileDispatch:
    def test_decode_tile_sniffs_both_formats_and_rejects_junk(self):
        from georaster_spark.sources.pmtiles import PmtilesError, decode_tile
        from georaster_spark.sources.png import encode_png

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)
        assert (decode_tile(encode_png(img)) == img).all()
        assert (decode_tile(encode_webp_lossless(img)) == img).all()
        with pytest.raises(PmtilesError, match="unsupported tile format"):
            decode_tile(b"\xff\xd8\xff\xe0 not a supported tile")

    def test_mixed_archive_point_lookup(self):
        """get_pixel_at through a WebP tile of the mixed archive:
        world coordinate -> tile (2127, 1438) (odd x+y -> WebP) ->
        formula RGB at the snapped pixel."""
        from georaster_spark.datagen import _xyz_rgb
        from georaster_spark.sources.pmtiles import PmtilesReader, get_pixel_at
        from georaster_spark.datagen import fixture_webp_pmtiles_path

        lon, lat = 7.0, 47.133037
        with PmtilesReader(fixture_webp_pmtiles_path()) as rd:
            got = get_pixel_at(rd, 12, lon, lat)
        assert got is not None
        # recompute: which pixel does the reader snap to on a 128px tile?
        from georaster_spark import cells

        x, y = cells.tile_xy(lon, lat, 12)
        assert (x, y) == (2127, 1438) and (x + y) % 2 == 1  # a WebP tile
        lon0, lat0, lon1, lat1 = cells.cell_bounds(cells.zxy_to_cell(12, x, y))
        import math

        px = math.floor((lon - lon0) / ((lon1 - lon0) / 128) + 0.5)
        py = math.floor((lat1 - lat) / ((lat1 - lat0) / 128) + 0.5)
        exp = _xyz_rgb(x, y, np.array([px]), np.array([py]))
        assert got == tuple(int(c[0]) for c in exp)


class TestPropertyRoundTrip:
    """Hypothesis: ANY uint8 image round-trips bit-exactly through
    every encoder method (palette only when it can apply)."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        ch=st.sampled_from([2, 3, 4]),  # 2 = greyscale
        seed=st.integers(0, 2**31),
        method=st.sampled_from(["literal", "subtract-green", "predictor", "color"]),
    )
    def test_any_image_any_method(self, w, h, ch, seed, method):
        rng = np.random.default_rng(seed)
        shape = (h, w) if ch == 2 else (h, w, ch)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_webp(encode_webp_lossless(img, method=method))
        if ch == 2:
            exp = np.stack([img] * 3, axis=-1)
        elif ch == 4 and (img[:, :, 3] != 255).any():
            exp = img
        else:
            exp = img[..., :3]
        assert out.shape == exp.shape and (out == exp).all()

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        n_colors=st.integers(1, 256),
        seed=st.integers(0, 2**31),
    )
    def test_any_palette(self, w, h, n_colors, seed):
        rng = np.random.default_rng(seed)
        cols = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
        img = cols[rng.integers(0, n_colors, (h, w))]
        out = decode_webp(encode_webp_lossless(img, method="palette"))
        assert (out == img).all()
