"""Property tests over the grid/tile math (SURVEY §7 risk 1: the
padding/stride formulas had a real bug in the reference's history —
CHANGELOG.md:15 'Fix pixel offset in padded tiles').

Pure driver-side scalar API, so hypothesis can run hundreds of random
geometries; Column-vs-scalar agreement is covered separately in
test_grid.py (the exprs are asserted equal to these scalars)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from georaster_spark.grid import RasterGeometry

dims = st.integers(min_value=1, max_value=40)
tile_dims = st.integers(min_value=1, max_value=17)


@st.composite
def geometries(draw):
    return RasterGeometry(
        width=draw(dims),
        height=draw(dims),
        tile_w=draw(tile_dims),
        tile_h=draw(tile_dims),
        bands=draw(st.integers(min_value=1, max_value=4)),
        planar=draw(st.booleans()),
    )


@settings(max_examples=200, deadline=None)
@given(geometries())
def test_padding_completes_grid(g: RasterGeometry):
    assert 0 <= g.padding_right < g.tile_w
    assert 0 <= g.padding_down < g.tile_h
    assert (g.width + g.padding_right) % g.tile_w == 0
    assert (g.height + g.padding_down) % g.tile_h == 0
    assert g.tiles_across * g.tile_w >= g.width > (g.tiles_across - 1) * g.tile_w
    assert g.tiles_down * g.tile_h >= g.height > (g.tiles_down - 1) * g.tile_h


@settings(max_examples=100, deadline=None)
@given(geometries())
def test_tile_addressing_is_injective(g: RasterGeometry):
    """(x, y) → (tile_index, tile_offset) never collides — the exact
    invariant broken by the reference's pre-0.2.0 padded-stride bug."""
    seen: dict[tuple[int, int], tuple[int, int]] = {}
    for y in range(g.height):
        for x in range(g.width):
            ti = g.tile_index(x, y)
            off = g.tile_offset(ti, x, y)
            key = (ti, off)
            assert key not in seen, f"collision {key}: {(x, y)} vs {seen[key]}"
            seen[key] = (x, y)
            # offset stays inside the padded-stride chunk bounds
            pr, pdn = g.get_padding(ti)
            assert 0 <= off < (g.tile_w - pr) * g.tile_h * g.spp()


@settings(max_examples=100, deadline=None)
@given(geometries())
def test_planar_band_runs_do_not_overlap(g: RasterGeometry):
    """Planar band b's chunk indices are shifted by the reference's
    floor-division quirk (src/geotiff.rs:495-498) — runs for distinct
    bands never collide on (tile_index, offset) for same-offset use."""
    if not g.planar or g.bands == 1:
        return
    # band_offset is (height // tile_h) * band — NOT a full
    # tiles_across*tiles_down stride. That is the reference's strip-
    # layout assumption (planar rasters are striped: tiles_across==1),
    # mirrored verbatim. Assert disjoint contiguous runs on that shape.
    if g.tiles_across == 1 and g.height % g.tile_h == 0:
        for b in range(g.bands):
            lo = g.tile_index(0, 0, band=b)
            hi = g.tile_index(g.width - 1, g.height - 1, band=b)
            assert lo == b * g.tiles_down
            assert hi == (b + 1) * g.tiles_down - 1


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=-10_000, max_value=10_000),
    st.integers(min_value=-10_000, max_value=10_000),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    st.floats(min_value=1e-3, max_value=1e3),
    st.floats(min_value=1e-3, max_value=1e3),
)
def test_world_pixel_round_trip(px, py, ox, oy, psx, psy):
    """pixel → world → pixel is the identity for every grid point
    (mirrors tests/geotiff.rs:504-524, generalized over geometries;
    py size negated like north-up rasters)."""
    g = RasterGeometry(
        width=1, height=1, tile_w=1, tile_h=1,
        origin_x=ox, origin_y=oy, px_sz_x=psx, px_sz_y=-psy,
    )
    wx, wy = g.pixel_to_world(px, py)
    assert g.world_to_pixel(wx, wy) == (px, py)


def test_zero_size_window_documented_divergence(spark):
    """Engine: empty window ⇒ 0 rows (reference yields the origin
    pixel once, tests/geotiff.rs:53-55 — divergence on record)."""
    from pyspark.sql import functions as F

    g = RasterGeometry(width=4, height=4, tile_w=2, tile_h=2)
    px = spark.range(16).select(
        (F.col("id") % 4).cast("int").alias("x"),
        (F.col("id") / 4).cast("int").alias("y"),
    )
    assert px.where(g.window_filter(F.col("x"), F.col("y"), 1, 1, 0, 0)).count() == 0


@settings(max_examples=300, deadline=None)
@given(
    st.floats(min_value=-179.9, max_value=179.9, allow_nan=False),
    st.floats(min_value=-84.9, max_value=84.9, allow_nan=False),
    st.floats(min_value=-179.9, max_value=179.9, allow_nan=False),
    st.floats(min_value=-84.9, max_value=84.9, allow_nan=False),
)
def test_haversine_metric_properties(lon1, lat1, lon2, lat2):
    """Distance kernel sanity: symmetric, zero on identity, bounded by
    half the Earth's circumference, positive for distinct points."""
    import math

    import numpy as np

    from georaster_spark.functions.geo import EARTH_RADIUS_M, haversine_np

    def d(a, b, c, e):
        return float(haversine_np(np.array([a]), np.array([b]), np.array([c]), np.array([e]))[0])

    assert d(lon1, lat1, lon1, lat1) == 0.0
    ab, ba = d(lon1, lat1, lon2, lat2), d(lon2, lat2, lon1, lat1)
    assert abs(ab - ba) <= 1e-6
    assert ab <= math.pi * EARTH_RADIUS_M + 1.0
    if (lon1, lat1) != (lon2, lat2):
        assert ab >= 0.0
