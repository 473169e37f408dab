"""Property tests over the WebMercatorQuad cell index — pure Python
(no SparkSession), so hypothesis can sweep hundreds of coordinates.

Invariants mirror H3-style API contracts generalized from the
reference's TMS usage (src/pmtiles.rs:15,37-69)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from georaster_spark import cells

lons = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False)
lats = st.floats(min_value=-84.9, max_value=84.9, allow_nan=False)
zooms = st.integers(min_value=1, max_value=20)


@settings(max_examples=300, deadline=None)
@given(lons, lats, zooms)
def test_parent_is_coarser_encode(lon, lat, z):
    """parent(encode(p, z)) == encode(p, z-1) — the pyramid property
    that makes cell_parent a pure integer op (no re-projection)."""
    c = cells.cell_encode_py(lon, lat, z)
    assert cells.cell_parent_py(c) == cells.cell_encode_py(lon, lat, z - 1)


@settings(max_examples=300, deadline=None)
@given(lons, lats, zooms)
def test_children_partition_parent(lon, lat, z):
    c = cells.cell_encode_py(lon, lat, z)
    kids = cells.cell_children_py(c)
    assert len(kids) == 4 and len(set(kids)) == 4
    assert all(cells.cell_parent_py(k) == c for k in kids)
    # the point's finer cell is one of its cell's children
    assert cells.cell_encode_py(lon, lat, z + 1) in kids


@settings(max_examples=300, deadline=None)
@given(lons, lats, zooms)
def test_bounds_contain_point(lon, lat, z):
    c = cells.cell_encode_py(lon, lat, z)
    lon0, lat0, lon1, lat1 = cells.cell_bounds(c)
    assert lon0 <= lon <= lon1 or abs(lon - lon0) < 1e-9 or abs(lon1 - lon) < 1e-9
    assert lat0 - 1e-9 <= lat <= lat1 + 1e-9


@settings(max_examples=200, deadline=None)
@given(lons, lats, st.integers(min_value=4, max_value=16), st.integers(min_value=1, max_value=3))
def test_ring_is_chebyshev_shell(lon, lat, z, k):
    """ring(k) cells are exactly Chebyshev distance k (x wraps, y
    clamps) and disk(k) == union of rings 0..k."""
    c = cells.cell_encode_py(lon, lat, z)
    _, x, y = cells.cell_to_zxy(c)
    n = 1 << z
    ring = cells.cell_ring_py(c, k)
    assert ring
    for rc in ring:
        _, rx, ry = cells.cell_to_zxy(rc)
        dx = min(abs(rx - x), n - abs(rx - x))  # wrap distance
        dy = abs(ry - y)
        assert max(dx, dy) == k
    disk = set(cells.cell_disk_py(c, k))
    assert disk == {cc for i in range(k + 1) for cc in cells.cell_ring_py(c, i)}
    # interior of the map: full shell has 8k cells
    if k <= x <= n - 1 - k and k <= y <= n - 1 - k and n > 2 * k + 1:
        assert len(ring) == 8 * k


@settings(max_examples=300, deadline=None)
@given(zooms, st.data())
def test_pack_unpack_roundtrip(z, data):
    n = 1 << z
    x = data.draw(st.integers(min_value=0, max_value=n - 1))
    y = data.draw(st.integers(min_value=0, max_value=n - 1))
    assert cells.cell_to_zxy(cells.zxy_to_cell(z, x, y)) == (z, x, y)
