"""Hierarchical spatial cell index — WebMercatorQuad tiles, H3-style API.

The cell scheme is the same ``WebMercatorQuad`` tile-matrix-set the
reference uses for PMTiles (``src/pmtiles.rs:15``): at resolution
(zoom) ``z`` the world is a 2^z × 2^z grid in web-mercator space,
``x`` west→east, ``y`` north→south (top origin — the y-flip of
``src/pmtiles.rs:53-69``). Golden anchor: zoom 12 tile (2128, 1438)
contains lon/lat (7.059309, 47.133037) (``src/pmtiles.rs:96-103``).

Cell id packing (pure arithmetic, so the SAME formula runs as a Spark
Column expression, a NumPy kernel, DuckDB oracle SQL, and scalar
Python):

    cell = z * 4^29  +  x * 2^29  +  y          (z ≤ 29)

Arithmetic packing keeps parent/children/ring as integer math and
keeps every oracle SQL-expressible. A Z-order (Morton) variant is
provided separately for locality-preserving sort/partition keys.

The hot path is the pure-Column form (JVM, whole-stage codegen). The
pandas-UDF form exists for parity with the Arrow-vectorized-kernel
contract and for callers that need NumPy-side logic.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_LAT = 85.05112878  # web-mercator latitude clamp
_ZSHIFT = 1 << 58  # z * 4^29
_XSHIFT = 1 << 29


# ---------------------------------------------------------------- scalar
def tile_xy(lon: float, lat: float, z: int) -> tuple[int, int]:
    """Slow scalar oracle (tests compare the vectorized paths to this)."""
    lat = min(max(lat, -MAX_LAT), MAX_LAT)
    n = 1 << z
    xt = int(math.floor((lon + 180.0) / 360.0 * n))
    lat_rad = math.radians(lat)
    yt = int(math.floor((1.0 - math.log(math.tan(lat_rad) + 1.0 / math.cos(lat_rad)) / math.pi) / 2.0 * n))
    return min(max(xt, 0), n - 1), min(max(yt, 0), n - 1)


def cell_encode_py(lon: float, lat: float, z: int) -> int:
    x, y = tile_xy(lon, lat, z)
    return z * _ZSHIFT + x * _XSHIFT + y


def cell_to_zxy(cell: int) -> tuple[int, int, int]:
    z, rest = divmod(cell, _ZSHIFT)
    x, y = divmod(rest, _XSHIFT)
    return z, x, y


def zxy_to_cell(z: int, x: int, y: int) -> int:
    return z * _ZSHIFT + x * _XSHIFT + y


def cell_parent_py(cell: int) -> int:
    z, x, y = cell_to_zxy(cell)
    if z == 0:
        raise ValueError("zoom-0 cell has no parent")
    return zxy_to_cell(z - 1, x // 2, y // 2)


def cell_children_py(cell: int) -> list[int]:
    z, x, y = cell_to_zxy(cell)
    return [zxy_to_cell(z + 1, 2 * x + dx, 2 * y + dy) for dy in (0, 1) for dx in (0, 1)]


def cell_ring_py(cell: int, k: int) -> list[int]:
    """All cells at Chebyshev distance exactly k (k=0 → the cell itself).

    X wraps around the antimeridian; y is clamped at the poles.
    Drives kNN ring expansion (SURVEY.md E6).
    """
    z, x, y = cell_to_zxy(cell)
    n = 1 << z
    if k == 0:
        return [cell]
    out = []
    for dy in range(-k, k + 1):
        yy = y + dy
        if yy < 0 or yy >= n:
            continue
        dxs = range(-k, k + 1) if abs(dy) == k else (-k, k)
        for dx in dxs:
            out.append(zxy_to_cell(z, (x + dx) % n, yy))
    return sorted(set(out))


def cell_disk_py(cell: int, k: int) -> list[int]:
    """All cells at Chebyshev distance ≤ k."""
    out: set[int] = set()
    for i in range(k + 1):
        out.update(cell_ring_py(cell, i))
    return sorted(out)


def cell_bounds(cell: int) -> tuple[float, float, float, float]:
    """(lon_min, lat_min, lon_max, lat_max) of a cell.

    Mirrors the per-tile bounds the reference derives from the TMS
    (``src/pmtiles.rs:45``); note the top-origin y (lat_max at y=0).
    """
    z, x, y = cell_to_zxy(cell)
    n = 1 << z

    def lon_of(xi: float) -> float:
        return xi / n * 360.0 - 180.0

    def lat_of(yi: float) -> float:
        t = math.pi * (1 - 2 * yi / n)
        return math.degrees(math.atan(math.sinh(t)))

    return lon_of(x), lat_of(y + 1), lon_of(x + 1), lat_of(y)


# ---------------------------------------------------------------- numpy
def tile_xy_np(lon: np.ndarray, lat: np.ndarray, z: int) -> tuple[np.ndarray, np.ndarray]:
    lat = np.clip(lat, -MAX_LAT, MAX_LAT)
    n = 1 << z
    xt = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    lat_rad = np.radians(lat)
    yt = np.floor(
        (1.0 - np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad)) / np.pi) / 2.0 * n
    ).astype(np.int64)
    return np.clip(xt, 0, n - 1), np.clip(yt, 0, n - 1)


def cell_encode_np(lon: np.ndarray, lat: np.ndarray, z: int) -> np.ndarray:
    x, y = tile_xy_np(lon, lat, z)
    return np.int64(z) * np.int64(_ZSHIFT) + x * np.int64(_XSHIFT) + y


# ------------------------------------------------------------ pandas UDF
def cell_encode_pudf(z: int):
    """Arrow-vectorized cell encoder (the input_hint-mandated form)."""

    @F.pandas_udf(T.LongType())
    def _encode(lon: pd.Series, lat: pd.Series) -> pd.Series:
        out = cell_encode_np(lon.to_numpy(np.float64), lat.to_numpy(np.float64), z)
        return pd.Series(out)

    return _encode


# ------------------------------------------------------- Column exprs
def cell_encode_cols(lon: Column, lat: Column, z: int) -> Column:
    """Cell encode as pure Column algebra — JVM-side, codegen'd.

    This is the default hot path: faster than any UDF because it
    stays inside WholeStageCodegen and never crosses into Python.
    """
    n = 1 << z
    lat_c = F.least(F.greatest(lat, F.lit(-MAX_LAT)), F.lit(MAX_LAT))
    xt = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    lat_r = F.radians(lat_c)
    yt = F.floor(
        (F.lit(1.0) - F.log(F.tan(lat_r) + F.lit(1.0) / F.cos(lat_r)) / F.lit(math.pi))
        / F.lit(2.0)
        * F.lit(float(n))
    )
    xt = F.least(F.greatest(xt, F.lit(0)), F.lit(n - 1)).cast("long")
    yt = F.least(F.greatest(yt, F.lit(0)), F.lit(n - 1)).cast("long")
    return F.lit(z).cast("long") * F.lit(_ZSHIFT) + xt * F.lit(_XSHIFT) + yt


def cell_parent_cols(cell: Column) -> Column:
    z = (cell / F.lit(_ZSHIFT)).cast("long")
    rest = cell % F.lit(_ZSHIFT)
    x = (rest / F.lit(_XSHIFT)).cast("long")
    y = rest % F.lit(_XSHIFT)
    return (z - 1) * F.lit(_ZSHIFT) + (x / 2).cast("long") * F.lit(_XSHIFT) + (y / 2).cast("long")


def cell_zxy_cols(cell: Column) -> tuple[Column, Column, Column]:
    z = (cell / F.lit(_ZSHIFT)).cast("long")
    rest = cell % F.lit(_ZSHIFT)
    return z, (rest / F.lit(_XSHIFT)).cast("long"), rest % F.lit(_XSHIFT)


def morton_key_cols(cell: Column) -> Column:
    """Z-order (Morton) interleave of (x, y) for locality-preserving
    sort/range-partition keys. 16 bit-pairs cover z ≤ 16 (enough for
    any partitioning key; NOT the cell identity — just a sort key).
    """
    _, x, y = cell_zxy_cols(cell)
    key = F.lit(0).cast("long")
    for i in range(16):
        key = (
            key
            + F.shiftleft((F.shiftright(x, i) % 2).cast("int"), 2 * i + 1).cast("long")
            + F.shiftleft((F.shiftright(y, i) % 2).cast("int"), 2 * i).cast("long")
        )
    return key


def cell_bounds_cols(cell: Column, z: int) -> tuple[Column, Column, Column, Column]:
    """(lon_min, lat_min, lon_max, lat_max) of a cell as pure Column
    algebra — the per-tile bounds the reference gets from
    ``tms.bounds(&xyz)`` (``src/pmtiles.rs:45``). ``z`` is a Python
    int so the grid size is a literal.

    sinh is spelled ``(exp(t) - exp(-t)) / 2.0`` because DuckDB 1.0
    has no ``sinh``; the oracle uses the identical expression text so
    the IEEE doubles agree bit-for-bit (``tile_bounds_sql``).
    """
    n = float(1 << z)
    _, x, y = cell_zxy_cols(cell)

    def lon_of(xx: Column) -> Column:
        return xx.cast("double") / F.lit(n) * F.lit(360.0) - F.lit(180.0)

    def lat_of(yy: Column) -> Column:
        t = F.lit(math.pi) * (F.lit(1.0) - F.lit(2.0) * yy.cast("double") / F.lit(n))
        return F.degrees(F.atan((F.exp(t) - F.exp(-t)) / F.lit(2.0)))

    return lon_of(x), lat_of(y + F.lit(1)), lon_of(x + F.lit(1)), lat_of(y)


# --------------------------------------------------------- oracle SQL
def cell_encode_sql(lon_expr: str, lat_expr: str, z: int) -> str:
    """The SAME encode formula as ANSI SQL for the DuckDB oracle."""
    n = 1 << z
    lat_c = f"least(greatest({lat_expr}, {-MAX_LAT}), {MAX_LAT})"
    xt = f"least(greatest(floor(({lon_expr} + 180.0) / 360.0 * {n}), 0), {n - 1})"
    yt = (
        f"least(greatest(floor((1.0 - ln(tan(radians({lat_c})) + 1.0/cos(radians({lat_c})))"
        f" / pi()) / 2.0 * {n}), 0), {n - 1})"
    )
    return f"(CAST({z} AS BIGINT) * {_ZSHIFT} + CAST({xt} AS BIGINT) * {_XSHIFT} + CAST({yt} AS BIGINT))"


def cell_zxy_sql(cell_expr: str) -> tuple[str, str, str]:
    """(z, x, y) SQL fragments from a packed cell id."""
    return (
        f"(({cell_expr}) // {_ZSHIFT})",
        f"(({cell_expr}) % {_ZSHIFT} // {_XSHIFT})",
        f"(({cell_expr}) % {_XSHIFT})",
    )


def tile_bounds_sql(x_expr: str, y_expr: str, z: int) -> tuple[str, str, str, str]:
    """(lon_min, lat_min, lon_max, lat_max) SQL — the exact expression
    text of ``cell_bounds_cols`` so both engines compute identical
    doubles."""
    n = float(1 << z)

    def lon_of(xx: str) -> str:
        return f"(CAST({xx} AS DOUBLE) / {n!r} * 360.0 - 180.0)"

    def lat_of(yy: str) -> str:
        t = f"(pi() * (1.0 - 2.0 * CAST({yy} AS DOUBLE) / {n!r}))"
        return f"degrees(atan((exp({t}) - exp(-{t})) / 2.0))"

    return (
        lon_of(x_expr),
        lat_of(f"(({y_expr}) + 1)"),
        lon_of(f"(({x_expr}) + 1)"),
        lat_of(y_expr),
    )
