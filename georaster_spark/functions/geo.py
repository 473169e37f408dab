"""Geodesic helpers — Column algebra + matching oracle-SQL fragments.

Haversine formula text is kept IDENTICAL between the Column form and
the SQL form so Spark and the DuckDB oracle agree bit-for-bit up to
libm ulp differences (outputs that feed hashes are rounded).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371000.0


def haversine_cols(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    dlat = F.radians(lat2 - lat1) / 2.0
    dlon = F.radians(lon2 - lon1) / 2.0
    a = F.pow(F.sin(dlat), 2) + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(
        F.sin(dlon), 2
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def haversine_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    a = (
        f"pow(sin(radians(({lat2}) - ({lat1})) / 2.0), 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"pow(sin(radians(({lon2}) - ({lon1})) / 2.0), 2)"
    )
    return f"(2.0 * {EARTH_RADIUS_M} * asin(sqrt({a})))"


def haversine_np(lon1, lat1, lon2, lat2) -> np.ndarray:
    lat1, lat2 = np.radians(lat1), np.radians(lat2)
    dlat = (lat2 - lat1) / 2.0
    dlon = np.radians(np.asarray(lon2) - np.asarray(lon1)) / 2.0
    a = np.sin(dlat) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))


# ---------------------------------------------------------------- R27
# External coordinate interop (reference src/geo.rs:19-140): the
# reference's Coordinate{x: lon, y: lat} converts from/to tuples,
# [f64; 2] arrays, geo-crate Coord and geodesy Coor2D. The Spark-first
# reading: a coordinate is a struct<x,y> column, and "interop" is a
# family of PURE-CODEGEN converters between the encodings a DataFrame
# actually meets — (x, y) column pairs, array<double>[2], WKT point
# text and GeoJSON point text — plus the reference's lat-first
# constructor quirk (Coordinate::new(latitude, longitude),
# geo.rs:38-43, mirrored by geodesy's Coor2D::geo, geo.rs:121-127).
# Text building/parsing is canonicalized through e6-quantized BIGINTs
# so a DuckDB twin reproduces the bytes exactly.


def coord_new(latitude: Column, longitude: Column) -> Column:
    """Lat-first constructor (geo.rs:38-43): new(lat, lon) -> {x: lon, y: lat}."""
    return F.struct(longitude.alias("x"), latitude.alias("y"))


def coord_from_xy(x: Column, y: Column) -> Column:
    """x-first tuple conversion (From<(f64, f64)>, geo.rs:46-52)."""
    return F.struct(x.alias("x"), y.alias("y"))


def coord_from_array(arr: Column) -> Column:
    """[x, y] array conversion (From<[f64; 2]>, geo.rs:55-61)."""
    return F.struct(arr[0].alias("x"), arr[1].alias("y"))


def coord_to_array(c: Column) -> Column:
    """struct<x,y> -> [x, y] (the geo-crate Coord direction, geo.rs:69-73)."""
    return F.array(c["x"], c["y"])


def _e6_text_col(v_e6: Column) -> Column:
    """Canonical decimal text of an e6-quantized BIGINT ("-1.050000").

    Built from integer parts (sign / quotient / zero-padded remainder)
    so the bytes are engine-independent — float formatting never runs.
    """
    sign = F.when(v_e6 < 0, F.lit("-")).otherwise(F.lit(""))
    a = F.abs(v_e6)
    return F.concat(
        sign,
        F.floor(a / 1000000).cast("long").cast("string"),
        F.lit("."),
        F.lpad((a % 1000000).cast("string"), 6, "0"),
    )


def _e6_text_sql(v: str) -> str:
    """DuckDB twin of :func:`_e6_text_col` (identical bytes)."""
    return (
        f"(CASE WHEN {v} < 0 THEN '-' ELSE '' END || "
        f"CAST(abs({v}) // 1000000 AS VARCHAR) || '.' || "
        f"lpad(CAST(abs({v}) % 1000000 AS VARCHAR), 6, '0'))"
    )


def wkt_point_e6(x_e6: Column, y_e6: Column) -> Column:
    """'POINT(x y)' text from e6-quantized coordinates."""
    return F.concat(
        F.lit("POINT("), _e6_text_col(x_e6), F.lit(" "), _e6_text_col(y_e6), F.lit(")")
    )


def wkt_point_e6_sql(x: str, y: str) -> str:
    return f"('POINT(' || {_e6_text_sql(x)} || ' ' || {_e6_text_sql(y)} || ')')"


def geojson_point_e6(x_e6: Column, y_e6: Column) -> Column:
    """'{"type":"Point","coordinates":[x,y]}' text from e6 coordinates."""
    return F.concat(
        F.lit('{"type":"Point","coordinates":['),
        _e6_text_col(x_e6),
        F.lit(","),
        _e6_text_col(y_e6),
        F.lit("]}"),
    )


def geojson_point_e6_sql(x: str, y: str) -> str:
    return (
        "('{\"type\":\"Point\",\"coordinates\":[' || "
        f"{_e6_text_sql(x)} || ',' || {_e6_text_sql(y)} || ']}}')"
    )


# Parse patterns are RE2-safe (character classes only) and shared
# verbatim with the SQL twins; parsed text -> DOUBLE -> round(*1e6) is
# exact for 6-decimal text (strtod is correctly rounded in both
# engines, and the product sits ~1e-9 from the integer — never near a
# .5 boundary).
WKT_POINT_RE = r"POINT\(([-0-9.]+) ([-0-9.]+)\)"
GEOJSON_POINT_RE = r"\[([-0-9.]+),([-0-9.]+)\]"


def parse_point_e6(text: Column, pattern: str, group: int) -> Column:
    """One coordinate of a point-text column back as an e6 BIGINT."""
    return F.round(F.regexp_extract(text, pattern, group).cast("double") * 1000000.0, 0).cast(
        "long"
    )


def parse_point_e6_sql(text: str, pattern: str, group: int) -> str:
    return (
        f"CAST(round(CAST(regexp_extract({text}, '{pattern}', {group}) AS DOUBLE)"
        " * 1000000.0, 0) AS BIGINT)"
    )


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd (ray-casting) point-in-polygon.

    Classic PNPOLY crossing test, vectorized over the points axis;
    the vertex loop is tiny (our polygons have ≤ 8 vertices). Points
    exactly on an edge are boundary cases the data generator avoids
    (FIXTURES.md boundary nudge).
    """
    inside = np.zeros(px.shape[0], dtype=bool)
    x0, y0 = ring[-1]
    for x1, y1 in ring:
        crosses = (y0 > py) != (y1 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x1 - x0) * (py - y0) / (y1 - y0) + x0
        inside ^= crosses & (px < xint)
        x0, y0 = x1, y1
    return inside
