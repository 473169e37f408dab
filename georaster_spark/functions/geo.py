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
