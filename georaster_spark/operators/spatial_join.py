"""Point-in-polygon spatial join — the engine's flagship operator (E3-E5).

Two-stage plan (the Spark re-expression of the reference's
cell-encode→tile-fetch→local-sample lifecycle, ``src/pmtiles.rs:37-51``):

1. **Cover join** (coarse): each polygon is covered by a set of
   WebMercatorQuad cells at resolution ``res``, built driver-side in
   NumPy and **broadcast** (the polygon side is always the small
   side; no shuffle). Cells fully inside a polygon are marked
   ``full`` — documents landing there skip the exact test entirely.
2. **Exact ray-cast** (fine): candidates from partial cells run a
   vectorized even-odd test inside an Arrow-batched pandas UDF (no
   per-row Python).

Skew: hot cells concentrate candidates. The join itself is broadcast
(no shuffle to skew), but downstream per-cell aggregations shuffle on
``cell`` — ``salted_cell_counts`` shows the two-level (salted
partial → final) pattern; AQE skew-join is the configured backstop.

At 100 TB scale: stage 1 is a map-side-only narrow pass (encode +
broadcast hash join + filter), stage 2 is vectorized compute on the
surviving fraction — the whole join runs without a single shuffle
unless the caller aggregates.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from georaster_spark.cells import cell_bounds, cell_encode_cols, zxy_to_cell, tile_xy
from georaster_spark.datagen import Polygon
from georaster_spark.functions.geo import points_in_ring


def _segment_intersects_box(
    x0: float, y0: float, x1: float, y1: float,
    bx0: float, by0: float, bx1: float, by1: float,
) -> bool:
    """Conservative segment-vs-rectangle overlap (used only to decide
    full vs partial cover cells — safe to err toward 'partial')."""
    if max(x0, x1) < bx0 or min(x0, x1) > bx1 or max(y0, y1) < by0 or min(y0, y1) > by1:
        return False
    # axis-aligned or general: test both endpoints in box, else edge
    # crossing via the separating-axis of the segment line
    dx, dy = x1 - x0, y1 - y0
    if dx == 0 and dy == 0:
        return bx0 <= x0 <= bx1 and by0 <= y0 <= by1
    corners = [(bx0, by0), (bx1, by0), (bx1, by1), (bx0, by1)]
    sides = [dx * (cy - y0) - dy * (cx - x0) for cx, cy in corners]
    if all(s > 0 for s in sides) or all(s < 0 for s in sides):
        return False
    return True


def build_cover(polys: list[Polygon], res: int) -> list[tuple[int, str, bool]]:
    """Polygon → cell cover at resolution ``res`` (E3).

    Driver-side NumPy at broadcast-build time. Returns
    ``(cell, poly_id, full)`` rows: the cover is a superset of the
    polygon (bbox cells), so stage 2 can only *remove* candidates —
    no false negatives by construction. ``full=True`` cells are
    entirely inside the polygon (all four corners inside and no
    polygon edge crossing the cell) and skip the exact test.
    """
    out: list[tuple[int, str, bool]] = []
    for p in polys:
        xmin, ymin, xmax, ymax = p.bbox
        tx0, ty1 = tile_xy(xmin, ymin, res)  # y grows southward
        tx1, ty0 = tile_xy(xmax, ymax, res)
        ring = p.ring
        for ty in range(ty0, ty1 + 1):
            for tx in range(tx0, tx1 + 1):
                cell = zxy_to_cell(res, tx, ty)
                lon0, lat0, lon1, lat1 = cell_bounds(cell)
                corners_x = np.array([lon0, lon1, lon1, lon0])
                corners_y = np.array([lat0, lat0, lat1, lat1])
                inside = points_in_ring(corners_x, corners_y, ring)
                full = bool(inside.all()) and not any(
                    _segment_intersects_box(
                        ring[i - 1][0], ring[i - 1][1], ring[i][0], ring[i][1],
                        lon0, lat0, lon1, lat1,
                    )
                    for i in range(len(ring))
                )
                out.append((cell, p.poly_id, full))
    return out


def ray_cast_udf(spark, polys: list[Polygon]):
    """Vectorized exact point-in-polygon as a scalar pandas UDF.

    Polygon rings ship once per executor via a broadcast variable —
    closures would re-pickle per task.
    """
    rings_bc = spark.sparkContext.broadcast({p.poly_id: p.ring for p in polys})

    @F.pandas_udf("boolean")
    def _inside(poly_id: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
        rings = rings_bc.value
        lonv = lon.to_numpy(np.float64)
        latv = lat.to_numpy(np.float64)
        out = np.zeros(len(poly_id), dtype=bool)
        for pid in poly_id.unique():
            m = (poly_id == pid).to_numpy()
            out[m] = points_in_ring(lonv[m], latv[m], rings[pid])
        return pd.Series(out)

    return _inside


def pip_join(
    docs: DataFrame,
    polys: list[Polygon],
    res: int,
    lon: Column | str = "lon",
    lat: Column | str = "lat",
) -> DataFrame:
    """Point-in-polygon join: docs × polygons → (doc columns, poly_id).

    Emits one output row per (document, containing polygon) pair —
    overlapping polygons multiply rows, matching the relational
    semantics the oracle checks.
    """
    spark = docs.sparkSession
    lon = F.col(lon) if isinstance(lon, str) else lon
    lat = F.col(lat) if isinstance(lat, str) else lat
    cover = spark.createDataFrame(
        build_cover(polys, res), "cell long, poly_id string, full boolean"
    )
    docs_c = docs.withColumn("cell", cell_encode_cols(lon, lat, res))
    cand = docs_c.join(F.broadcast(cover), "cell")
    inside = ray_cast_udf(spark, polys)
    return (
        cand.where(F.col("full") | inside(F.col("poly_id"), lon, lat))
        .drop("full")
    )


def salted_cell_counts(
    docs_with_cell: DataFrame, salt_k: int = 16, count_col: str = "n_docs"
) -> DataFrame:
    """Per-cell counts via two-level salted aggregation (E5).

    Level 1 groups on (cell, salt) — the hot cell's rows spread over
    ``salt_k`` reducers; level 2 sums the tiny partials. Same result
    as a direct groupBy(cell).count(), immune to single-key skew.
    """
    salted = docs_with_cell.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_k))
    )
    partial = salted.groupBy("cell", "_salt").agg(F.count(F.lit(1)).alias("_partial"))
    return partial.groupBy("cell").agg(F.sum("_partial").cast("long").alias(count_col))


def salted_repartition(df: DataFrame, key: str, salt_k: int, n_partitions: int) -> DataFrame:
    """Explicit salted repartition before a heavy per-key stage —
    spreads a hot key over ``salt_k`` partitions (north_rule E5)."""
    return (
        df.withColumn("_salt", F.pmod(F.xxhash64(*df.columns), F.lit(salt_k)))
        .repartition(n_partitions, F.col(key), F.col("_salt"))
        .drop("_salt")
    )
