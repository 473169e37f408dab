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


def ray_cast_edge_cols(lon: Column, lat: Column, max_vertices: int) -> Column:
    """Even-odd point-in-polygon over FLAT edge columns.

    Expects the joined row to carry ``x0_j, y0_j, x1_j, y1_j`` double
    columns (one quad per polygon edge, NULL-padded to
    ``max_vertices`` — see ``cover_df``). The parity fold is plain
    scalar arithmetic on flat doubles: small expression tree, fully
    inside WholeStageCodegen. Alternatives measured on 48M candidate
    rows: higher-order ``aggregate`` over ARRAY<STRUCT> ~33µs/row
    (interpreted); unrolled ``try_element_at`` worse (codegen
    fallback); a pandas-UDF kernel anti-scaled with cores (Python
    workers compete with executor threads). Flat-column unroll is the
    one that scales.

    NULL padding: the edge test is NULL → ``coalesce(…, False)``.
    Horizontal edges: division yields ±Inf/NaN but the crossing guard
    is False (double division never throws, even under ANSI).
    """
    inside = F.lit(False)
    for j in range(max_vertices):
        x0, y0 = F.col(f"x0_{j}"), F.col(f"y0_{j}")
        x1, y1 = F.col(f"x1_{j}"), F.col(f"y1_{j}")
        test = ((y0 > lat) != (y1 > lat)) & (
            lon < (x1 - x0) * (lat - y0) / (y1 - y0) + x0
        )
        inside = inside != F.coalesce(test, F.lit(False))
    return inside


def cover_df(spark, polys: list[Polygon], res: int) -> tuple[DataFrame, int]:
    """Broadcastable cover index with FLAT edge columns:
    (cell, poly_id, full, x0_0, y0_0, x1_0, y1_0, …) — the polygon
    edges ride along (NULL for full cells / padding) so the exact
    test is pure flat-double arithmetic after the join. Returns
    (cover, max_vertices)."""
    mv = max(len(p.ring) for p in polys)
    rings = {p.poly_id: p.ring for p in polys}
    rows = []
    for cell, pid, full in build_cover(polys, res):
        ring = rings[pid]
        edges: list[float | None] = []
        for j in range(mv):
            if full or j >= len(ring):
                edges += [None, None, None, None]
            else:
                x1, y1 = ring[j]
                x0, y0 = ring[j - 1]
                edges += [float(x0), float(y0), float(x1), float(y1)]
        rows.append((cell, pid, full, *edges))
    edge_schema = ", ".join(
        f"x0_{j} double, y0_{j} double, x1_{j} double, y1_{j} double" for j in range(mv)
    )
    return (
        spark.createDataFrame(rows, f"cell long, poly_id string, full boolean, {edge_schema}"),
        mv,
    )


def pip_join(
    docs: DataFrame,
    polys: list[Polygon],
    res: int,
    lon: Column | str = "lon",
    lat: Column | str = "lat",
    method: str = "expr",
) -> DataFrame:
    """Point-in-polygon join: docs × polygons → (doc columns, poly_id).

    Emits one output row per (document, containing polygon) pair —
    overlapping polygons multiply rows, matching the relational
    semantics the oracle checks.

    ``method='expr'`` (default) runs the exact ray-cast as Column
    algebra (JVM, scales linearly with cores); ``method='pandas'``
    uses the Arrow-vectorized NumPy kernel (kept for parity and for
    polygon sets too large to ship per-row).
    """
    spark = docs.sparkSession
    lon = F.col(lon) if isinstance(lon, str) else lon
    lat = F.col(lat) if isinstance(lat, str) else lat
    docs_c = docs.withColumn("cell", cell_encode_cols(lon, lat, res))
    if method == "expr":
        cover, max_v = cover_df(spark, polys, res)
        cand = docs_c.join(F.broadcast(cover), "cell")
        edge_cols = [
            f"{p}_{j}" for j in range(max_v) for p in ("x0", "y0", "x1", "y1")
        ]
        return cand.where(
            F.col("full") | ray_cast_edge_cols(lon, lat, max_v)
        ).drop("full", *edge_cols)
    cover = spark.createDataFrame(
        build_cover(polys, res), "cell long, poly_id string, full boolean"
    )
    cand = docs_c.join(F.broadcast(cover), "cell")
    inside = ray_cast_udf(spark, polys)
    return cand.where(F.col("full") | inside(F.col("poly_id"), lon, lat)).drop("full")


def _disk1_cells_col(cell: Column, res: int) -> Column:
    """ARRAY of the 9 cells in a cell's Chebyshev disk(1) as pure
    Column algebra — x wraps at the antimeridian, y clamps at the
    poles (out-of-range neighbors dropped via array filter)."""
    from georaster_spark.cells import _XSHIFT, _ZSHIFT, cell_zxy_cols

    n = 1 << res
    _, x, y = cell_zxy_cols(cell)
    entries = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            xx = (x + F.lit(dx) + F.lit(n)) % F.lit(n)
            yy = y + F.lit(dy)
            entries.append(
                F.when(
                    (yy >= 0) & (yy < n),
                    F.lit(res).cast("long") * F.lit(_ZSHIFT) + xx * F.lit(_XSHIFT) + yy,
                )
            )
    return F.array_compact(F.array(*entries))


def _min_cell_extent_m(res: int, max_abs_lat: float) -> float:
    """Safe minimum ground extent of a res-cell within the latitude
    band (shared by the join guard and auto-res so the two can never
    drift): lon extent shrinks by cos(lat); mercator cell height
    (deg) also shrinks ~cos(lat). A doc AT max_abs_lat sits in a
    cell whose far edge reaches beyond it — mercator dφ = dy*cos(φ)
    ≤ deg, so max_abs_lat+deg bounds the far edge — and the cos(lat)
    height model is only first-order, so keep a 0.95 margin."""
    import math as _m

    from georaster_spark.functions.geo import EARTH_RADIUS_M

    deg = 360.0 / (1 << res)
    m_per_deg = _m.pi * EARTH_RADIUS_M / 180.0
    lat_edge = min(89.9, max_abs_lat + deg)
    return 0.95 * deg * m_per_deg * _m.cos(_m.radians(lat_edge))


def auto_res_for_distance(d_meters: float, max_abs_lat: float = 85.0) -> int:
    """Finest cell resolution whose disk(1) adjacency guarantee holds
    for ``d_meters`` within the |lat| ≤ max_abs_lat band — the res a
    caller should feed ``within_distance_pairs``. Finer is better
    (smaller candidate sets), so walk down from fine to coarse and
    return the first res that passes the join's own guard."""
    for res in range(24, -1, -1):
        if d_meters <= _min_cell_extent_m(res, max_abs_lat):
            return res
    raise ValueError(f"no resolution satisfies d={d_meters}m at |lat|<={max_abs_lat}")


def within_distance_pairs(
    docs: DataFrame,
    d_meters: float,
    res: int | None = None,
    key: str = "doc_id",
    lon: str = "lon",
    lat: str = "lat",
    max_abs_lat: float = 85.0,
) -> DataFrame:
    """All (a < b) document pairs within ``d_meters`` — the
    ST_DWithin self-join, rewritten from a quadratic theta-join into
    a cell EQUI-join (the only shape that scales):

    - left side explodes each doc onto its Chebyshev disk(1) cells
      (9x narrow amplification, no shuffle to build);
    - right side keys by its own cell, so each qualifying pair joins
      on exactly ONE cell (b's) — no post-join dedup needed;
    - exact haversine ≤ d filters candidates JVM-side.

    Correct iff ``d_meters`` ≤ the minimum cell extent at ``res``
    within the data's latitude band (guarded below): any pair within
    d then lies in the same or an adjacent cell. Skewed hot cells
    fall to AQE's skew-join splitting (the join key is the cell).
    """
    from georaster_spark.cells import cell_encode_cols

    if res is None:
        res = auto_res_for_distance(d_meters, max_abs_lat)

    min_extent = _min_cell_extent_m(res, max_abs_lat)
    if d_meters > min_extent:
        raise ValueError(
            f"d={d_meters}m exceeds safe min cell extent {min_extent:.0f}m at res"
            f" {res} for |lat|<={max_abs_lat} — use a coarser res"
        )

    keyed = docs.withColumn("cell", cell_encode_cols(F.col(lon), F.col(lat), res))
    left = keyed.select(
        F.col(key).alias("key_a"),
        F.col(lon).alias("lon_a"),
        F.col(lat).alias("lat_a"),
        F.explode(_disk1_cells_col(F.col("cell"), res)).alias("cell"),
    )
    right = keyed.select(
        F.col(key).alias("key_b"),
        F.col(lon).alias("lon_b"),
        F.col(lat).alias("lat_b"),
        "cell",
    )
    from georaster_spark.functions.geo import haversine_cols as _hav

    dist = _hav(F.col("lon_a"), F.col("lat_a"), F.col("lon_b"), F.col("lat_b"))
    return (
        left.join(right, "cell")
        .where(F.col("key_a") < F.col("key_b"))
        .withColumn("dist_m", dist)
        .where(F.col("dist_m") <= F.lit(float(d_meters)))
        .select("key_a", "key_b", "dist_m")
    )


def salted_cell_counts(
    docs_with_cell: DataFrame,
    salt_k: int = 16,
    count_col: str = "n_docs",
    salt_key: str | None = None,
    salt_expr: Column | None = None,
) -> DataFrame:
    """Per-cell counts via two-level salted aggregation (E5).

    Level 1 groups on (cell, salt) — the hot cell's rows spread over
    ``salt_k`` reducers; level 2 sums the tiny partials. Same result
    as a direct groupBy(cell).count(), immune to single-key skew.

    The salt hashes a DETERMINISTIC per-row key (``salt_key``, else
    the first non-cell column): a nondeterministic salt
    (monotonically_increasing_id / rand) blocks Catalyst reordering
    and measurably anti-scaled.
    """
    if salt_expr is None:
        if salt_key is None:
            salt_key = next(c for c in docs_with_cell.columns if c != "cell")
        salt_expr = F.pmod(F.xxhash64(F.col(salt_key)), F.lit(salt_k))
    salted = docs_with_cell.withColumn("_salt", salt_expr)
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


def salted_equi_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_key: str,
    salt_k: int = 16,
    hot_keys: list | None = None,
) -> DataFrame:
    """Explicit skew-salted INNER equi-join on ``key`` (E5's join
    counterpart): the skewed LEFT side gets a deterministic salt in
    [0, salt_k) hashed from ``salt_key``; the RIGHT side is
    replicated ``salt_k`` ways, and the join key becomes
    (key, salt) — a hot key's probe rows land in ``salt_k`` separate
    shuffle partitions instead of one straggler task. The result is
    IDENTICAL to ``left.join(right, key)``: every left row meets each
    matching right row exactly once, through its own salt replica.

    ``hot_keys=None`` salts EVERY key — simple, but it multiplies the
    whole build side's shuffle volume by ``salt_k``; BENCH/SF1_STRESS.md
    measures that cost dominating when the build side is large, with
    AQE's runtime skew-split beating it. Pass ``hot_keys`` (from a
    cheap count pre-pass, or known a priori as in pip_join_hot's hot
    cells) to salt ONLY those keys: the cold partition joins plain,
    the hot partition joins salted, and only the hot keys' build rows
    replicate — the form that wins at 100 TB and that also covers
    stages AQE cannot re-plan (stateful/custom kernels).
    """
    salt = F.pmod(F.xxhash64(F.col(salt_key)), F.lit(salt_k)).cast("int")
    if hot_keys is None:
        l_s = left.withColumn("_salt", salt)
        r_s = right.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_k - 1)))
        )
        return l_s.join(r_s, [key, "_salt"]).drop("_salt")
    is_hot = F.col(key).isin(list(hot_keys))
    cold = left.where(~is_hot).join(right.where(~is_hot), key)
    l_hot = left.where(is_hot).withColumn("_salt", salt)
    r_hot = right.where(is_hot).withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_k - 1)))
    )
    hot = l_hot.join(r_hot, [key, "_salt"]).drop("_salt")
    return cold.unionByName(hot)
