"""kNN via cell-ring expansion (engine op E6).

For each query point: start at its cell, expand Chebyshev rings
k=0,1,2,… until every query has ≥ k candidates AND the kth candidate
distance is provably inside the searched disk (ring-boundary distance
guarantee) — then an exact haversine top-k over candidates only.

Plan shape: the (query, cell) candidate index is tiny and broadcast;
documents are probed with an equi-join on ``cell`` (no shuffle of the
big side), and only the final top-k does a shuffle, partitioned by
query id — bounded by n_queries × candidates, not by table size.
Generalizes the reference's world→tile→local-sample lookup
(``src/pmtiles.rs:37-51``) from one tile to an expanding disk.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from georaster_spark.cells import cell_bounds, cell_disk_py, cell_encode_py
from georaster_spark.functions.geo import EARTH_RADIUS_M, haversine_cols


def _disk_boundary_dist_m(cell: int, rings: int) -> float:
    """Lower bound on the distance from a cell's center to anything
    OUTSIDE the disk of ``rings`` rings around it: ``rings`` times the
    cell's minimum extent, minus half a diagonal for the query's own
    offset inside its cell. Conservative by construction."""
    lon0, lat0, lon1, lat1 = cell_bounds(cell)
    # meters per degree at this latitude band
    lat_mid = (lat0 + lat1) / 2
    m_per_deg_lat = math.pi * EARTH_RADIUS_M / 180.0
    m_per_deg_lon = m_per_deg_lat * math.cos(math.radians(lat_mid))
    cell_h = (lat1 - lat0) * m_per_deg_lat
    cell_w = (lon1 - lon0) * m_per_deg_lon
    half_diag = 0.5 * math.hypot(cell_w, cell_h)
    return max(rings * min(cell_w, cell_h) - half_diag, 0.0)


def knn_table_join(
    docs: DataFrame,
    pois: list[tuple[str, float, float]],
    k: int,
    res: int,
    ring: int = 1,
    lon_col: str = "lon",
    lat_col: str = "lat",
    doc_key: str = "doc_id",
) -> DataFrame:
    """k nearest POIs for EVERY document — the table-scale kNN (E6
    generalized from per-query to per-row, the shape a 100 TB
    enrichment actually runs).

    Plan: each POI's cell-disk at resolution ``res`` is expanded
    driver-side and broadcast; docs equi-join on their own cell (one
    narrow probe — the big side never shuffles for candidate
    generation), then a per-doc window takes the top-k. Chebyshev
    symmetry makes the poi→disk index equivalent to probing the doc's
    own disk. Docs whose kth candidate is NOT provably inside the
    searched disk (ring-boundary bound, cf. ``_disk_boundary_dist_m``)
    — or with < k candidates — fall back to an exact broadcast
    cross-join against the full POI list; the union is exactly the
    brute-force result for every doc.

    Returns (<doc_key>, poi_id, dist_m, rank); ties break on
    (dist, poi_id). One shuffle total (the top-k window on doc key).
    """
    from georaster_spark.cells import cell_encode_cols

    spark: SparkSession = docs.sparkSession
    docs_c = docs.where(F.col(lon_col).isNotNull()).withColumn(
        "cell", cell_encode_cols(F.col(lon_col), F.col(lat_col), res)
    )

    idx_rows = [
        (c, pid, plon, plat)
        for pid, plon, plat in pois
        for c in cell_disk_py(cell_encode_py(plon, plat, res), ring)
    ]
    idx = spark.createDataFrame(
        idx_rows, "cell long, poi_id string, p_lon double, p_lat double"
    )

    dist = haversine_cols(F.col(lon_col), F.col(lat_col), F.col("p_lon"), F.col("p_lat"))
    w = Window.partitionBy(doc_key).orderBy(F.col("dist_m").asc(), F.col("poi_id").asc())
    cand = (
        docs_c.join(F.broadcast(idx), "cell")
        .withColumn("dist_m", dist)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )

    # per-doc disk-boundary bound from the doc's OWN cell geometry —
    # Column form of _disk_boundary_dist_m
    from georaster_spark.cells import cell_bounds_cols

    lon0, lat0, lon1, lat1 = cell_bounds_cols(F.col("cell"), res)
    m_per_deg_lat = math.pi * EARTH_RADIUS_M / 180.0
    lat_mid = (lat0 + lat1) / 2
    cell_h = (lat1 - lat0) * F.lit(m_per_deg_lat)
    cell_w = (lon1 - lon0) * F.lit(m_per_deg_lat) * F.cos(F.radians(lat_mid))
    half_diag = F.sqrt(cell_w * cell_w + cell_h * cell_h) / 2
    boundary = F.greatest(
        F.lit(float(ring)) * F.least(cell_w, cell_h) - half_diag, F.lit(0.0)
    )

    # stats carry `cell` (functionally dependent on the doc) so the
    # boundary derives inside the aggregate — no re-join with docs.
    # The proven set is doc-keyed and potentially huge: it flows
    # through semi/anti joins on doc_key (the window already
    # partitioned cand that way), NEVER through a broadcast.
    stats = (
        cand.groupBy(doc_key, "cell")
        .agg(F.count(F.lit(1)).alias("_cnt"), F.max("dist_m").alias("_kth"))
        .withColumn("_proven", (F.col("_cnt") >= k) & (F.col("_kth") <= boundary))
    )
    proven_keys = stats.where(F.col("_proven")).select(doc_key)

    fast = cand.join(proven_keys, doc_key, "left_semi")
    # anti join keeps docs with too-few candidates AND docs with zero
    # candidates (absent from stats entirely)
    exact_docs = docs_c.join(proven_keys, doc_key, "left_anti").select(
        doc_key, lon_col, lat_col
    )
    pois_df = spark.createDataFrame(pois, "poi_id string, p_lon double, p_lat double")
    exact = (
        exact_docs.crossJoin(F.broadcast(pois_df))
        .withColumn("dist_m", dist)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
    out_cols = [doc_key, "poi_id", "dist_m", "rank"]
    return fast.select(*out_cols).unionByName(exact.select(*out_cols))


def knn_join(
    docs: DataFrame,
    query_points: list[tuple[str, float, float]],
    k: int,
    res: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
    doc_key: str = "url",
    max_rings: int = 64,
) -> DataFrame:
    """k nearest documents to each query point.

    ``query_points``: [(query_id, lon, lat)]. Returns
    (query_id, <doc_key>, dist_m, rank) with deterministic
    tie-breaking on (dist, doc_key).

    SCALE BOUNDARY: the ring-candidate list is built driver-side per
    query point (|Q| x disk(rings) rows through createDataFrame +
    broadcast), which is right for interactive / few-hundred-query
    workloads only. For large query SETS use ``knn_table_join`` —
    the table-scale path where candidates come from a broadcast disk
    index and the corpus side never leaves the executors.
    """
    spark: SparkSession = docs.sparkSession
    docs_c = docs.where(F.col(lon_col).isNotNull())
    from georaster_spark.cells import cell_encode_cols

    docs_c = docs_c.withColumn("cell", cell_encode_cols(F.col(lon_col), F.col(lat_col), res))
    # cache: probed once per expansion round
    docs_c = docs_c.persist()
    try:
        qcells = {qid: cell_encode_py(lon, lat, res) for qid, lon, lat in query_points}
        pending = {qid: (lon, lat) for qid, lon, lat in query_points}
        rings = 1
        while True:
            cand_rows = [
                (qid, c, pending[qid][0], pending[qid][1])
                for qid in pending
                for c in cell_disk_py(qcells[qid], rings)
            ]
            cand_idx = spark.createDataFrame(
                cand_rows, "query_id string, cell long, q_lon double, q_lat double"
            )
            cand = docs_c.join(F.broadcast(cand_idx), "cell")
            w = Window.partitionBy("query_id").orderBy(F.col("dist_m").asc(), F.col(doc_key).asc())
            topk = (
                cand.withColumn(
                    "dist_m",
                    haversine_cols(
                        F.col(lon_col), F.col(lat_col), F.col("q_lon"), F.col("q_lat")
                    ),
                )
                .withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k)
                .select("query_id", doc_key, "dist_m", "rank")
            )
            # top-k is at most k rows per query — collect it ONCE and
            # derive both the convergence check and (when done) the
            # result from the same rows; returning `topk` directly
            # would recompute the whole candidate join at the caller's
            # first action.
            rows = topk.collect()
            got: dict[str, tuple[int, float]] = {}
            for r in rows:
                cnt, kth = got.get(r["query_id"], (0, 0.0))
                got[r["query_id"]] = (cnt + 1, max(kth, r["dist_m"]))
            done = all(
                qid in got
                and got[qid][0] >= k
                and got[qid][1] <= _disk_boundary_dist_m(qcells[qid], rings)
                for qid in pending
            )
            if done or rings >= max_rings:
                return spark.createDataFrame(rows, topk.schema)
            rings *= 2
    finally:
        docs_c.unpersist()
