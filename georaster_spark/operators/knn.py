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
