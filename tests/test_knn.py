"""kNN ring-expansion tests vs brute-force cross-join oracle
(SURVEY.md M5)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from georaster_spark.datagen import documents_df, geocode_cols, geocode_np
from georaster_spark.functions.geo import haversine_np
from georaster_spark.operators.knn import knn_join

N_DOCS = 500
QUERIES = [
    ("q0", 7.5, 46.0),       # on the hot cell
    ("q1", 8.0, 46.0),       # box center
    ("q2", 6.95, 44.95),     # just outside the box (forces expansion)
]
K = 7


@pytest.fixture(scope="module")
def docs(spark):
    d = documents_df(spark, N_DOCS)
    lon, lat = geocode_cols(F.col("doc_seq"))
    return d.withColumn("lon", lon).withColumn("lat", lat)


def brute_force(k: int) -> dict[str, list[str]]:
    i = np.arange(N_DOCS)
    lon, lat = geocode_np(i)
    urls = [f"https://site{j % 997}.example/p/{j}" for j in i]
    out = {}
    for qid, qlon, qlat in QUERIES:
        d = haversine_np(lon, lat, np.full_like(lon, qlon), np.full_like(lat, qlat))
        order = sorted(range(N_DOCS), key=lambda j: (d[j], urls[j]))
        out[qid] = [urls[j] for j in order[:k]]
    return out


def test_knn_matches_brute_force(spark, docs):
    got_df = knn_join(docs, QUERIES, k=K, res=10)
    got: dict[str, list[str]] = {}
    for r in got_df.orderBy("query_id", "rank").collect():
        got.setdefault(r.query_id, []).append(r.url)
    want = brute_force(K)
    assert got == want


def test_knn_k_larger_than_ring(spark, docs):
    """k big enough that the first disk can't satisfy it — exercises
    the expansion loop and the boundary-distance guarantee."""
    got_df = knn_join(docs, [QUERIES[1]], k=60, res=12)
    rows = got_df.orderBy("rank").collect()
    assert len(rows) == 60
    want = brute_force(60)["q1"]
    assert [r.url for r in rows] == want


POIS = [(f"poi{i}", 7.1 + (i % 8) * 0.25, 45.1 + (i // 8) * 0.45) for i in range(40)]


def test_knn_table_join_matches_brute_force(spark, docs):
    """Every doc's top-3 POIs must equal the exact cross-join result —
    covering both the cell-index fast path and the boundary/too-few
    fallback path."""
    from georaster_spark.operators.knn import knn_table_join

    docs_k = docs.withColumn("doc_id", F.col("doc_seq"))
    got = {
        (r["doc_id"], r["rank"]): r["poi_id"]
        for r in knn_table_join(docs_k, POIS, k=3, res=9, ring=1, doc_key="doc_id").collect()
    }
    # brute force in NumPy
    i = np.arange(N_DOCS)
    lon, lat = geocode_np(i)
    import itertools
    want = {}
    for j in i:
        dists = sorted(
            (haversine_np(np.array([lon[j]]), np.array([lat[j]]),
                          np.array([plon]), np.array([plat]))[0], pid)
            for pid, plon, plat in POIS
        )
        for rank, (_, pid) in enumerate(dists[:3], 1):
            want[(j, rank)] = pid
    assert got == want
    assert len(got) == N_DOCS * 3


def test_knn_table_join_candidate_path_is_broadcast(spark, docs):
    from georaster_spark.operators.knn import knn_table_join

    docs_k = docs.withColumn("doc_id", F.col("doc_seq"))
    plan = knn_table_join(docs_k, POIS, k=3, res=9, doc_key="doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
