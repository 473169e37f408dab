"""IVF quantizer recall study -> BENCH/ANN_RECALL.md.

Measures ann recall@5 (vs brute force) for each quantizer init at a
fixed scan budget (n_centroids=8, nprobe=2 — every variant scans the
same ~2/8 of the corpus, so recall differences are attributable to
centroid quality alone). Queries are DISJOINT from every seed set:
the catalog's ann_ivf uses vec_id<5 queries, which coincide with the
first-k seeds and inflate naive recall (a query sitting on its own
centroid always co-buckets with its neighbors).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F  # noqa: N812

K = 5
N_CENTROIDS = 8
NPROBE = 2
Q_LO, Q_HI = 100, 120


def brute_topk(ann, e, k=K):
    en = ann.normalized(e).select("vec_id", "vnorm")
    q = en.where((F.col("vec_id") >= Q_LO) & (F.col("vec_id") < Q_HI)).select(
        F.col("vec_id").alias("query_id"), F.col("vnorm").alias("q_vnorm")
    )
    cos = ann.dot(F.col("vnorm"), F.col("q_vnorm"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        en.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id")
    )


def _pinned(spark, ann):
    from georaster_spark.ann_centroids import ANN_IVF_CENTROIDS

    return ann._cents_df(spark, ANN_IVF_CENTROIDS)


def main() -> int:
    from georaster_spark.operators import ann
    from georaster_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("ann_recall", cores=16, shuffle_partitions=16)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    truth = {(r.query_id, r.vec_id) for r in brute_topk(ann, e).collect()}
    queries = e.where((F.col("vec_id") >= Q_LO) & (F.col("vec_id") < Q_HI)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    variants = {
        "first-k (naive)": lambda: ann.centroids_row(e, N_CENTROIDS),
        "naive + lloyd x3": lambda: ann.kmeans_centroids(e, N_CENTROIDS, iters=3),
        "kmeans|| seed": lambda: ann.kmeans_parallel_init(e, N_CENTROIDS, rounds=3),
        "kmeans|| + lloyd x3": lambda: ann.kmeans_centroids(
            e, N_CENTROIDS, iters=3, init=ann.kmeans_parallel_init(e, N_CENTROIDS, rounds=3)
        ),
        "PINNED artifact (catalog)": lambda: _pinned(spark, ann),
    }
    rows = []
    for label, mk in variants.items():
        got = {
            (r.query_id, r.vec_id)
            for r in ann.ivf_topk(
                e, queries, K, n_centroids=N_CENTROIDS, nprobe=NPROBE, cents=mk()
            ).collect()
        }
        rows.append((label, len(got & truth) / len(truth)))
        print(f"{label}: recall@{K} = {rows[-1][1]:.3f}")

    bench = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH")
    with open(os.path.join(bench, "ANN_RECALL.md"), "w") as f:
        f.write(
            "# IVF quantizer recall (ann_ivf operator)\n\n"
            f"Input: `{sf_dir}/embeddings.parquet`; {Q_HI - Q_LO} queries "
            f"(vec_id {Q_LO}..{Q_HI - 1}, disjoint from all seed sets); "
            f"n_centroids={N_CENTROIDS}, nprobe={NPROBE} — every variant "
            "scans the same fraction of the corpus, so recall isolates "
            "centroid quality. Regenerate: `python tools/ann_recall.py`.\n\n"
            f"| quantizer init | recall@{K} vs brute force |\n|---|---:|\n"
        )
        for label, r in rows:
            f.write(f"| {label} | {r:.3f} |\n")
        f.write(
            "\nThe deterministic k-means|| seeding (hash-uniform coins, "
            "operators/ann.py kmeans_parallel_init) + Lloyd refinement is "
            "the scale configuration. Since round 3 the catalog's ann_ivf "
            "entry SHIPS that quantizer as a pinned artifact "
            "(georaster_spark/ann_centroids.py, trained offline by "
            "tools/pin_centroids.py); the DuckDB oracle consumes the same "
            "pinned table as a VALUES CTE, so the exact-oracle guarantee "
            "and the higher recall now coexist.\n"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
