"""Headline benchmark — runs the engine's flagship queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is total wall-clock over the headline suite; ``queries``
holds per-query seconds. The docs/sec north metric and the N-vs-4N
scaling protocol live in tools/bench_scaling.py (writes BENCH/
BASELINE.md evidence).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "geocode_cells",
    "cell_hist",
    "pip_join",
    "knn",
    "knn_table",
    "dtm_window_max",
    "dtm_overview_max",
    "tile_assignment",
    "rasterize_grid",
    "crop",
    "xyz_lookup",
    "tpch_q1",
    "revenue_join",
    "window_topk",
    "sessionize",
    "text_stats",
    "dedup_exact",
    "minhash_lsh",
    "embedding_topk",
    "simhash_pairs",
    "ann_ivf",
    "asof_join",
    "media_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from georaster_spark.session import get_spark
    from georaster_spark import queries as Q

    spark = get_spark("georaster_spark_bench", cores=cpus, shuffle_partitions=cpus)

    # warm the JVM/Arrow paths so per-query times measure the plans
    spark.range(1000).selectExpr("sum(id)").collect()

    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = Q.QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.time() - t0
        per_query[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {n} rows in {dt:.2f}s", file=sys.stderr)

    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_clock",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
