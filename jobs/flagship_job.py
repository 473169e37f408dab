"""Flagship pipeline as a ``spark-submit`` job (north rule: the
10^12-doc run ships via ``spark-submit --py-files dist/
georaster_spark.zip jobs/flagship_job.py``).

Two checkpointed stages over the Iceberg-style table layer, each
resumable per logical partition (E9/E10):

1. ``enrich`` — geocode + cell-encode every document (narrow; the
   per-partition (doc_id, text) checksum records the byte-identity
   invariant at pipeline entry);
2. ``join`` — point-in-polygon join + per-polygon rollup.

Re-running the job with the same ``--output`` is a no-op resume:
committed partitions are anti-joined away before any work happens.
The master URL comes from spark-submit (local[N] here, YARN/K8s on a
real cluster) — the job never pins one.

Prints ONE JSON line with stage stats + the text-identity audit.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_session(app_name: str = "georaster-flagship"):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--output", required=True, help="base dir for the output tables")
    ap.add_argument("--res", type=int, default=11, help="cell resolution (zoom)")
    ap.add_argument("--parts", type=int, default=64, help="logical checkpoint partitions")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from georaster_spark import cells
    from georaster_spark.datagen import polygons
    from georaster_spark.operators.spatial_join import pip_join
    from georaster_spark.plans import lineage
    from georaster_spark.queries import docs_geocoded
    from georaster_spark.sources import icetable

    spark = build_session()

    # checkpoint key: stable hash of the document key, NOT a Spark
    # partition id — resume works across any cluster shape
    docs = docs_geocoded(spark, args.sf_dir).withColumn(
        "part", F.pmod(F.xxhash64("doc_id"), F.lit(args.parts))
    )

    enrich_path = f"{args.output}/docs_enriched"
    s1 = lineage.run_stage(
        spark,
        "enrich",
        docs,
        lambda df: df.withColumn(
            "cell", cells.cell_encode_cols(F.col("lon"), F.col("lat"), args.res)
        ),
        part_col="part",
        output_path=enrich_path,
        checksum_cols=["doc_id", "text"],
    )
    enriched = icetable.read_table(spark, enrich_path)
    text_ok = lineage.verify_text_identity(docs, enriched, "part", ["doc_id", "text"])

    join_path = f"{args.output}/poly_stats"
    s2 = lineage.run_stage(
        spark,
        "join",
        enriched,
        lambda df: pip_join(df, polygons(), args.res)
        .groupBy("part", "poly_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        ),
        part_col="part",
        output_path=join_path,
    )
    out_rows = icetable.read_table(spark, join_path).count()

    result = {
        "enrich": s1,
        "join": s2,
        "text_identity_ok": bool(text_ok),
        "poly_stats_rows": int(out_rows),
        "sf_dir": args.sf_dir,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main(sys.argv[1:])
