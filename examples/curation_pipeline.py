"""End-to-end webtext curation pipeline demo — the LLM-training-data
path through the engine, chained on one SparkSession:

  1. PII scrub          (zero-shuffle codegen regex redaction)
  2. quality gate       (doc_quality heuristics + repeated-n-gram spam)
  3. exact dedup        (one shuffle on the content fingerprint)
  4. near-dup removal   (MinHash+LSH banding -> connected components,
                         keep each cluster's lowest doc_id)
  5. weighted sampling  (portable-hash importance sample)
  6. snapshot commit    (Iceberg-style table layer, atomic pointer)

Run:  python examples/curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from georaster_spark import queries as Q  # noqa: E402
from georaster_spark.operators.dedup import (  # noqa: E402
    connected_components,
    ngram_jaccard_pairs_lsh,
)
from georaster_spark.session import get_spark  # noqa: E402
from georaster_spark.sources import icetable  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curation_pipeline", cores=8, shuffle_partitions=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. PII scrub (reuses the catalog operator's regexes)
    scrubbed = docs.withColumn(
        "text",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), Q.PII_EMAIL_RE, "<EMAIL>"),
                Q.PII_PHONE_RE,
                "<PHONE>",
            ),
            Q.PII_IP_RE,
            "<IP>",
        ),
    )

    # 2. quality gate: drop repetition spam (rep ratio > 0.5)
    tok = F.split(F.col("text"), " ")
    rep = 1.0 - F.size(F.array_distinct(tok)).cast("double") / F.size(tok)
    quality = scrubbed.where(rep <= 0.5)
    n2 = quality.count()

    # 3. exact dedup on the content fingerprint: keep lowest doc_id
    keepers = quality.groupBy(F.md5("text").alias("fp")).agg(
        F.min("doc_id").alias("doc_id")
    )
    # persist: five counts + the final write would otherwise recompute
    # the scrub/quality/dedup chain once per action
    uniq = quality.join(keepers.select("doc_id"), "doc_id").persist()
    n3 = uniq.count()

    # 4. near-dup clusters: LSH candidates VERIFIED by exact Jaccard
    # (>= 0.5) -> components; keep min id. Raw band collisions alone
    # would delete merely-similar documents.
    pairs = ngram_jaccard_pairs_lsh(uniq, threshold_e6=500000)
    comp = connected_components(pairs.select("doc_a", "doc_b"))
    losers = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    survivors = uniq.join(losers, "doc_id", "left_anti").persist()
    n4 = survivors.count()

    # 5. weighted importance sample (portable hash, reproducible)
    h = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 1000000
    )
    thr = F.round(F.least(F.lit(1.0), F.col("n_chars") / 400.0) * 300000.0, 0).cast(
        "long"
    )
    sampled = survivors.where(h < thr)
    n5 = sampled.count()

    # 6. snapshot commit through the table layer
    out = tempfile.mkdtemp(prefix="curated_docs_")
    icetable.write_table(sampled.select("doc_id", "text", "lang", "n_chars"), out)
    m = icetable.read_manifest(out)

    print(
        f"input {n0} -> quality {n2} -> exact-dedup {n3} -> "
        f"near-dedup {n4} -> sampled {n5}"
    )
    print(f"committed snapshot {m['snapshot_id']} at {out} ({len(m['files'])} files)")


if __name__ == "__main__":
    main()
