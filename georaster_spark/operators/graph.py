"""Iterative graph algorithms as repeated DataFrame joins.

PageRank is the canonical "iterative linear algebra on Spark" shape:
each iteration is one equi-join of the edge list with the current
rank vector plus one partial-aggregated groupBy on the destination —
both shuffles keyed on the SAME node id, so at scale the edge list is
hash-partitioned once and every iteration reuses that partitioning
(no re-shuffle of edges; AQE keeps the small rank side co-located).
A fixed iteration count keeps the whole computation one lazy plan —
no driver-side convergence collect in the hot path; run-to-converge
callers can wrap it with a coarse delta check every k iterations.

The connected-components analog (alternating large-star/small-star)
lives in operators/dedup.py; this module holds rank-propagation
style algorithms where edge weights matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over ``nodes (v)`` / ``edges (src, dst)``.

    r_{t+1}(v) = (1 - damping)/N + damping * Σ_{u→v} r_t(u)/outdeg(u),
    starting from the uniform vector. Nodes without in-links keep the
    teleport term (left join + coalesce 0); dangling nodes (no
    out-links) contribute nothing, matching the simple formulation the
    DuckDB oracle mirrors as chained CTEs.
    """
    cnt = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    ranks = nodes.crossJoin(F.broadcast(cnt)).select(
        "v", (F.lit(1.0) / F.col("n")).alias("r")
    )
    teleport = F.lit(1.0 - damping) / F.col("n")
    for _ in range(iters):
        contribs = (
            edges.join(ranks.withColumnRenamed("v", "src"), "src")
            .join(outdeg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("r") / F.col("deg")).alias("s"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(cnt))
            .join(contribs.withColumnRenamed("dst", "v"), "v", "left")
            .select(
                "v",
                (teleport + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))).alias("r"),
            )
        )
    return ranks
