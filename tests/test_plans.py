"""Physical-plan regression gate: the scale-critical plan invariants
(broadcasts, pushdown, pruning, shuffle counts) from tools/plan_audit
must hold. Failures here mean a query's plan silently degraded."""

from __future__ import annotations

import importlib
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_SMALL = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_SMALL), reason="driver testdata not present"
)


def test_plan_invariants(spark):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    audit = importlib.import_module("plan_audit")
    assert audit.main() == 0


def test_aqe_skew_join_split_fires(spark):
    """Backstop for hot-cell skew the salting path doesn't cover: a
    sort-merge self-join keyed on a skewed cell must trigger AQE's
    skew-join split (OptimizeSkewedJoin). Thresholds are lowered so
    the synthetic hot key (20% of rows in one cell) crosses them at
    test scale; at 100 TB the defaults fire the same rewrite."""
    from pyspark.sql import functions as F

    tuned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        # enough partitions that the hot cell dwarfs the median
        # partition (earlier tests may have left a tiny count behind)
        "spark.sql.shuffle.partitions": "64",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        n = 40_000
        df = spark.range(n).select(
            # 20% of rows pin to one hot cell, rest spread over 1024
            F.when(F.col("id") % 5 == 0, F.lit(7777))
            .otherwise(F.col("id") % 1024)
            .alias("cell"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        a, b = df.alias("a"), df.alias("b")
        # global aggregate: no required distribution on the join key,
        # so OptimizeSkewedJoin is free to split the hot partition (a
        # groupBy(cell) on top would pin the partitioning and the
        # rule would decline — that shape is what salting is for)
        joined = a.join(b, "cell").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("cell") == 7777).cast("long")).alias("hot"),
            # keep the wide payload flowing through the join so the
            # hot shuffle partition actually crosses the byte
            # threshold (column pruning would shrink it to 8B/row)
            F.max(F.col("a.payload")).alias("mp"),
        )
        row = joined.collect()[0]
        expect_hot = 8000 * 8000
        per_cell = [0] * 1024
        for i in range(n):
            if i % 5 != 0:
                per_cell[i % 1024] += 1
        assert row.hot == expect_hot  # correctness under the split
        assert row.n == expect_hot + sum(c * c for c in per_cell)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"AQE skew split did not fire:\n{plan[:2000]}"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
