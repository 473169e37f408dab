"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship geocode → cell-encode →
point-in-polygon pipeline on sf0.001; ``queries()`` /
``oracle_sql()`` expose the full operator catalog from
``georaster_spark.queries`` for the sf0.01 DuckDB value-hash oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from georaster_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
