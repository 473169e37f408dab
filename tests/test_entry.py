"""Driver-contract smoke tests: entry() and the queries() catalog."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as E

SF_SMALL = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_SMALL), reason="driver testdata not present"
)


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"poly_id", "n_docs", "n_langs", "sum_chars"} <= set(df.columns)


def test_every_query_has_oracle_or_is_marked(spark):
    qs = E.queries()
    oracles = E.oracle_sql()
    assert set(oracles) <= set(qs)
    # current catalog: full oracle coverage
    assert set(oracles) == set(qs)


def test_queries_run_at_smallest_sf(spark):
    """Each catalog query must at least execute and return a schema at
    sf0.001 (values checked against DuckDB by tools/check_oracle.py)."""
    for name, fn in E.queries().items():
        df = fn(spark, SF_SMALL)
        assert df.columns, name
        df.limit(5).collect()
