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


def test_all_oracle_sql_parses_in_duckdb():
    """Every oracle SQL string must at least PLAN in DuckDB against
    the registered table views — a seconds-fast syntax/semantic gate
    that catches oracle regressions without the full value sweep."""
    import duckdb

    con = duckdb.connect()
    tables = [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMALL}/{t}.parquet')"
        )
    bad = []
    for name, sql in E.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001 — collecting all failures
            bad.append((name, str(exc).splitlines()[0]))
    assert not bad, bad


def test_catalog_window_tail_has_prior_driver_rows():
    """Rotation contract: every entry OUTSIDE the driver's first-50
    verification window must have a green row in the PREVIOUS round's
    CORRECTNESS file (the highest-numbered one on disk), so
    window ∪ previous-round covers the whole catalog."""
    import glob
    import json

    from georaster_spark.queries import DRIVER_UNCHECKED_NEW

    keys = list(E.queries())
    repo = os.path.dirname(E.__file__)
    latest = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))[-1]
    prev = json.load(open(latest))
    missing = [
        k
        for k in keys[50:]
        if (k not in prev or not prev[k]["hash_match"])
        and k not in DRIVER_UNCHECKED_NEW
    ]
    assert missing == [], (latest, missing)
    # the exception list may only name entries that truly have no
    # prior row (it must not mask a stale demotion), and entries it
    # names must not already be driver-covered
    assert all(k not in prev for k in DRIVER_UNCHECKED_NEW), (
        "DRIVER_UNCHECKED_NEW names an entry with a driver row — "
        "remove it from the exception list"
    )
