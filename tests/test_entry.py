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


def _load_recent_correctness(repo: str, n: int = 2):
    """The up-to-n most recent CORRECTNESS_r*.json files, newest
    last, as (paths, list-of-dicts)."""
    import glob
    import json

    paths = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))[-n:]
    return paths, [json.load(open(p)) for p in paths]


def _tail_missing(keys, rounds, unchecked, renamed):
    """Tail entries (positions 51+) with no green row in ANY of the
    given correctness rounds, resolving renamed keys through the
    rename ledger. Pure so the twice-stale failure mode is testable."""

    def green(k):
        for name in (k, renamed.get(k)):
            if name is None:
                continue
            for rows in rounds:
                if name in rows and rows[name]["hash_match"]:
                    return True
        return False

    return [k for k in keys[50:] if not green(k) and k not in unchecked]


def test_catalog_window_tail_has_prior_driver_rows():
    """Rotation contract: every entry OUTSIDE the driver's first-50
    verification window must have a green row in one of the TWO most
    recent CORRECTNESS files, so window ∪ recent-rounds covers the
    whole catalog. Two-round tolerance (VERDICT r4 task 4) keeps the
    suite green in the normal post-driver state — the file for round
    N lands while the catalog is still in its round-N rotation, which
    would otherwise flip the guard red for every tail entry the
    moment the driver runs — while still tripping for entries absent
    from BOTH recent rounds (twice-stale). Renamed keys resolve
    through queries.RENAMED_KEYS to the old key whose row verified
    byte-identical text (rows recorded before the rename commit).
    FINAL_ROUND_DEMOTED entries (head slots ceded to never-checked
    pairs in the final rotation) are exempt from the two-recent-round
    rule but must instead show green rows in at least TWO prior
    rounds across the full history — a stale demotion of a
    once-checked entry still trips."""
    from georaster_spark.queries import (
        DRIVER_UNCHECKED_NEW,
        FINAL_ROUND_DEMOTED,
        RENAMED_KEYS,
    )

    keys = list(E.queries())
    repo = os.path.dirname(E.__file__)
    paths, rounds = _load_recent_correctness(repo)
    exempt = DRIVER_UNCHECKED_NEW | FINAL_ROUND_DEMOTED
    missing = _tail_missing(keys, rounds, exempt, RENAMED_KEYS)
    assert missing == [], (paths, missing)
    # each demoted entry must be in the tail with >=2 green rows in
    # the full correctness history (no once-checked entry may hide
    # behind the demotion ledger)
    _, all_rounds = _load_recent_correctness(repo, n=100)
    for k in FINAL_ROUND_DEMOTED:
        assert k in keys[50:], f"{k} demoted but not in the tail"
        greens = sum(
            1 for rows in all_rounds if k in rows and rows[k]["hash_match"]
        )
        assert greens >= 2, (
            f"FINAL_ROUND_DEMOTED entry {k} has only {greens} green "
            "driver rows — not eligible for demotion"
        )
    # the exception list may only name entries that truly have no
    # prior row (it must not mask a stale demotion), and entries it
    # names must not already be driver-covered
    assert all(
        k not in rows for k in DRIVER_UNCHECKED_NEW for rows in rounds
    ), (
        "DRIVER_UNCHECKED_NEW names an entry with a driver row — "
        "remove it from the exception list"
    )
    # a renamed key must not ALSO exist under its old name in the
    # live catalog (that would be a shadowing, not a rename)
    assert all(
        old not in keys[50:] for old in RENAMED_KEYS.values()
    ), "rename ledger points at a key still present in the tail"


def test_tail_guard_trips_for_twice_stale_entry():
    """The two-round tolerance must NOT mask an entry absent from
    both recent rounds: a synthetic twice-stale tail entry fails."""
    keys = ["h%d" % i for i in range(50)] + ["fresh", "stale"]
    rounds = [{"fresh": {"hash_match": True}}, {}]
    assert _tail_missing(keys, rounds, set(), {}) == ["stale"]
    # ...unless the rename ledger maps it to a green old row
    rounds = [{"old_stale": {"hash_match": True}}, {}]
    assert _tail_missing(keys, rounds, set(), {"stale": "old_stale"}) == [
        "fresh"
    ]


def test_no_shadowed_definitions():
    """Guard against VERDICT r4 'What's wrong' #1: a module-level
    def/assignment in queries.py silently REPLACING an earlier one
    (Python name reuse swapped stratified_sample's semantics in
    round 4 without any test noticing). Every top-level function
    name must be defined exactly once."""
    import ast
    import collections

    import georaster_spark.queries as Q

    src = open(Q.__file__.rstrip("c")).read()
    tree = ast.parse(src)
    names = collections.Counter(
        node.name
        for node in tree.body
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
    )
    dupes = {n: c for n, c in names.items() if c > 1}
    assert not dupes, f"shadowed top-level definitions in queries.py: {dupes}"


def test_no_shadowed_test_definitions():
    """Same shadowing class, but in the TEST tree: two defs of one
    test name mean pytest silently collects only the later one —
    the earlier test stops running without any failure (this bit
    tests/test_workloads.py in round 5, where a second
    test_stratified_sample_semantics masked the first). Every
    top-level def in every tests/*.py must be unique within its
    module."""
    import ast
    import collections
    import glob
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    bad = {}
    for path in sorted(glob.glob(os.path.join(here, "*.py"))):
        tree = ast.parse(open(path).read())
        names = collections.Counter(
            node.name
            for node in tree.body
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
        )
        dupes = {n: c for n, c in names.items() if c > 1}
        if dupes:
            bad[os.path.basename(path)] = dupes
    assert not bad, f"shadowed top-level test definitions: {bad}"
