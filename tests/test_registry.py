"""Driver-contract integrity: every registered query is callable, every
oracle key has a query, and the SQL strings at least parse in DuckDB
against empty views (cheap schema-level sanity without Spark)."""

import duckdb
import pytest

import __spark_entry__ as entry

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def test_every_oracle_has_a_query():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(o) <= set(q), f"orphan oracles: {sorted(set(o) - set(q))}"


def test_queries_are_callable_and_named():
    for name, fn in entry.queries().items():
        assert callable(fn), name
        assert name.replace("_", "").isalnum(), f"odd query name {name!r}"


def test_oracle_sql_parses_in_duckdb():
    con = duckdb.connect()
    sf = "/root/testdata/sf0.01"
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    for name, sql in entry.oracle_sql().items():
        try:
            con.execute(f"SELECT * FROM ({sql}) LIMIT 0")
        except Exception as e:  # pragma: no cover
            pytest.fail(f"oracle SQL for {name!r} does not parse: {e}")


def test_correctness_window_covers_every_stale_query():
    """Rotation invariant (COVERAGE.md): every query whose newest
    official driver-green row is >2 rounds old must sit in the NEXT
    window (the first 50 queries() entries), so the 50-slot window
    cycling the 130-query registry never strands a stale row. Computed
    exactly the way tools/check_oracles.py --freshness does."""
    import glob
    import json
    import re

    newest: dict[str, int] = {}
    rounds: list[int] = []
    for f in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", f).group(1))
        rounds.append(rnd)
        try:
            doc = json.load(open(f))
        except Exception:
            continue  # malformed driver artifact: skip, same as the tool
        for q, v in doc.items():
            if isinstance(v, dict) and v.get("hash_match"):
                newest[q] = max(newest.get(q, 0), rnd)
    if not rounds:
        pytest.skip("no driver correctness artifacts yet")
    latest = max(rounds)
    keys = list(entry.queries())
    window = set(keys[:50])
    stale = [
        q for q in keys if 0 < newest.get(q, -1) <= latest - 2
    ]
    missing = sorted(q for q in stale if q not in window)
    assert not missing, (
        f"stale queries not in the upcoming 50-slot window: {missing} — "
        "reorder __spark_entry__.queries() (see COVERAGE.md rotation notes)"
    )
