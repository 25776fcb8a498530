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
