"""Driver-contract smoke tests at sf0.001 (the driver's t1 gate shape)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    out = df.collect()
    assert len(out) >= 1
    assert "l_returnflag" in df.columns


def test_queries_and_oracles_consistent():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 40
    # every oracle key must have a query
    missing = set(oracles) - set(qs)
    assert not missing, f"oracles without queries: {missing}"


def test_all_queries_build_dataframes(spark, sf_dir):
    """Every queries() entry must at least construct a DataFrame plan
    (analysis errors surface here without executing)."""
    qs = entry_mod.queries()
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        _ = df.schema  # forces analysis


def test_all_oracle_sqls_run_in_duckdb(sf_dir):
    """Every oracle SQL parses and executes in DuckDB at sf0.001 — a
    fast syntax/semantics guard (the full value compare is tools/check.py
    and the round driver at sf0.01)."""
    import duckdb

    import __spark_entry__ as m

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracles = m.oracle_sql()
    assert len(m.queries()) == 50
    failures = {}
    for name, sql in oracles.items():
        try:
            con.sql(sql).fetchall()
        except Exception as ex:  # noqa: BLE001
            failures[name] = str(ex)[:200]
    assert not failures, failures
