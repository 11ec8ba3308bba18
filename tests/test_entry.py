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


def test_check_gate_is_type_aware():
    """Regression-pin the r11 window_ops failure class: the local gate must
    distinguish int 0 from str "0" per cell AND bigint from VARCHAR per
    column — the driver's hash is type-aware, and check.py's old str(v)
    canonicalization passed 4 local drives on a query the driver failed."""
    from tools.check import normalize_cell, type_family

    # per-cell: same rendered text, different python type => different canon
    assert normalize_cell(0) != normalize_cell("0")
    assert normalize_cell(True) != normalize_cell(1)
    # column families: the exact r11 divergence (spark bigint vs duck VARCHAR)
    assert type_family("bigint") != type_family("VARCHAR")
    # benign cross-engine spellings stay equal
    assert type_family("bigint") == type_family("HUGEINT")
    assert type_family("string") == type_family("VARCHAR")
    assert type_family("double") == type_family("DOUBLE")
    assert type_family("decimal(38,2)") == type_family("DECIMAL(38,2)")
    assert type_family("array<bigint>") == type_family("BIGINT[]")
    assert type_family("timestamp_ntz") == type_family("TIMESTAMP")
    # int vs float is a real divergence, not a benign spelling
    assert type_family("bigint") != type_family("DOUBLE")


def test_entry_type_parity(spark, sf_dir):
    """Every contract query's Spark dtypes must match its DuckDB oracle's
    result types at type-family granularity. This is schema-only (Spark
    analysis + DuckDB bind — no execution), so a future tagged-union
    slot-fold that lets union type-coercion diverge between the engines
    (the r11 window_ops bug: lit(None).cast('string') branches ∪ a LONG
    key => Spark LONG, oracle VARCHAR) fails here before the driver sees it."""
    import duckdb

    from tools.check import type_family

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    diverged = {}
    for name, fn in qs.items():
        if name not in oracles:
            continue
        spark_types = dict(fn(spark, sf_dir).dtypes)
        rel = con.sql(oracles[name])
        duck_types = dict(zip(rel.columns, [str(t) for t in rel.types]))
        bad = [
            f"{c}: spark={spark_types[c]} duck={duck_types[c]}"
            for c in spark_types
            if c in duck_types
            and type_family(spark_types[c]) != type_family(duck_types[c])
        ]
        if bad:
            diverged[name] = bad
    assert not diverged, diverged


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
