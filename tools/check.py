"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given sf dir, runs the
matching ``oracle_sql()`` in DuckDB over the same parquet tables, and compares
row count + column names + column type families + order-insensitive TYPED
values. The driver's hash is type-aware: in r11 it failed ``window_ops``
because a tagged-union key resolved to BIGINT in Spark but VARCHAR in the
DuckDB oracle while every stringified VALUE matched — a class this gate was
blind to when it stringified cells with ``str(v)``. Cells now carry a
Python-type tag (``int:0`` vs ``str:0`` differ) and each query additionally
compares Spark ``df.dtypes`` against DuckDB result types at type-family
granularity (int/float/decimal/str/bool/bytes/date/timestamp/list/struct).

Usage:  python tools/check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize_cell(v):
    """Render a cell as ``<python-type-tag>:<canonical-string>``.

    The tag is what makes the gate type-aware: ``int:0`` and ``str:0``
    canonicalize differently, so an engine-vs-oracle column-type coercion
    divergence (the r11 window_ops failure class) fails locally even when
    every stringified value matches. NULLs are typeless per-cell — the
    column-level dtype comparison in main() covers all-null columns.
    """
    import datetime
    import decimal

    if v is None:
        return "NULL"
    # bool before int: isinstance(True, int) is True
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, int):
        return f"int:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "float:NaN"
        # repr round-trips doubles exactly; both engines return Python floats
        return f"float:{repr(v)}"
    if isinstance(v, decimal.Decimal):
        return f"decimal:{v}"
    if isinstance(v, datetime.datetime):
        return f"timestamp:{v.replace(tzinfo=None).isoformat()}"
    if isinstance(v, datetime.date):
        return f"date:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "list:[" + ",".join(normalize_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return f"bytes:{v.hex()}"
    if isinstance(v, dict):
        return "struct:{" + ",".join(f"{k}:{normalize_cell(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, str):
        return f"str:{v}"
    return f"{type(v).__name__}:{v}"


# canonical type families: any Spark dtype string or DuckDB type string maps
# into one of these; a cross-family mismatch on the same column is exactly
# the coercion-divergence class the driver's type-aware hash catches
_INT_TYPES = {"tinyint", "smallint", "int", "integer", "bigint", "hugeint",
              "utinyint", "usmallint", "uinteger", "ubigint", "long", "short",
              "byte"}
_FLOAT_TYPES = {"float", "double", "real"}
_STR_TYPES = {"string", "varchar", "text", "char", "bpchar"}
_BYTES_TYPES = {"binary", "blob", "varbinary", "bytea"}
_BOOL_TYPES = {"boolean", "bool"}


def type_family(type_str):
    """Map a Spark dtype string or DuckDB type string to a canonical family."""
    s = str(type_str).strip().lower()
    if s.endswith("[]") or s.startswith(("array<", "list(")):
        return "list"
    if s.startswith(("struct", "row(", "map")):
        return "struct"
    if s.startswith(("decimal", "numeric")):
        return "decimal"
    if s in _INT_TYPES:
        return "int"
    if s in _FLOAT_TYPES:
        return "float"
    if s in _STR_TYPES:
        return "str"
    if s in _BYTES_TYPES:
        return "bytes"
    if s in _BOOL_TYPES:
        return "bool"
    if s.startswith("timestamp"):
        return "timestamp"
    if s == "date":
        return "date"
    return s  # unknown types compare verbatim — mismatches fail loudly


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["\x01".join(normalize_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    # derive the repo path from THIS file so a worktree/second-clone run
    # validates the checkout it lives in, not /root/repo
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry_mod
    from kafi_spark.session import get_spark

    spark = get_spark("kafi_spark_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    # a typo'd/renamed subset name must FAIL, not pass vacuously: the
    # documented per-commit workflow is subset runs, and an unknown name
    # silently matching nothing turns the gate green with zero checks
    unknown = sorted(only - set(qs))
    if unknown:
        print(f"FAIL  unknown query names: {unknown}")
        sys.exit(1)
    # driver contract: CORRECTNESS records only the first 50 queries() entries;
    # keep the registry at exactly 50 so every query gets a driver row
    if len(qs) != 50:
        print(f"FAIL  contract: queries() has {len(qs)} entries, driver records 50")
        sys.exit(1)
    stray = sorted(set(oracles) - set(qs))
    if stray:
        print(f"FAIL  contract: oracle_sql() keys missing from queries(): {stray}")
        sys.exit(1)
    n_pass = n_fail = n_weak = 0
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_types = dict(df.dtypes)
            spark_rows = [tuple(r) for r in df.collect()]
            # drop caches a query pinned (see bench.py): keeps queries
            # independent and avoids storage-memory buildup over the run
            spark.catalog.clearCache()
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            n_weak += 1
            print(f"weak  {name}: rows={len(spark_rows)} (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = list(rel.columns)
            duck_types = dict(zip(duck_cols, [str(t) for t in rel.types]))
            duck_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if sorted(spark_cols) != sorted(duck_cols):
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            continue
        type_diverged = [
            (c, spark_types[c], duck_types[c])
            for c in spark_cols
            if type_family(spark_types[c]) != type_family(duck_types[c])
        ]
        if type_diverged:
            n_fail += 1
            failures.append(name)
            detail = ", ".join(f"{c}: spark={s} duck={d}" for c, s, d in type_diverged)
            print(f"FAIL  {name}: column type divergence — {detail}")
            continue
        if len(spark_rows) != len(duck_rows):
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
            continue
        cs, cd = canon(spark_rows, spark_cols), canon(duck_rows, duck_cols)
        if cs != cd:
            n_fail += 1
            failures.append(name)
            bad = next(i for i, (a, b) in enumerate(zip(cs, cd)) if a != b)
            print(f"FAIL  {name}: value mismatch at sorted-row {bad}:")
            print(f"      spark: {cs[bad][:300]}")
            print(f"      duck : {cd[bad][:300]}")
        else:
            n_pass += 1
            print(f"pass  {name}: rows={len(spark_rows)} [{dt:.1f}s]")
    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail")
    if failures:
        print("failed:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
