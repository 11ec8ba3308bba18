"""Table profiling vs a DuckDB oracle (exact mode) + shape checks."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import rows


def test_profile_events_matches_duckdb(spark, sf_dir):
    from kafi_spark.functions.profile import profile_table
    from kafi_spark.session import read_table

    ev = read_table(spark, sf_dir, "events")
    got = {
        (r.column, r.metric): r.value
        for r in profile_table(
            ev, ["event_type", "value"], exact_distinct=True
        ).collect()
    }
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')")
    want = con.sql(
        """
        SELECT COUNT(*), COUNT(event_type), COUNT(DISTINCT event_type),
               MIN(event_type), MAX(event_type),
               COUNT("value"), COUNT(DISTINCT "value"),
               MIN("value"), MAX("value")
        FROM events
        """
    ).fetchone()
    assert got[("*", "rows")] == str(want[0])
    assert got[("event_type", "count")] == str(want[1])
    assert got[("event_type", "distinct")] == str(want[2])
    assert got[("event_type", "min")] == want[3]
    assert got[("event_type", "max")] == want[4]
    assert got[("value", "count")] == str(want[5])
    assert got[("value", "distinct")] == str(want[6])
    assert float(got[("value", "min")]) == pytest.approx(want[7])
    assert float(got[("value", "max")]) == pytest.approx(want[8])


def test_profile_nulls_and_unordered_types(spark):
    from kafi_spark.functions.profile import profile_table

    df = spark.createDataFrame(
        [(1, None, [1, 2]), (2, "x", [])], "id long, s string, arr array<int>"
    )
    got = rows(profile_table(df, exact_distinct=True))
    d = {(c, m): v for c, m, v in got}
    assert d[("s", "nulls")] == "1"
    assert d[("s", "count")] == "1"
    assert d[("arr", "distinct")] == "2"
    assert ("arr", "min") not in d  # unordered type: no min/max
    with pytest.raises(ValueError):
        profile_table(df, ["nope"])


def test_profile_similar_column_names_do_not_collide(spark):
    """Aliases are positional: columns whose names sanitize to the same
    string (a.b vs a_b) must profile independently."""
    from kafi_spark.functions.profile import profile_table

    df = spark.createDataFrame([(1, 10), (2, None)], "`a.b` long, a_b long")
    got = rows(profile_table(df, exact_distinct=True))
    d = {(c, m): v for c, m, v in got}
    assert d[("a.b", "count")] == "2"
    assert d[("a_b", "count")] == "1"
    assert d[("a_b", "nulls")] == "1"
