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


def test_profile_nested_map_columns(spark):
    """Review r7: a map nested INSIDE an array/struct breaks the wide
    distinct aggregate the same way a top-level map does — the to_json
    fallback must trigger on map-bearing dtypes at any depth."""
    from kafi_spark.functions.profile import profile_table

    df = spark.createDataFrame(
        [(1, [{"a": "x"}], {"m": {"k": 1}}), (2, [{"a": "y"}], {"m": {"k": 2}})],
        "id long, tags array<map<string,string>>, s struct<m:map<string,int>>",
    )
    out = {(r.column, r.metric): r.value for r in profile_table(df).collect()}
    assert out[("tags", "distinct")] == "2"
    assert out[("s", "distinct")] == "2"
    assert out[("id", "count")] == "2"


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


def test_corpus_report_values_match_duckdb(spark, sf_dir):
    """Global section values replayed exactly (counts/sums) or to float
    tolerance (means) by DuckDB over the same text_stats frame."""
    from kafi_spark.functions.profile import corpus_report
    from kafi_spark.functions.text import text_stats

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = {(r.section, r.metric): r.value
           for r in corpus_report(df, group_col="source").collect()}

    stats_pd = text_stats(df).toPandas()
    con = duckdb.connect()
    con.register("s", stats_pd)
    n, total_tok, mean_tok, total_ch = con.execute(
        "SELECT count(*), sum(n_tokens), avg(n_tokens), sum(n_chars) FROM s"
    ).fetchone()
    assert int(rep[("global", "rows")]) == n
    assert int(rep[("global", "total_tokens")]) == total_tok
    assert float(rep[("global", "mean_tokens")]) == pytest.approx(mean_tok)
    assert int(rep[("global", "total_chars")]) == total_ch
    assert 0.0 <= float(rep[("global", "dup_rate")]) < 1.0
    assert 0.0 <= float(rep[("global", "gopher_pass_rate")]) <= 1.0

    # language mix: counts replayed exactly for every listed language
    langs = {r.metric: int(r.value) for r in corpus_report(df).collect()
             if r.section == "lang"}
    want = dict(con.execute(
        "SELECT coalesce(lang_guess,'unknown'), count(*) FROM s "
        "GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 10").fetchall())
    assert langs == {k: int(v) for k, v in want.items()}

    # group section covers every source value; token masses sum to the
    # global total (mixture-planning contract)
    rep_rows = corpus_report(df, group_col="source").collect()
    srcs = {r.metric: int(r.value) for r in rep_rows
            if r.section == "group:source"}
    assert sum(srcs.values()) == n and len(srcs) >= 2
    toks = {r.metric: int(r.value) for r in rep_rows
            if r.section == "group_tokens:source"}
    assert toks.keys() == srcs.keys()
    assert sum(toks.values()) == total_tok


def test_corpus_report_duplicate_rate(spark):
    from kafi_spark.functions.profile import corpus_report

    df = spark.createDataFrame(
        [(i, "identical text body") for i in range(8)]
        + [(100 + i, f"unique text number {i}") for i in range(2)],
        "doc_id long, text string")
    rep = {r.metric: r.value for r in corpus_report(df).collect()
           if r.section == "global"}
    assert int(rep["rows"]) == 10
    assert int(rep["distinct_texts"]) == 3
    assert float(rep["dup_rate"]) == pytest.approx(0.7, abs=0.01)
