"""Analytic operators (ranking windows, lag/lead, rollup/cube) — the
SURVEY §2.7 "Spark gets these free" surface."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [
            ("a", 1, 10.0),
            ("a", 2, 30.0),
            ("a", 3, 20.0),
            ("b", 4, 5.0),
            ("b", 5, 15.0),
        ],
        "grp string, id int, v double",
    )


def test_topn_per_group(people):
    from kafi_spark.functions.analytic import topn_per_group

    out = topn_per_group(people, ["grp"], [F.col("v").desc(), F.col("id")], 2)
    assert rows(out, "grp", "id", "rank") == [
        ("a", 2, 1),
        ("a", 3, 2),
        ("b", 4, 2),
        ("b", 5, 1),
    ]


def test_with_lag_lead(people):
    from kafi_spark.functions.analytic import with_lag

    out = with_lag(people, ["grp"], [F.col("id")], "v",
                   lag_alias="prev", lead_alias="next")
    got = {r["id"]: (r["prev"], r["next"]) for r in out.collect()}
    assert got[1] == (None, 30.0)
    assert got[2] == (10.0, 20.0)
    assert got[3] == (30.0, None)
    assert got[4] == (None, 15.0)
    assert got[5] == (5.0, None)


def test_rollup_and_cube(people):
    from kafi_spark.functions.analytic import cube_agg, rollup_agg

    def norm(df):
        return sorted((r["grp"] or "<all>", r["n"]) for r in df.collect())

    r = rollup_agg(people, ["grp"], F.count(F.lit(1)).alias("n"))
    assert norm(r) == [("<all>", 5), ("a", 3), ("b", 2)]
    c = cube_agg(people, ["grp"], F.count(F.lit(1)).alias("n"))
    assert norm(c) == [("<all>", 5), ("a", 3), ("b", 2)]


def test_zset_distinct_retraction(spark):
    from kafi_spark.streams.zset import to_records, zset_distinct

    z = spark.createDataFrame(
        [(1, 3), (2, 1), (2, -1), (3, -2), (3, 1)], "k int, weight long"
    )
    out = to_records(zset_distinct(z))
    # k=1 net +3 -> kept once; k=2 net 0 -> dropped; k=3 net -1 -> dropped
    assert rows(out, "k") == [(1,)]


def test_to_debezium_roundtrip(spark):
    from kafi_spark.streams.cdc import from_debezium, to_debezium

    z = spark.createDataFrame([(10, 2), (20, -1)], "value int, weight long")
    env = to_debezium(z)
    assert rows(env, "op", "before", "after") == [
        ("c", None, 10),
        ("c", None, 10),
        ("d", 20, None),
    ]
    back = from_debezium(env)
    got = sorted((r["value"], r["weight"]) for r in back.collect())
    assert got == [(10, 1), (10, 1), (20, -1)]


def test_topology_peek_from_to_value(spark):
    from kafi_spark.streaming.topology import Topology
    from kafi_spark.streams.zset import from_records

    t = Topology()
    t.source("src").to_value().peek("mid").from_value().map("k", "v").sink("out")
    src = from_records(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    res = t.build_batch({"src": src})["out"]
    assert rows(res, "k", "v", "weight") == [(1, "a", 1), (2, "b", 1)]


def test_time_rollup_matches_duckdb(spark, sf_dir):
    import duckdb

    from kafi_spark.functions.analytic import time_rollup
    from kafi_spark.session import read_table
    from tests.conftest import rows

    ev = read_table(spark, sf_dir, "events")
    out = time_rollup(
        ev, "ts", ["day", "hour"], ["event_type"],
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    got = rows(out, "grain", "bucket", "event_type", "n", "cents")
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            """
            SELECT grain, CASE grain WHEN 'day' THEN date_trunc('day', ts)
                                     ELSE date_trunc('hour', ts) END AS bucket,
                   event_type, COUNT(*) AS n,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
            FROM events, (SELECT unnest(['day', 'hour']) AS grain)
            GROUP BY 1, 2, 3
            """
        ).fetchall()
    )
    assert got == want


def test_time_rollup_rejects_unknown_grain(spark):
    from kafi_spark.functions.analytic import time_rollup

    df = spark.range(1).select(F.current_timestamp().alias("ts"))
    with pytest.raises(ValueError):
        time_rollup(df, "ts", ["fortnight"], [], F.count(F.lit(1)).alias("n"))


def test_time_rollup_rejects_output_name_collision(spark):
    from kafi_spark.functions.analytic import time_rollup

    df = spark.range(1).select(
        F.current_timestamp().alias("ts"), F.lit("x").alias("grain")
    )
    with pytest.raises(ValueError, match="grain"):
        time_rollup(df, "ts", ["day"], [], F.count(F.lit(1)).alias("n"))


def test_percentiles_match_duckdb(spark, sf_dir):
    import duckdb

    from kafi_spark.functions.analytic import percentiles
    from kafi_spark.session import read_table
    from tests.conftest import rows

    ev = read_table(spark, sf_dir, "events")
    got = rows(
        percentiles(ev, "value", [0.25, 0.5, 0.9], ["event_type"]),
        "event_type", "prob", "value",
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            """
            SELECT event_type, 0.25 AS prob, quantile_cont("value", 0.25) AS v FROM events GROUP BY 1
            UNION ALL
            SELECT event_type, 0.5, quantile_cont("value", 0.5) FROM events GROUP BY 1
            UNION ALL
            SELECT event_type, 0.9, quantile_cont("value", 0.9) FROM events GROUP BY 1
            """
        ).fetchall()
    )
    assert [(t, float(p), round(v, 9)) for t, p, v in got] == [
        (t, float(p), round(v, 9)) for t, p, v in want
    ]


def test_funnel_basic_and_ordering(spark):
    from kafi_spark.functions.analytic import funnel

    rows = [
        # u1 completes view -> click -> purchase in order
        (1, "view", 100), (1, "click", 200), (1, "purchase", 300),
        # u2 clicks BEFORE viewing: click doesn't count, re-click missing
        (2, "click", 50), (2, "view", 100),
        # u3 views only
        (3, "view", 10),
        # u4 full funnel but purchase precedes click -> stops at click
        (4, "view", 10), (4, "purchase", 20), (4, "click", 30),
    ]
    ev = spark.createDataFrame(
        [(u, t, __import__("datetime").datetime.fromtimestamp(ts))
         for u, t, ts in rows],
        "user_id long, event_type string, ts timestamp")
    got = {(r.step_idx, r.step): r.n_users
           for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert got == {(0, "view"): 4, (1, "click"): 2, (2, "purchase"): 1}


def test_funnel_within_horizon(spark):
    from kafi_spark.functions.analytic import funnel

    rows = [(1, "view", 0), (1, "click", 5), (1, "purchase", 500),
            (2, "view", 0), (2, "click", 5), (2, "purchase", 50)]
    ev = spark.createDataFrame(
        [(u, t, __import__("datetime").datetime.fromtimestamp(ts))
         for u, t, ts in rows],
        "user_id long, event_type string, ts timestamp")
    got = {(r.step_idx, r.step): r.n_users
           for r in funnel(ev, ["view", "click", "purchase"],
                           within_seconds=100).collect()}
    # u1's purchase at +500s falls outside the horizon from funnel start
    assert got == {(0, "view"): 2, (1, "click"): 2, (2, "purchase"): 1}


def test_funnel_matches_duckdb(spark, sf_dir):
    from kafi_spark.functions.analytic import funnel
    from kafi_spark.session import read_table

    import duckdb

    ev = read_table(spark, sf_dir, "events")
    got = {(r.step_idx, r.step): r.n_users
           for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    want = {(r[0], r[1]): r[2] for r in con.sql("""
        WITH s0 AS (SELECT user_id, MIN(ts) AS t FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
        s1 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
               JOIN s0 ON s0.user_id = e.user_id AND e.ts > s0.t
               WHERE e.event_type = 'click' GROUP BY e.user_id),
        s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
               JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t
               WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        SELECT 0 AS i, 'view' AS s, COUNT(*)::BIGINT FROM s0
        UNION ALL SELECT 1, 'click', COUNT(*)::BIGINT FROM s1
        UNION ALL SELECT 2, 'purchase', COUNT(*)::BIGINT FROM s2
    """).fetchall()}
    assert got == want and got[(0, "view")] > 0


def test_cohort_retention_matches_duckdb(spark, sf_dir):
    from kafi_spark.functions.analytic import cohort_retention
    from kafi_spark.session import read_table

    import duckdb

    ev = read_table(spark, sf_dir, "events")
    got = {(str(r.cohort)[:10], r.period_offset): r.n_users
           for r in cohort_retention(ev, period="week").collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    want = {(str(r[0])[:10], r[1]): r[2] for r in con.sql("""
        WITH firsts AS (SELECT user_id,
                               MIN(date_trunc('week', ts)) AS cohort
                        FROM events GROUP BY user_id),
        act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS p
                FROM events)
        SELECT f.cohort,
               CAST(FLOOR(date_diff('second', f.cohort, a.p) / 604800.0)
                    AS INT) AS off,
               COUNT(*)::BIGINT
        FROM act a JOIN firsts f USING (user_id)
        WHERE FLOOR(date_diff('second', f.cohort, a.p) / 604800.0) < 12
        GROUP BY 1, 2
    """).fetchall()}
    assert got == want
    # offset-0 row per cohort equals the cohort size
    sizes = {str(r[0])[:10]: r[1] for r in con.sql(
        "SELECT cohort, COUNT(*) FROM (SELECT user_id, MIN(date_trunc('week', ts)) AS cohort FROM events GROUP BY user_id) GROUP BY cohort").fetchall()}
    for c, n in sizes.items():
        assert got[(c, 0)] == n


def test_cohort_retention_validation(spark, sf_dir):
    from kafi_spark.functions.analytic import cohort_retention
    from kafi_spark.session import read_table

    with pytest.raises(ValueError):
        cohort_retention(read_table(spark, sf_dir, "events"), max_periods=0)


def test_funnel_counts_monotonically_nonincreasing(spark, sf_dir):
    """Invariant: each funnel step can only lose users."""
    from kafi_spark.functions.analytic import funnel
    from kafi_spark.session import read_table

    ev = read_table(spark, sf_dir, "events")
    for steps in (["view", "click", "purchase"],
                  ["signup", "view", "click", "purchase"],
                  ["click", "view"]):
        rows = sorted(funnel(ev, steps).collect(), key=lambda r: r.step_idx)
        counts = [r.n_users for r in rows]
        assert counts == sorted(counts, reverse=True)
        assert [r.step for r in rows] == steps


def test_sessionize_labels_matches_duckdb(spark, sf_dir):
    from kafi_spark.functions.analytic import sessionize_labels
    from kafi_spark.session import read_table

    import duckdb

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    got = {r.event_id: r.session_id
           for r in sessionize_labels(ev, gap_seconds=3600).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    want = {r[0]: r[1] for r in con.sql("""
        SELECT event_id,
               SUM(CASE WHEN prev IS NOT NULL
                         AND date_diff('second', prev, ts) > 3600
                        THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sid
        FROM (SELECT event_id, user_id, ts,
                     LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
              FROM events)
    """).fetchall()}
    assert got == want
    assert max(got.values()) > 0      # the data actually breaks sessions


def test_sessionize_labels_hand_case(spark):
    import datetime as dt

    from kafi_spark.functions.analytic import sessionize_labels

    base = dt.datetime(2024, 1, 1)
    rows = [(1, base), (1, base + dt.timedelta(seconds=10)),
            (1, base + dt.timedelta(seconds=200)),   # > gap -> new session
            (2, base)]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = sorted((r.user_id, str(r.ts), r.session_id)
                 for r in sessionize_labels(ev, gap_seconds=100).collect())
    assert [g[2] for g in got] == [0, 0, 1, 0]
    with pytest.raises(ValueError):
        sessionize_labels(ev, gap_seconds=0)


def test_zscore_outliers_matches_duckdb(spark, sf_dir):
    from kafi_spark.functions.analytic import zscore_outliers
    from kafi_spark.session import read_table

    import duckdb

    ev = read_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    got = {r.event_id: (r.zscore, r.is_outlier)
           for r in zscore_outliers(ev, "value", keys=["event_type"],
                                    threshold=2.0).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    want = {r[0]: (r[1], r[2]) for r in con.sql("""
        SELECT event_id,
               CASE WHEN value IS NOT NULL AND sd > 0
                    THEN (value - mu) / sd END AS z,
               COALESCE(ABS(CASE WHEN value IS NOT NULL AND sd > 0
                                 THEN (value - mu) / sd END) > 2.0, FALSE)
        FROM (SELECT event_id, value,
                     AVG(value) OVER (PARTITION BY event_type) AS mu,
                     STDDEV_POP(value) OVER (PARTITION BY event_type) AS sd
              FROM events)
    """).fetchall()}
    assert set(got) == set(want)
    n_out = sum(1 for z, o in got.values() if o)
    assert n_out > 0
    for eid in got:
        gz, go = got[eid]; wz, wo = want[eid]
        assert go == wo
        if gz is None:
            assert wz is None
        else:
            assert gz == pytest.approx(wz, rel=1e-9)


def test_zscore_global_and_degenerate(spark):
    from kafi_spark.functions.analytic import zscore_outliers

    df = spark.createDataFrame(
        [(1, 1.0), (2, 1.0), (3, 1.0)], "id long, v double")
    out = zscore_outliers(df, "v").collect()   # zero variance
    assert all(r.zscore is None and r.is_outlier is False for r in out)
    with pytest.raises(ValueError):
        zscore_outliers(df, "v", threshold=0)


def test_zscore_preserves_null_key_rows(spark):
    from kafi_spark.functions.analytic import zscore_outliers

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, None, 5.0), (4, None, 6.0),
         (5, "b", 3.0)],
        "id long, k string, v double")
    out = zscore_outliers(df, "v", keys=["k"]).collect()
    assert len(out) == 5                       # row-preserving incl. NULL key
    nulls = [r for r in out if r.k is None]
    assert len(nulls) == 2
    # the NULL group scores against ITS OWN moments (mean 5.5)
    assert sorted(round(r.zscore, 6) for r in nulls) == [-1.0, 1.0]
    with pytest.raises(ValueError):
        zscore_outliers(df, "v", ddof=2)


def test_cohort_retention_dst_collapse_counts_users_once(spark):
    """Round-3 ADVICE (medium): in a DST-observing session timezone two
    distinct truncated days can land on the same period offset (a 23 h
    'day' at spring-forward); the distinct-user count must not
    double-count that user in the collapsed cell."""
    from datetime import datetime

    from kafi_spark.functions.analytic import cohort_retention

    tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        # US spring-forward 2025-03-09: Mar 10 00:00 EDT is only 23 h
        # after Mar 9 00:00 EST, so both truncate-days collapse to
        # offset 1 from a Mar 8 cohort under fixed-86400 s arithmetic.
        ev = spark.createDataFrame(
            [("u1", datetime(2025, 3, 8, 12)),
             ("u1", datetime(2025, 3, 9, 12)),
             ("u1", datetime(2025, 3, 10, 12))],
            "user_id string, ts timestamp")
        got = {(r.period_offset): r.n_users
               for r in cohort_retention(ev, period="day").collect()}
        assert got == {0: 1, 1: 1}  # count(*) would have said {0:1, 1:2}
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)


def test_sessionize_labels_subsecond_gap(spark):
    """Round-6 review: cast('long') truncated timestamps to whole
    seconds, so a 1.95s gap measured as 1 and never broke a 1s-gap
    session."""
    from kafi_spark.functions.analytic import sessionize_labels

    import datetime as _dt

    df = spark.createDataFrame(
        [("u", _dt.datetime(2024, 1, 1, 0, 0, 10)),
         ("u", _dt.datetime(2024, 1, 1, 0, 0, 11, 950_000))],
        "user string, ts timestamp",
    )
    out = sorted(r["session_id"]
                 for r in sessionize_labels(
                     df, 1, user_col="user", ts_col="ts").collect())
    assert out == [0, 1]
