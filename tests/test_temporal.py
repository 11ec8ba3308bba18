"""Temporal joins (as-of, range) — differential-tested against DuckDB,
which has native ASOF JOIN and exact inequality joins.

Beyond the reference surface (kafi joins are theta/equi only,
kafi/streams/topologynode.py:354-430); these are the time-series shapes
the SURVEY §2.7 note says Spark should expose.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import rows


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 10:00:00"), 100.0),
            (2, "A", _ts("2024-01-01 10:00:05"), 101.0),
            (3, "A", _ts("2024-01-01 10:01:00"), 102.0),
            (4, "B", _ts("2024-01-01 10:00:03"), 50.0),
            (5, "C", _ts("2024-01-01 10:00:00"), 7.0),
        ],
        "trade_id long, sym string, ts timestamp, px double",
    )


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:59:58"), 99.5),
            ("A", _ts("2024-01-01 10:00:05"), 100.5),  # tie with trade 2
            ("A", _ts("2024-01-01 10:00:30"), 101.5),
            ("B", _ts("2024-01-01 10:00:10"), 49.5),  # after B's only trade
        ],
        "sym string, ts timestamp, bid double",
    )


def test_asof_backward_with_ties(trades, quotes):
    from kafi_spark.functions.temporal import asof_join

    out = asof_join(trades, quotes, on="sym", left_ts="ts", right_ts="ts")
    got = rows(out, "trade_id", "bid")
    # trade 1: quote@09:59:58; trade 2: tie matches 10:00:05; trade 3:
    # latest <= 10:01 is 10:00:30; B and C have no prior quote -> dropped
    assert got == [(1, 99.5), (2, 100.5), (3, 101.5)]


def test_asof_left_keeps_unmatched(trades, quotes):
    from kafi_spark.functions.temporal import asof_join

    out = asof_join(trades, quotes, on="sym", left_ts="ts", right_ts="ts", how="left")
    got = rows(out, "trade_id", "bid")
    assert got == [(1, 99.5), (2, 100.5), (3, 101.5), (4, None), (5, None)]


def test_asof_tolerance(trades, quotes):
    from kafi_spark.functions.temporal import asof_join

    # 10 s tolerance: trade 3's nearest quote (10:00:30) is 30 s stale
    out = asof_join(
        trades, quotes, on="sym", left_ts="ts", right_ts="ts",
        tolerance_us=10_000_000,
    )
    assert rows(out, "trade_id", "bid") == [(1, 99.5), (2, 100.5)]


def test_asof_renames_colliding_payload(trades, quotes):
    from kafi_spark.functions.temporal import asof_join

    q = quotes.withColumnRenamed("bid", "px")  # collides with trades.px
    out = asof_join(trades, q, on="sym", left_ts="ts", right_ts="ts")
    assert "px_asof" in out.columns and "ts_asof" in out.columns


def test_asof_duplicate_right_timestamps_deterministic(spark, trades):
    """Several right rows sharing (key, ts): the maximal payload struct
    wins, every run (previously whichever happened to sort last)."""
    from kafi_spark.functions.temporal import asof_join

    q = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:59:58"), 99.5),
            ("A", _ts("2024-01-01 09:59:58"), 42.0),
            ("A", _ts("2024-01-01 09:59:58"), 77.0),
        ],
        "sym string, ts timestamp, bid double",
    )
    for _ in range(3):
        out = asof_join(
            trades.repartition(8), q.repartition(8),
            on="sym", left_ts="ts", right_ts="ts",
        )
        assert {r.bid for r in out.collect()} == {99.5}


def test_asof_rejects_internal_name_collision(trades, quotes):
    from kafi_spark.functions.temporal import asof_join

    bad = quotes.withColumn("__tag", F.lit(1))
    with pytest.raises(ValueError, match="__tag"):
        asof_join(trades, bad, on="sym", left_ts="ts", right_ts="ts")


def test_asof_matches_duckdb_on_events(spark, sf_dir):
    from kafi_spark.functions.temporal import asof_join
    from kafi_spark.session import read_table

    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("pv")
    )
    got = rows(
        asof_join(clicks, purch, on="user_id", left_ts="ts", right_ts="ts"),
        "event_id", "pv",
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')")
    want = sorted(
        tuple(r)
        for r in con.sql(
            """
            SELECT l.event_id, r.pv
            FROM (SELECT event_id, user_id, ts FROM events WHERE event_type='click') l
            ASOF JOIN (SELECT user_id, ts, value AS pv FROM events
                       WHERE event_type='purchase') r
            ON l.user_id = r.user_id AND l.ts >= r.ts
            """
        ).fetchall()
    )
    assert got == want


def test_range_join_matches_duckdb(spark, sf_dir):
    from kafi_spark.functions.temporal import range_join
    from kafi_spark.session import read_table

    ev = read_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    pairs = range_join(
        errors, clicks, on="user_id", left_ts="ts", right_ts="ts",
        lower_us=0, upper_us=600_000_000,
    )
    got = rows(pairs.select("event_id", F.col("ts_r")))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')")
    want = sorted(
        tuple(r)
        for r in con.sql(
            """
            SELECT l.event_id, r.ts
            FROM (SELECT event_id, user_id, ts FROM events WHERE event_type='error') l
            JOIN (SELECT user_id, ts FROM events WHERE event_type='click') r
            ON l.user_id = r.user_id AND r.ts >= l.ts
               AND r.ts <= l.ts + INTERVAL 10 MINUTE
            """
        ).fetchall()
    )
    assert got == want


def test_range_join_negative_lower_and_small_bucket(spark, trades, quotes):
    from kafi_spark.functions.temporal import range_join

    # window [-5s, +5s] around each trade; force multi-bucket explode
    out = range_join(
        trades, quotes, on="sym", left_ts="ts", right_ts="ts",
        lower_us=-5_000_000, upper_us=5_000_000, bucket_us=2_000_000,
    )
    got = rows(out, "trade_id", "bid")
    # trade 1 sees both A-quotes within +/-5s; trade 2 only the tie quote
    assert got == [(1, 99.5), (1, 100.5), (2, 100.5)]
    # bucket width must not change results, only the plan
    out2 = range_join(
        trades, quotes, on="sym", left_ts="ts", right_ts="ts",
        lower_us=-5_000_000, upper_us=5_000_000,
    )
    assert rows(out2, "trade_id", "bid") == got


def test_range_join_rejects_inverted_bounds(trades, quotes):
    from kafi_spark.functions.temporal import range_join

    with pytest.raises(ValueError):
        range_join(trades, quotes, on="sym", left_ts="ts", right_ts="ts",
                   lower_us=5, upper_us=-5)


def test_range_join_stream_matches_batch(spark, tmp_path):
    """Stream-stream range join (availableNow) emits exactly the batch
    range_join pairs; watermark + range condition bound the state."""
    import json
    import os

    from kafi_spark.functions.temporal import range_join, range_join_stream

    ldir, rdir = tmp_path / "l", tmp_path / "r"
    os.makedirs(ldir), os.makedirs(rdir)
    lrows = [("A", "2024-01-01 10:00:00", 1), ("A", "2024-01-01 10:01:00", 2),
             ("B", "2024-01-01 10:00:30", 3)]
    rrows = [("A", "2024-01-01 10:00:02", 9.0), ("A", "2024-01-01 10:00:59", 8.0),
             ("B", "2024-01-01 10:02:00", 7.0)]
    with open(ldir / "a.json", "w") as f:
        for sym, ts, i in lrows:
            f.write(json.dumps({"sym": sym, "ts": ts, "lid": i}) + "\n")
    with open(rdir / "a.json", "w") as f:
        for sym, ts, v in rrows:
            f.write(json.dumps({"sym": sym, "ts": ts, "bid": v}) + "\n")

    lschema = "sym string, ts timestamp, lid long"
    rschema = "sym string, ts timestamp, bid double"
    ls = spark.readStream.schema(lschema).json(str(ldir))
    rs = spark.readStream.schema(rschema).json(str(rdir))
    out = range_join_stream(
        ls, rs, on="sym", left_ts="ts", right_ts="ts",
        lower_us=0, upper_us=5_000_000,
    )
    q = (
        out.writeStream.format("memory").queryName("rjs")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    got = sorted(
        (r["lid"], r["bid"]) for r in spark.sql("SELECT * FROM rjs").collect()
    )
    lb = spark.createDataFrame(
        [(s, __import__("datetime").datetime.fromisoformat(t), i) for s, t, i in lrows],
        lschema,
    )
    rb = spark.createDataFrame(
        [(s, __import__("datetime").datetime.fromisoformat(t), v) for s, t, v in rrows],
        rschema,
    )
    want = sorted(
        (r["lid"], r["bid"])
        for r in range_join(
            lb, rb, on="sym", left_ts="ts", right_ts="ts",
            lower_us=0, upper_us=5_000_000,
        ).collect()
    )
    assert got == want and len(got) > 0


def test_asof_stream_static_foreachbatch(spark, tmp_path):
    """Stream-static as-of: each micro-batch of trades is as-of joined
    against a static quote snapshot inside foreachBatch — the sanctioned
    streaming idiom for asof_join (the union+window plan needs a bounded
    window per batch, which foreachBatch provides)."""
    import json
    import os

    from kafi_spark.functions.temporal import asof_join

    ldir = tmp_path / "trades"
    os.makedirs(ldir)
    with open(ldir / "a.json", "w") as f:
        f.write(json.dumps({"sym": "A", "ts": "2024-01-01 10:00:10", "lid": 1}) + "\n")
        f.write(json.dumps({"sym": "A", "ts": "2024-01-01 09:00:00", "lid": 2}) + "\n")

    quotes = spark.createDataFrame(
        [("A", _ts("2024-01-01 10:00:00"), 99.0),
         ("A", _ts("2024-01-01 10:00:05"), 98.0)],
        "sym string, ts timestamp, bid double",
    )
    got = []
    stream = spark.readStream.schema("sym string, ts timestamp, lid long").json(str(ldir))

    def attach(batch_df, epoch):
        got.extend(
            asof_join(batch_df, quotes, on="sym", left_ts="ts", right_ts="ts").collect()
        )

    q = (
        stream.writeStream.foreachBatch(attach)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert sorted((r["lid"], r["bid"]) for r in got) == [(1, 98.0)]


def _merge_oracle(intervals):
    """Brute-force interval union per key."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, s, e in intervals:
        by_key[k].append((s, e))
    out = []
    for k, ivs in by_key.items():
        ivs.sort()
        cur_s, cur_e, n = ivs[0][0], ivs[0][1], 1
        for s, e in ivs[1:]:
            if s <= cur_e:
                cur_e, n = max(cur_e, e), n + 1
            else:
                out.append((k, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
        out.append((k, cur_s, cur_e, n))
    return sorted(out)


def test_merge_intervals_fixed(spark):
    from kafi_spark.functions.temporal import merge_intervals

    data = [("a", 0, 10), ("a", 5, 12), ("a", 12, 20), ("a", 30, 40),
            ("b", 1, 2), ("b", 2, 3)]
    df = spark.createDataFrame(data, "k string, s long, e long")
    got = rows(merge_intervals(df, "k", "s", "e"), "k", "s", "e", "n_merged")
    assert got == [("a", 0, 20, 3), ("a", 30, 40, 1), ("b", 1, 3, 2)]
    assert got == _merge_oracle(data)


def test_merge_intervals_hypothesis(spark):
    from hypothesis import HealthCheck, given, settings, strategies as st

    from kafi_spark.functions.temporal import merge_intervals

    intervals = st.lists(
        st.tuples(
            st.sampled_from(["x", "y"]),
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=15),
        ).map(lambda t: (t[0], t[1], t[1] + t[2])),
        min_size=1, max_size=12,
    )

    @given(data=intervals)
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def run(data):
        df = spark.createDataFrame(data, "k string, s long, e long")
        got = rows(merge_intervals(df, "k", "s", "e"), "k", "s", "e", "n_merged")
        assert got == _merge_oracle(data)

    run()


def test_asof_map_payload_falls_back_to_arbitrary_ties(spark, trades):
    """Map-typed right payloads are not orderable; the join must still
    run (documented arbitrary-tie fallback) and match SOME right row."""
    from kafi_spark.functions.temporal import asof_join

    q = spark.createDataFrame(
        [("A", _ts("2024-01-01 09:59:58"), {"bid": "99.5"})],
        "sym string, ts timestamp, attrs map<string,string>",
    )
    out = asof_join(trades, q, on="sym", left_ts="ts", right_ts="ts")
    got = {r.trade_id: dict(r.attrs) for r in out.collect()}
    assert got == {1: {"bid": "99.5"}, 2: {"bid": "99.5"}, 3: {"bid": "99.5"}}


def test_range_join_stream_state_cleanup_predicates(spark, tmp_path):
    """Round-6 review: the range condition must be INTERVAL arithmetic
    on the watermarked columns — the unix_micros() form was
    semantically identical but unanalyzable by StreamingJoinHelper, so
    no state-value watermark was derived and join state was NEVER
    evicted. Assert the executed plan carries non-empty cleanup
    predicates on BOTH sides."""
    import json
    import os

    from kafi_spark.functions.temporal import range_join_stream

    ldir, rdir = tmp_path / "l", tmp_path / "r"
    os.makedirs(ldir), os.makedirs(rdir)
    (ldir / "a.json").write_text(
        json.dumps({"k": 1, "ts": "2024-01-01 10:00:00"}) + "\n")
    (rdir / "a.json").write_text(
        json.dumps({"k": 1, "rts": "2024-01-01 10:00:01"}) + "\n")
    ls = spark.readStream.schema("k int, ts timestamp").json(str(ldir))
    rs = spark.readStream.schema("k int, rts timestamp").json(str(rdir))
    out = range_join_stream(ls, rs, "k", "ts", "rts", 0, 5_000_000)
    q = (
        out.writeStream.format("noop").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination(120)
        plan = q._jsq.explainInternal(False)
    finally:
        q.stop()
    assert "left value predicate: (ts" in plan and \
        "right value predicate: (rts" in plan, plan[-1500:]


def test_internal_name_guards(spark):
    """Round-6 review: range_join silently overwrote-and-dropped a user
    column named __b; asof_join accepted a right payload named __rts and
    crashed with an ambiguous-field error downstream. Both now fail
    fast."""
    import pytest as _pytest

    from kafi_spark.functions.temporal import (
        asof_join, merge_intervals, range_join)

    import datetime as _dt

    t0 = _dt.datetime(2024, 1, 1)
    l = spark.createDataFrame([(1, t0, 7)], "k int, ts timestamp, __b int")
    r = spark.createDataFrame([(1, t0)], "k int, rts timestamp")
    with _pytest.raises(ValueError, match="__b"):
        range_join(l, r, "k", "ts", "rts", 0, 1_000_000)
    r2 = spark.createDataFrame([(1, t0, 5)], "k int, rts timestamp, __rts int")
    with _pytest.raises(ValueError, match="__rts"):
        asof_join(l.drop("__b"), r2, "k", "ts", "rts")
    bad = spark.createDataFrame(
        [(1, 0, 1, 9)], "k int, lo int, hi int, __island int")
    with _pytest.raises(ValueError, match="__island"):
        merge_intervals(bad, "k", "lo", "hi")
