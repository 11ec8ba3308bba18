"""Window assigners vs hand-computed window sets
(reference: kafi/streams/topologynode.py:672-714)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kafi_spark.streams import windows
from tests.conftest import rows

UTC = dt.timezone.utc


def ts_df(spark, *ms_values):
    data = [(i, dt.datetime.fromtimestamp(ms / 1000, tz=UTC).replace(tzinfo=None))
            for i, ms in enumerate(ms_values)]
    return spark.createDataFrame(data, "id long, ts timestamp")


def test_tumbling(spark):
    df = ts_df(spark, 0, 999, 1000, 2500)
    out = windows.tumbling(df, "ts", 1000)
    assert rows(out, "id", "w_start") == [(0, 0), (1, 0), (2, 1000), (3, 2000)]


def test_hopping_covers_every_hop(spark):
    # size 1000, hop 500: record at t=1200 belongs to windows starting 500, 1000
    df = ts_df(spark, 1200)
    out = windows.hopping(df, "ts", 1000, 500)
    assert rows(out, "w_start") == [(500,), (1000,)]


def test_hopping_equals_tumbling_when_hop_is_size(spark):
    df = ts_df(spark, 0, 1500, 2999)
    h = rows(windows.hopping(df, "ts", 1000, 1000), "id", "w_start")
    t = rows(windows.tumbling(df, "ts", 1000), "id", "w_start")
    assert h == t


def test_cumulative(spark):
    # size 1000, step 250: record at t=300 -> ends 500, 750, 1000
    df = ts_df(spark, 300)
    out = windows.cumulative(df, "ts", 1000, 250)
    assert rows(out, "w_end") == [(500,), (750,), (1000,)]
    # record exactly on a step boundary -> next step end first
    df2 = ts_df(spark, 250)
    assert rows(windows.cumulative(df2, "ts", 1000, 250), "w_end") == [
        (500,), (750,), (1000,)]


def test_sliding_count(spark):
    # per-record [ts, ts+1000]: t=0 sees {0,500,1000}, t=500 sees {500,1000},
    # t=1000 sees {1000,1800}, t=1800 sees {1800}
    df = ts_df(spark, 0, 500, 1000, 1800).withColumn("k", F.lit("a"))
    out = windows.sliding_count(df, "ts", 1000, ["k"], F.count(F.lit(1)), "n")
    assert rows(out, "id", "n") == [(0, 3), (1, 2), (2, 2), (3, 1)]


def test_sessionize(spark):
    # gap 1000: [0, 500, 2000, 2500, 5000] -> sessions 1,1,2,2,3
    df = ts_df(spark, 0, 500, 2000, 2500, 5000).withColumn("k", F.lit("u"))
    out = windows.sessionize(df, "ts", 1000, ["k"])
    assert rows(out, "id", "session_id") == [
        (0, 1), (1, 1), (2, 2), (3, 2), (4, 3)]


def test_hopping_non_divisible_and_hop_gt_size(spark):
    """Round-6 review: (1) hop not dividing size used to under-step the
    candidate sequence and silently DROP the earliest covering window;
    (2) hop > size used to build an illegal sequence and crash — a
    record between sampling windows belongs to none."""
    df = ts_df(spark, 1000)
    got = sorted(r.w_start for r in
                 windows.hopping(df, "ts", 10_000, 4_000).collect())
    # every 4000-multiple start s with s <= 1000 < s + 10000
    assert got == [-8000, -4000, 0]
    # hop > size: t=500 covered by [0,1000); t=2000 in the gap
    df2 = ts_df(spark, 500, 2000)
    got2 = rows(windows.hopping(df2, "ts", 1000, 4000), "id", "w_start")
    assert got2 == [(0, 0)]


def test_pre_epoch_timestamps_floor_correctly(spark):
    """Round-6 review: Spark's % keeps the dividend's sign, so negative
    epoch-ms floored UP — a pre-1970 record landed in the window above
    it (or in no hopping window at all)."""
    df = ts_df(spark, -5000)
    assert rows(windows.tumbling(df, "ts", 3000), "w_start") == [(-6000,)]
    got = sorted(r.w_start for r in
                 windows.hopping(df, "ts", 8000, 4000).collect())
    assert got == [-12000, -8000]
    ends = sorted(r.w_end for r in
                  windows.cumulative(df, "ts", 3000, 1000).collect())
    assert ends == [-4000, -3000]  # period [-6000,-3000), ends after -5000


def test_cumulative_validates_divisibility_and_boundary(spark):
    import pytest as _pytest

    df = ts_df(spark, 950)
    with _pytest.raises(ValueError, match="multiple"):
        windows.cumulative(df, "ts", 1000, 300)
    # record ON a step boundary: strictly-after ends only (Flink
    # half-open convention)
    ends = sorted(r.w_end for r in
                  windows.cumulative(ts_df(spark, 250), "ts", 1000, 250).collect())
    assert ends == [500, 750, 1000]
