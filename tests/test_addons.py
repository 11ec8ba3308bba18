from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafi_spark import addons
from tests.conftest import rows


@pytest.fixture(scope="module")
def topic(spark):
    data = [
        ("a", 0, "v1"),
        ("a", 1, "v2"),
        ("b", 2, "v3"),
        ("b", 3, None),  # tombstone: deletes b
        ("c", 4, "v4"),
    ]
    return spark.createDataFrame(data, "key string, offset long, value string")


def test_compact_last_write_wins(topic):
    out = addons.compact(topic, ["key"], ["offset"], tombstone_col="value")
    assert rows(out, "key", "value") == [("a", "v2"), ("c", "v4")]


def test_compact_keeps_tombstones_when_not_asked(topic):
    out = addons.compact(topic, ["key"], ["offset"])
    assert rows(out, "key", "value") == [("a", "v2"), ("b", None), ("c", "v4")]


def test_diff(spark):
    d1 = spark.createDataFrame(
        [(0, 0, "x"), (0, 1, "y"), (0, 2, "z")], "partition int, offset long, value string"
    )
    d2 = spark.createDataFrame(
        [(0, 0, "x"), (0, 1, "Y"), (0, 3, "w")], "partition int, offset long, value string"
    )
    out = addons.diff(d1, d2, on=["partition", "offset"])
    got = {(r.offset, r.diff_kind) for r in out.collect()}
    assert got == {(1, "changed"), (2, "left_only"), (3, "right_only")}


def test_message_size_stats(spark):
    df = spark.createDataFrame(
        [(0, 0, "ab"), (0, 1, "abcd"), (1, 0, "a")], "partition int, offset long, value string"
    )
    r = addons.message_size_stats(
        df, F.octet_length("value"), ["partition", "offset"]
    ).collect()[0]
    assert r.total_bytes == 7
    assert r.max_bytes == 4 and r.min_bytes == 1
    assert (r.argmax_loc.partition, r.argmax_loc.offset) == (0, 1)
    assert (r.argmin_loc.partition, r.argmin_loc.offset) == (1, 0)


def test_collect_value_set(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "v string")
    assert rows(addons.collect_value_set(df, "v")) == [("a",), ("b",)]


def test_offsets_diff(spark):
    df = spark.createDataFrame(
        [(0, 10), (0, 20), (0, 30), (1, 20)], "partition int, ts long"
    )
    r = addons.offsets_diff(df, "ts", 15, 30).collect()[0]
    assert r.n_messages == 2
    per = rows(addons.offsets_diff(df, "ts", 15, 30, group_cols=["partition"]))
    assert per == [(0, 1), (1, 1)]


def test_diff_key_only_frames(spark):
    # frames sharing ONLY the join keys: nothing is comparable, so the
    # diff is pure presence — this used to crash building the filter
    # (changed stayed None with zero compare columns, r8 review)
    from kafi_spark.addons import diff

    a = spark.createDataFrame([(1,), (2,)], "k long")
    b = spark.createDataFrame([(2,), (3,)], "k long")
    out = {(r.k, r.diff_kind) for r in diff(a, b, on=["k"]).collect()}
    assert out == {(1, "left_only"), (3, "right_only")}
