"""Debezium codec round-trips (reference: topologynode.py:1090-1167)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafi_spark.streams import cdc, zset
from tests.conftest import rows


@pytest.fixture(scope="module")
def envelopes(spark):
    # (op, before, after)
    data = [
        ("c", None, "row1"),
        ("u", "row1", "row1v2"),
        ("d", "row2", None),
        ("r", None, "row3"),
    ]
    return spark.createDataFrame(data, "op string, before string, after string")


def test_from_debezium(envelopes):
    out = cdc.from_debezium(envelopes)
    assert rows(out, "value", "weight") == [
        ("row1", -1), ("row1", 1), ("row1v2", 1), ("row2", -1), ("row3", 1),
    ]


def test_to_debezium(spark):
    z = spark.createDataFrame([("a", 2), ("b", -1)], "value string, weight long")
    out = cdc.to_debezium(z)
    got = sorted((r.op, r.before, r.after) for r in out.collect())
    assert got == [("c", None, "a"), ("c", None, "a"), ("d", "b", None)]


def test_roundtrip_consolidates_to_state(envelopes):
    deltas = cdc.from_debezium(envelopes)
    state = cdc.apply_cdc(deltas, ["value"])
    # row1 created then retracted by update; row2 deleted (never created here);
    # surviving state: row1v2, row3
    assert rows(state, "value") == [("row1v2",), ("row3",)]


def test_debezium_diff_invariant(spark):
    """Reference oracle (test/streams/test_base.py:89-115): applying a CDC
    stream yields the same set as the final table state."""
    final = spark.createDataFrame([("k1", "v2"), ("k3", "v3")], "k string, v string")
    stream = spark.createDataFrame(
        [
            ("c", None, None, "k1", "v1"),
            ("u", "k1", "v1", "k1", "v2"),
            ("c", None, None, "k2", "vx"),
            ("d", "k2", "vx", None, None),
            ("c", None, None, "k3", "v3"),
        ],
        "op string, bk string, bv string, ak string, av string",
    )
    env = stream.select(
        "op",
        F.when(F.col("bk").isNotNull(), F.struct(F.col("bk").alias("k"), F.col("bv").alias("v"))).alias("before"),
        F.when(F.col("ak").isNotNull(), F.struct(F.col("ak").alias("k"), F.col("av").alias("v"))).alias("after"),
    )
    deltas = cdc.from_debezium(env).select("value.k", "value.v", "weight")
    state = cdc.apply_cdc(deltas, ["k"]).drop("weight")
    assert rows(state) == rows(final)


def test_apply_cdc_upsert_latest_wins_with_order_col(spark):
    """Round-6 review: an upsert stream (updates without before images)
    leaves every historical value net-positive; with order_col the
    latest per key survives, and without it both rows remain visible
    (no silent arbitrary pick)."""
    deltas = spark.createDataFrame(
        [("k1", "v1", 10, 1), ("k1", "v2", 20, 1), ("k2", "x", 5, 1)],
        "k string, v string, ts long, weight long",
    )
    latest = cdc.apply_cdc(deltas, ["k"], order_col="ts")
    assert sorted((r.k, r.v, r.weight) for r in latest.collect()) == [
        ("k1", "v2", 1), ("k2", "x", 1)]
    bare = cdc.apply_cdc(deltas, ["k"])
    assert bare.count() == 3
