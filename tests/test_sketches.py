"""Mergeable HLL distinct sketches (kafi_spark.functions.sketches)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kafi_spark.functions import sketches as sk
from kafi_spark.session import read_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return read_table(spark, sf_dir, "events")


def _est(df):
    return df.select(sk.estimate()).first()["distinct_est"]


def test_sketch_estimate_close_to_exact(events):
    exact = events.select("user_id").distinct().count()
    est = _est(sk.distinct_sketch(events, "user_id"))
    assert abs(est - exact) / exact < 0.05  # lgk=12 → ~1.6% RSE


def test_grouped_sketches_match_exact_per_group(events):
    got = {
        r["event_type"]: r["distinct_est"]
        for r in sk.distinct_sketch(events, "user_id", ["event_type"])
        .select("event_type", sk.estimate())
        .collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) / max(want[k], 1) < 0.05


def test_merge_equals_direct_build(events):
    """The contract that makes persisted sketches useful: union of
    per-slice sketches == one sketch over the whole data, exactly (same
    serialized estimate, not just close)."""
    per_type = sk.distinct_sketch(events, "user_id", ["event_type"])
    merged = _est(sk.merge_sketches(per_type))
    direct = _est(sk.distinct_sketch(events, "user_id"))
    assert merged == direct


def test_merge_partial_rollup(events):
    """Merging a SUBSET of slices == direct sketch over that subset."""
    some = ["click", "view"]
    per_type = sk.distinct_sketch(events, "user_id", ["event_type"])
    merged = _est(
        sk.merge_sketches(per_type.filter(F.col("event_type").isin(some)))
    )
    direct = _est(
        sk.distinct_sketch(
            events.filter(F.col("event_type").isin(some)), "user_id"
        )
    )
    assert merged == direct


def test_sketch_survives_parquet(events, tmp_path):
    out = str(tmp_path / "sketches")
    sk.distinct_sketch(events, "user_id", ["event_type"]).write.parquet(out)
    spark = events.sparkSession
    back = spark.read.parquet(out)
    assert _est(sk.merge_sketches(back)) == _est(
        sk.distinct_sketch(events, "user_id")
    )


def test_distinct_over_time(events):
    daily = sk.distinct_over_time(events, "user_id", "ts", grain="day")
    assert set(daily.columns) == {"bucket", "sketch", "distinct_est"}
    n_days = daily.count()
    assert n_days >= 1
    # roll the daily sketches up to the global number
    total = _est(sk.merge_sketches(daily.select("sketch")))
    exact = events.select("user_id").distinct().count()
    assert abs(total - exact) / exact < 0.05


def test_lgk_validation(events):
    with pytest.raises(ValueError, match="lgk"):
        sk.distinct_sketch(events, "user_id", lgk=2)


def test_distinct_sketch_stream_matches_batch(spark, events, tmp_path):
    """3-micro-batch replay == the batch distinct_over_time estimates."""
    from kafi_spark.streaming.stateful import distinct_sketch_stream

    want = {
        r["bucket"]: r["distinct_est"]
        for r in sk.distinct_over_time(events, "user_id", "ts").collect()
    }
    finals = {}
    proc = distinct_sketch_stream(
        "user_id", "ts", str(tmp_path / "state"),
        sink=lambda tot, e: finals.update(
            {r["bucket"]: r["distinct_est"] for r in tot.collect()}),
    )
    parts = events.randomSplit([1.0, 1.0, 1.0], seed=7)
    for i, p in enumerate(parts):
        proc(p, i)
    assert finals == want


def test_distinct_sketch_stream_replay_idempotent(spark, events, tmp_path):
    from kafi_spark.streaming.stateful import distinct_sketch_stream

    emitted = []
    proc = distinct_sketch_stream(
        "user_id", "ts", str(tmp_path / "state"),
        sink=lambda tot, e: emitted.append(
            sorted((r["bucket"], r["distinct_est"]) for r in tot.collect())),
    )
    b0 = events.limit(200)
    proc(b0, 0)
    # crash-before-commit replay of the same epoch: identical totals
    proc(b0, 0)
    assert emitted[0] == emitted[1]
    # and compaction preserves the merged estimates
    sk.sketch_compact(spark, str(tmp_path / "state"), 99, ["bucket"])
    after = sorted(
        (r["bucket"], r["distinct_est"])
        for r in sk.sketch_totals(
            spark, str(tmp_path / "state"), ["bucket"]).collect()
    )
    assert after == emitted[1]


def test_compact_namespace_disjoint_from_epochs(spark, events, tmp_path):
    """Review finding: a stream epoch id equal to the compact version
    must NOT overwrite the compacted delta."""
    from kafi_spark.streaming.stateful import distinct_sketch_stream

    state = str(tmp_path / "state")
    proc = distinct_sketch_stream("user_id", "ts", state)
    proc(events.limit(200), 0)
    proc(events.filter(F.col("event_id") % 3 == 0), 1)
    before = sorted(
        (r["bucket"], r["distinct_est"])
        for r in sk.sketch_totals(spark, state, ["bucket"]).collect()
    )
    # compact at "version 5", then a later epoch with id 5 arrives
    sk.sketch_compact(spark, state, 5, ["bucket"])
    proc(events.filter(F.col("event_id") % 7 == 0), 5)
    after = sorted(
        (r["bucket"], r["distinct_est"])
        for r in sk.sketch_totals(spark, state, ["bucket"]).collect()
    )
    # totals can only grow (union is monotone); the epoch-5 write must
    # not have clobbered the folded history
    b = dict(before)
    for bucket, est in after:
        assert est >= b.get(bucket, 0)
    assert len(after) >= len(before)
