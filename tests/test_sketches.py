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


# ---------------------------------------------------------------------------
# Theta sketches: set algebra
# ---------------------------------------------------------------------------


def _test(df):
    return df.select(sk.theta_estimate()).first()["distinct_est"]


def test_theta_exact_mode_matches_exact_distinct(events):
    """Below 2^lgk distinct keys theta estimates are EXACT longs."""
    got = {
        r["event_type"]: r["distinct_est"]
        for r in sk.theta_sketch(events, "user_id", ["event_type"])
        .select("event_type", sk.theta_estimate())
        .collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want


def test_theta_merge_equals_direct(events):
    per_type = sk.theta_sketch(events, "user_id", ["event_type"])
    merged = _test(sk.theta_merge(per_type))
    direct = _test(sk.theta_sketch(events, "user_id"))
    assert merged == direct == events.select("user_id").distinct().count()


def test_theta_intersect_agg_exact(events):
    """|∩ over all event types| == users that appear in EVERY type."""
    n_types = events.select("event_type").distinct().count()
    want = (
        events.groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("t"))
        .filter(F.col("t") == n_types)
        .count()
    )
    per_type = sk.theta_sketch(events, "user_id", ["event_type"])
    got = _test(sk.theta_intersect(per_type))
    assert got == want


def test_sketch_retention_exact(events):
    """retained/churned/new from sketches == exact set algebra on raw
    events, bucket by bucket (theta sketches in exact mode)."""
    daily = sk.theta_over_time(events, "user_id", "ts", grain="day")
    got = {
        r["bucket"]: (r["active"], r["prev_active"], r["retained"],
                      r["churned"], r["new_keys"])
        for r in sk.sketch_retention(daily).collect()
    }
    rows = (
        events.select(F.date_trunc("day", "ts").alias("b"), "user_id")
        .distinct()
        .collect()
    )
    by_day = {}
    for r in rows:
        by_day.setdefault(r["b"], set()).add(r["user_id"])
    import datetime

    want = {}
    for b, cur in by_day.items():
        prev = by_day.get(b - datetime.timedelta(days=1))
        if prev is None:
            continue
        want[b] = (len(cur), len(prev), len(cur & prev),
                   len(prev - cur), len(cur - prev))
    assert got == want
    assert len(want) > 0


def test_sketch_retention_with_dims_joins_within_dim(spark, events):
    """Round-8 review: a dimensioned theta_over_time frame cross-matched
    every dim value against every other in the retention self-join
    (|dims|² rows per bucket of cross-dim 'retention'); dims now join
    within their own value and ride in the output."""
    daily = sk.theta_over_time(
        events, "user_id", "ts", grain="day", dims=["event_type"])
    got = {
        (r["bucket"], r["event_type"]):
            (r["active"], r["prev_active"], r["retained"])
        for r in sk.sketch_retention(daily, dims=["event_type"]).collect()
    }
    rows = (
        events.select(F.date_trunc("day", "ts").alias("b"),
                      "event_type", "user_id").distinct().collect()
    )
    by_key = {}
    for r in rows:
        by_key.setdefault((r["b"], r["event_type"]), set()).add(r["user_id"])
    import datetime

    want = {}
    for (b, d), cur in by_key.items():
        prev = by_key.get((b - datetime.timedelta(days=1), d))
        if prev is None:
            continue
        want[(b, d)] = (len(cur), len(prev), len(cur & prev))
    assert got == want and len(want) > 0


def test_kll_save_delta_rejects_unparseable_epochs(spark, tmp_path):
    """Round-8 review: int(2.5) passed the old guard but wrote v=2.5,
    permanently poisoning every later read of the state dir."""
    d = str(tmp_path / "kll")
    df = sk.quantile_sketch(
        spark.range(10).select(F.col("id").cast("double").alias("v")), "v")
    for bad in (2.5, True, "1e3"):
        with pytest.raises(ValueError):
            sk.kll_save_delta(df, d, bad)
    sk.kll_save_delta(df, d, 3)  # plain ints still fine
    assert sk.kll_totals(spark, d).count() == 1


def test_quantile_value_column_naming_is_float_tolerant(spark):
    """Round-8 review: 0.55*100 == 55.000000000000007, so q=0.55 was
    named 'q0.55' while 0.05 got 'q5' — whole percents now name
    uniformly."""
    df = sk.quantile_sketch(
        spark.range(100).select(F.col("id").cast("double").alias("v")), "v")
    out = sk.quantile_values(df, [0.05, 0.29, 0.55, 0.555])
    assert [c for c in out.columns if c.startswith("q")] == \
        ["q5", "q29", "q55", "q55_5"]


def test_theta_lgk_validation(events):
    with pytest.raises(ValueError, match="lgk"):
        sk.theta_sketch(events, "user_id", lgk=30)


def test_theta_state_totals_and_reremerge_idempotent(spark, events, tmp_path):
    """Persisted theta deltas: totals == direct distinct; merging a
    stale leftover copy of a delta changes nothing (union idempotence —
    the property KLL state does NOT have)."""
    state = str(tmp_path / "tstate")
    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)
    for i, part in enumerate((a, b)):
        sk.sketch_save_delta(
            sk.theta_sketch(part, "user_id", ["event_type"]), state, i)
    tot = {
        r["event_type"]: r["distinct_est"]
        for r in sk.sketch_totals(
            spark, state, ["event_type"], kind="theta").collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert tot == want
    # duplicate delta 0 as a stale leftover under a new version
    sk.sketch_save_delta(
        sk.theta_sketch(a, "user_id", ["event_type"]), state, 7)
    sk.sketch_compact(spark, state, 1, ["event_type"], kind="theta")
    after = {
        r["event_type"]: r["distinct_est"]
        for r in sk.sketch_totals(
            spark, state, ["event_type"], kind="theta").collect()
    }
    assert after == want


# ---------------------------------------------------------------------------
# KLL quantile sketches
# ---------------------------------------------------------------------------


def test_quantile_exact_below_capacity(spark):
    """n ≤ k means no compaction has happened: quantiles are exact."""
    vals = [float(v) for v in range(150)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    qdf = sk.quantile_sketch(df, "v", k=200)
    out = sk.quantile_values(qdf, [0.0, 0.5, 1.0], "double").first()
    assert out["n"] == 150
    assert out["q0"] == 0.0 and out["q100"] == 149.0
    assert abs(out["q50"] - 74.0) <= 1.0  # midpoint convention ±1 rank


def test_quantile_merge_rank_bound(events):
    """Merged per-type sketches answer global quantiles within the
    published KLL rank-error bound (~1.65% at k=200; assert 2.5%)."""
    per_type = sk.quantile_sketch(events, "value", ["event_type"])
    merged = sk.quantile_merge(per_type, dtype="double")
    out = sk.quantile_values(
        merged, [0.1, 0.5, 0.9, 0.99], "double").first()
    vals = sorted(r["value"] for r in events.select("value").collect())
    n = len(vals)
    assert out["n"] == n
    import bisect

    for q, col in ((0.1, "q10"), (0.5, "q50"), (0.9, "q90"),
                   (0.99, "q99")):
        got_rank = bisect.bisect_right(vals, out[col]) / n
        assert abs(got_rank - q) <= 0.025, (q, out[col], got_rank)


def test_quantile_dtype_inference_and_errors(events, spark):
    # bigint inference from a long column
    qdf = sk.quantile_sketch(events, "user_id", k=200)
    out = sk.quantile_values(qdf, [0.5], "bigint").first()
    assert out["n"] == events.count()
    # unsupported dtype: clear error, not a JVM analysis exception
    sdf = spark.createDataFrame([("a",)], "s string")
    with pytest.raises(ValueError, match="dtype"):
        sk.quantile_sketch(sdf, "s")
    with pytest.raises(ValueError, match="rank"):
        sk.quantile_values(qdf, [1.5], "bigint")


def test_kll_state_watermark_no_double_count(spark, events, tmp_path):
    """The KLL compaction watermark: totals read compact-N + epochs>N,
    never a folded epoch twice — n (exact in KLL) is the detector."""
    state = str(tmp_path / "qstate")
    thirds = [events.filter(F.col("event_id") % 3 == i) for i in range(3)]
    for i in range(2):
        sk.kll_save_delta(
            sk.quantiles_over_time(thirds[i], "value", "ts"), state, i)
    n_all = sum(t.count() for t in thirds[:2])
    tot = sk.quantile_values(
        sk.kll_totals(spark, state, dtype="double"), [0.5], "double"
    ).first()
    assert tot["n"] == n_all
    wm = sk.kll_compact(spark, state, ["bucket"], dtype="double")
    assert wm == 1
    # after compaction: same n (folded epochs ignored, not re-merged)
    tot2 = sk.quantile_values(
        sk.kll_totals(spark, state, dtype="double"), [0.5], "double"
    ).first()
    assert tot2["n"] == n_all
    # a post-compaction epoch adds exactly its own rows
    sk.kll_save_delta(
        sk.quantiles_over_time(thirds[2], "value", "ts"), state, 2)
    tot3 = sk.quantile_values(
        sk.kll_totals(spark, state, dtype="double"), [0.5], "double"
    ).first()
    assert tot3["n"] == n_all + thirds[2].count()


def test_kll_compact_crash_invisible(spark, events, tmp_path):
    """A compaction that died before _SUCCESS must be ignored."""
    import os

    state = str(tmp_path / "qstate")
    sk.kll_save_delta(
        sk.quantiles_over_time(events, "value", "ts"), state, 0)
    n = events.count()
    crashed = os.path.join(state, "v=compact-0")
    os.makedirs(crashed)
    with open(os.path.join(crashed, "part-00000.parquet"), "wb") as f:
        f.write(b"partial garbage")
    tot = sk.quantile_values(
        sk.kll_totals(spark, state, dtype="double"), [0.5], "double"
    ).first()
    assert tot["n"] == n


def test_kll_prune_removes_folded(spark, events, tmp_path):
    import os

    state = str(tmp_path / "qstate")
    for i in range(3):
        sk.kll_save_delta(
            sk.quantiles_over_time(
                events.filter(F.col("event_id") % 3 == i), "value", "ts"),
            state, i)
    sk.kll_compact(spark, state, ["bucket"], dtype="double", prune=True)
    left = sorted(d for d in os.listdir(state) if d.startswith("v="))
    assert left == ["v=compact-2"]
    tot = sk.quantile_values(
        sk.kll_totals(spark, state, dtype="double"), [0.5], "double"
    ).first()
    assert tot["n"] == events.count()


def test_kll_non_numeric_epoch_rejected(events, tmp_path):
    with pytest.raises(ValueError):
        sk.kll_save_delta(
            sk.quantile_sketch(events, "value"), str(tmp_path / "x"),
            "final")


def test_quantile_sketch_stream_matches_batch(spark, events, tmp_path):
    """3-micro-batch replay: final totals == one batch build; replaying
    an epoch (crash-before-commit) never double-counts."""
    from kafi_spark.streaming.stateful import quantile_sketch_stream

    state = str(tmp_path / "qs")
    seen = []
    proc = quantile_sketch_stream(
        "value", "ts", state,
        sink=lambda tot, e: seen.append(
            sorted((r["bucket"], r["n"], r["q50"]) for r in
                   sk.quantile_values(
                       tot, [0.5], "double", keep_cols=["bucket"]
                   ).collect())))
    parts = events.randomSplit([1.0, 1.0, 1.0], seed=11)
    proc(parts[0], 0)
    proc(parts[1], 1)
    proc(parts[1], 1)  # replayed epoch: overwrites its own delta
    proc(parts[2], 2)
    assert seen[1] == seen[2]  # replay emission byte-identical
    want_n = {
        r["bucket"]: r["n"] for r in
        events.groupBy(F.date_trunc("day", "ts").alias("bucket"))
        .agg(F.count("value").alias("n")).collect()
    }
    final_n = {b: n for b, n, _ in seen[-1]}
    assert final_n == want_n


def test_theta_sketch_stream_exact_and_retention_ready(
        spark, events, tmp_path):
    """kind='theta' streaming twin: running totals stay EXACT (exact
    mode) across micro-batches, and the final state frame feeds
    sketch_retention directly."""
    from kafi_spark.streaming.stateful import distinct_sketch_stream

    state = str(tmp_path / "thstate")
    finals = {}
    proc = distinct_sketch_stream(
        "user_id", "ts", state, kind="theta",
        sink=lambda tot, e: finals.update(
            {r["bucket"]: r["distinct_est"] for r in tot.collect()}))
    parts = events.randomSplit([1.0, 1.0], seed=3)
    proc(parts[0], 0)
    proc(parts[1], 1)
    want = {
        r["bucket"]: r["n"] for r in
        events.groupBy(F.date_trunc("day", "ts").alias("bucket"))
        .agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert finals == want
    # the persisted state answers retention without re-reading events
    tot = sk.sketch_totals(spark, state, ["bucket"], kind="theta")
    ret = sk.sketch_retention(tot).collect()
    assert len(ret) > 0
    for r in ret:
        assert r["retained"] + r["new_keys"] == r["active"]
        assert r["retained"] + r["churned"] == r["prev_active"]


# ---------------------------------------------------------------------------
# Count-min frequency sketches
# ---------------------------------------------------------------------------


def test_cms_estimate_one_sided_and_tight(events):
    """est ≥ true for every key (hard guarantee), and at depth 5 ×
    width 4096 over 10k rows the overestimate is ~always 0."""
    from kafi_spark.functions.sketches import cms_estimate, cms_sketch

    cms = cms_sketch(events, "event_type")
    keys = events.select("event_type").distinct()
    got = {
        r["event_type"]: r["est"]
        for r in cms_estimate(cms, keys, "event_type").collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] >= want[k]            # one-sided, always
        assert got[k] <= want[k] + 10       # collision mass ~0 here


def test_cms_heavy_hitters_no_misses(events):
    from kafi_spark.functions.sketches import cms_heavy_hitters

    want = {
        r["user_id"]
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 80).collect()
    }
    got = {
        r["user_id"]
        for r in cms_heavy_hitters(events, "user_id", 80).collect()
    }
    assert want <= got          # every true heavy hitter surfaces
    # light keys can only slip in by collision; none expected here
    assert len(got - want) <= 2


def test_cms_merge_equals_direct(events):
    """Cell-wise sum of per-slice counter tables == one table over the
    whole data (the mergeability that makes persisted CMS state work)."""
    from kafi_spark.functions.sketches import cms_merge, cms_sketch

    per_type = cms_sketch(events, "user_id", ["event_type"])
    merged = {
        (r["d"], r["w"]): r["cnt"]
        for r in cms_merge(per_type).collect()
    }
    direct = {
        (r["d"], r["w"]): r["cnt"]
        for r in cms_sketch(events, "user_id").collect()
    }
    assert merged == direct


def test_cms_weighted(spark):
    from kafi_spark.functions.sketches import cms_estimate, cms_sketch

    df = spark.createDataFrame(
        [("a", 5), ("a", 7), ("b", 1)], "k string, wt int")
    cms = cms_sketch(df, "k", weight_col="wt")
    got = {
        r["k"]: r["est"]
        for r in cms_estimate(
            cms, df.select("k").distinct(), "k").collect()
    }
    assert got["a"] == 12 and got["b"] == 1


def test_cms_state_watermark(spark, events, tmp_path):
    """CMS persisted state shares the KLL watermark discipline: totals
    after compaction + a new epoch count every row exactly once."""
    from kafi_spark.functions.sketches import (
        cms_compact, cms_estimate, cms_over_time, cms_totals)
    from kafi_spark.functions.sketches import kll_save_delta

    state = str(tmp_path / "cstate")
    halves = [events.filter(F.col("event_id") % 2 == i) for i in range(2)]
    kll_save_delta(cms_over_time(halves[0], "event_type", "ts"), state, 0)
    cms_compact(spark, state, ["bucket"], prune=True)
    kll_save_delta(cms_over_time(halves[1], "event_type", "ts"), state, 1)
    tot = cms_totals(spark, state)  # merge buckets away too
    keys = events.select("event_type").distinct()
    got = {
        r["event_type"]: r["est"]
        for r in cms_estimate(tot, keys, "event_type").collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for k in want:
        assert want[k] <= got[k] <= want[k] + 10


def test_cms_sketch_stream_matches_batch(spark, events, tmp_path):
    """3-micro-batch CMS replay == one batch build, with an epoch
    replayed mid-stream (overwrite-own-delta keeps counts exact)."""
    from kafi_spark.functions.sketches import cms_estimate, cms_over_time
    from kafi_spark.streaming.stateful import cms_sketch_stream

    state = str(tmp_path / "cs")
    proc = cms_sketch_stream("event_type", "ts", state)
    parts = events.randomSplit([1.0, 1.0, 1.0], seed=5)
    proc(parts[0], 0)
    proc(parts[1], 1)
    proc(parts[1], 1)  # crash replay
    proc(parts[2], 2)
    from kafi_spark.functions.sketches import cms_totals

    tot = cms_totals(spark, state, ["bucket"])
    keys = events.select("event_type").distinct()
    got = {
        (r["bucket"], r["event_type"]): r["est"]
        for r in cms_estimate(
            tot, keys, "event_type", ["bucket"]).collect()
        if r["est"] > 0
    }
    want = {
        (r["bucket"], r["event_type"]): r["n"]
        for r in events.groupBy(
            F.date_trunc("day", "ts").alias("bucket"), "event_type")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for kk, n in want.items():
        assert n <= got[kk] <= n + 5


def test_corpus_report_stream_matches_batch(spark, sf_dir, tmp_path):
    """3-micro-batch replay of the documents table: exact counters and
    the language mix equal the batch corpus_report; the sketch-backed
    metrics land within estimator tolerance of the exact values."""
    from kafi_spark.functions.profile import corpus_report
    from kafi_spark.streaming.stateful import (
        corpus_report_stream, corpus_report_totals)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = {(r.section, r.metric): r.value
             for r in corpus_report(docs).collect()}

    state = str(tmp_path / "card")
    proc = corpus_report_stream(state)
    for i, p in enumerate(docs.randomSplit([1.0, 1.0, 1.0], seed=3)):
        proc(p, i)
    live = {(r.section, r.metric): r.value
            for r in corpus_report_totals(spark, state).collect()}

    for m in ("rows", "total_tokens", "total_chars"):
        assert float(live[("global", m)]) == float(batch[("global", m)]), m
    assert float(live[("global", "mean_tokens")]) == pytest.approx(
        float(batch[("global", "mean_tokens")]))
    # mean_quality divides by the NON-NULL quality count, exactly like
    # the batch report's avg() — not by rows
    assert float(live[("global", "mean_quality")]) == pytest.approx(
        float(batch[("global", "mean_quality")]))
    # language mix: exact counters, every batch-report lang replayed
    for (sec, m), v in batch.items():
        if sec == "lang":
            assert float(live[("lang", m)]) == float(v), m
    # sketch-backed: within 5% of the batch (itself HLL++/sketch-based)
    n = float(batch[("global", "rows")])
    assert abs(float(live[("global", "distinct_texts")])
               - float(batch[("global", "distinct_texts")])) <= 0.05 * n
    assert 0.0 <= float(live[("global", "dup_rate")]) < 1.0
    for m in ("p50_tokens", "p95_tokens"):
        assert abs(float(live[("global", m)])
                   - float(batch[("global", m)])) \
            <= 0.1 * float(batch[("global", m)]) + 2.0, m


def test_corpus_report_stream_replay_idempotent(spark, sf_dir, tmp_path):
    from kafi_spark.streaming.stateful import (
        corpus_report_stream, corpus_report_totals)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    state = str(tmp_path / "card")
    proc = corpus_report_stream(state)
    b0 = docs.limit(120)
    proc(b0, 0)
    first = sorted((r.section, r.metric, r.value)
                   for r in corpus_report_totals(spark, state).collect())
    # crash-before-commit replay of the same epoch: byte-identical card
    proc(b0, 0)
    again = sorted((r.section, r.metric, r.value)
                   for r in corpus_report_totals(spark, state).collect())
    assert first == again


def test_cms_estimate_grouped_absent_key_is_zero(spark):
    """A key absent from a group must estimate 0 for that group (its
    zero cells count in the depth-wise min) — not inflate past the CMS
    bound or emit a spurious null-group row."""
    df = spark.createDataFrame(
        [("b1", "Y")] * 5, "bucket string, k string")
    cms = sk.cms_sketch(df, "k", ["bucket"], depth=5, width=4)
    keys = spark.createDataFrame([("Q",), ("Y",)], "k string")
    got = {(r.bucket, r.k): r.est for r in sk.cms_estimate(
        cms, keys, "k", ["bucket"], depth=5, width=4).collect()}
    assert None not in {b for b, _ in got}          # no phantom group
    assert got[("b1", "Y")] >= 5                    # est >= true
    # absent key: every cell either collides with Y or is zero; with
    # width=4 a collision is possible, but at least the guarantee that
    # zero cells participate must hold: est <= total mass
    assert 0 <= got[("b1", "Q")] <= 5
    # wide sketch -> no collision -> exactly zero
    cms_w = sk.cms_sketch(df, "k", ["bucket"], depth=5, width=4096)
    got_w = {(r.bucket, r.k): r.est for r in sk.cms_estimate(
        cms_w, keys, "k", ["bucket"], depth=5, width=4096).collect()}
    assert got_w[("b1", "Q")] == 0


def test_theta_totals_preserve_build_lgk(spark, events, tmp_path):
    """High-precision theta state merged at the BUILD lgk stays in
    exact mode; the old default-lgk union would downsample it."""
    state = str(tmp_path / "theta")
    daily = sk.theta_over_time(events, "user_id", "ts", lgk=20)
    sk.sketch_save_delta(daily.drop("distinct_est"), state, 0)
    exact = events.select("user_id").distinct().count()
    tot = sk.sketch_totals(spark, state, kind="theta", lgk=20) \
        .agg(F.sum("distinct_est")).first()[0]
    # per-bucket sketches, each far below 2^20 capacity -> exact
    got = sk.sketch_totals(spark, state, [], "sketch", "theta", 20) \
        .first()["distinct_est"]
    assert round(got) == exact


def test_cms_estimate_null_group_value(spark):
    """A NULL grouping value is a real group (null time bucket etc.):
    the grouped probe must find its counts via a null-safe join, not
    report est=0."""
    df = spark.createDataFrame(
        [(None, "Y")] * 7 + [("b1", "Z")] * 3,
        "bucket string, k string")
    cms = sk.cms_sketch(df, "k", ["bucket"], depth=5, width=4096)
    keys = spark.createDataFrame([("Y",), ("Z",)], "k string")
    got = {(r.bucket, r.k): r.est for r in sk.cms_estimate(
        cms, keys, "k", ["bucket"], depth=5, width=4096).collect()}
    assert got[(None, "Y")] == 7
    assert got[("b1", "Z")] == 3
    assert got[(None, "Z")] == 0 and got[("b1", "Y")] == 0


def test_sketch_retention_null_dim_group_retained(spark):
    """Round-9 review: a NULL dim value is a real group (cms_estimate's
    pinned standard), but the retention self-join used plain equality —
    NULL != NULL dropped the NULL segment's rows silently."""
    from datetime import datetime as DT

    ev = spark.createDataFrame(
        [(1, DT(2024, 1, 1), None), (2, DT(2024, 1, 1), None),
         (1, DT(2024, 1, 2), None), (3, DT(2024, 1, 2), None),
         (1, DT(2024, 1, 1), "de"), (1, DT(2024, 1, 2), "de")],
        "user long, ts timestamp, country string")
    daily = sk.theta_over_time(ev, "user", "ts", dims=["country"])
    out = {(r.bucket.day, r.country): (r.retained, r.churned, r.new_keys)
           for r in sk.sketch_retention(daily, dims=["country"]).collect()}
    assert out[(2, None)] == (1, 1, 1)   # user 1 retained, 2 churned, 3 new
    assert out[(2, "de")] == (1, 0, 0)


def test_cms_sketch_weight_validation(spark):
    """Round-9 review: fractional weights silently truncated to 0 via
    cast('long'), breaking the est >= true no-miss guarantee; integral
    weights with NULLs count 0."""
    import pytest as _pytest

    frac = spark.createDataFrame([("k", 0.9)], "key string, w double")
    with _pytest.raises(ValueError, match="integral"):
        sk.cms_sketch(frac, "key", weight_col="w")
    ints = spark.createDataFrame(
        [("k", 3), ("k", None), ("j", 2)], "key string, w int")
    cms = sk.cms_sketch(ints, "key", weight_col="w")
    est = {r.key: r.est for r in sk.cms_estimate(
        cms, spark.createDataFrame([("k",), ("j",)], "key string"),
        "key").collect()}
    assert est["k"] >= 3 and est["j"] >= 2


def test_kll_save_delta_rejects_negative_epoch(spark, tmp_path):
    """Round-9 review: negative epochs bypass save_delta's lineage
    fence (str(-1).isdigit() is False) and collide with compact_fold's
    -1 sentinel."""
    import pytest as _pytest

    d = sk.quantile_sketch(
        spark.range(10).select(F.col("id").cast("double").alias("v")), "v")
    with _pytest.raises(ValueError, match="non-negative"):
        sk.kll_save_delta(d, str(tmp_path / "s"), -1)
