"""Property tests for the persisted-sketch state algebras.

The module's central claim is an ALGEBRAIC one: idempotent-union state
(HLL/theta) tolerates any interleaving of saves, duplicate deltas, and
compactions, while additive state (KLL/CMS) stays exact under any
epoch partition + compaction schedule BECAUSE of the watermark read
path, not because merges happen to be applied once. Hypothesis drives
arbitrary schedules at both claims.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from kafi_spark.functions import sketches as sk

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# a run = values 0..n-1 split into 1-4 epochs, with compaction points
schedules = st.integers(min_value=2, max_value=5).flatmap(
    lambda n_epochs: st.tuples(
        st.lists(
            st.integers(min_value=0, max_value=n_epochs - 1),
            min_size=30, max_size=80,
        ),
        st.sets(st.integers(min_value=0, max_value=n_epochs - 2)),
        st.just(n_epochs),
    )
)


@given(sched=schedules)
@_settings
def test_kll_exact_n_under_any_schedule(spark, tmp_path_factory, sched):
    """For EVERY partition of rows into epochs and EVERY set of
    compaction points (compact after epoch e ∈ points), the final
    totals absorb each row exactly once — detected via KLL's lossless
    n, which any double- or zero-merge would shift."""
    assign, compact_after, n_epochs = sched
    state = str(tmp_path_factory.mktemp("kllprop") / "s")
    rows = [(float(i), e) for i, e in enumerate(assign)]
    df = spark.createDataFrame(rows, "v double, e int")
    for epoch in range(n_epochs):
        batch = df.filter(F.col("e") == epoch).select("v")
        if batch.count() == 0:
            continue  # an absent epoch simply writes nothing
        sk.kll_save_delta(
            sk.quantile_sketch(batch, "v"), state, epoch)
        if epoch in compact_after:
            sk.kll_compact(spark, state, dtype="double")
    got = sk.quantile_values(
        sk.kll_totals(spark, state, dtype="double"), [0.5], "double"
    ).first()
    assert got["n"] == len(assign)


@given(sched=schedules, dup=st.integers(min_value=0, max_value=4))
@_settings
def test_theta_exact_under_duplicate_deltas(
        spark, tmp_path_factory, sched, dup):
    """Idempotent-union state: re-saving ANY epoch's delta under a new
    (higher) version — a stale leftover replayed late — and compacting
    at any point never changes the distinct total; theta exact mode
    makes 'never changes' an equality, not a tolerance. The duplicate
    lands AFTER the epoch loop: since round 9 the numeric-epoch lineage
    fence refuses writes below the committed frontier (that hazard has
    its own test, test_stateful.test_numeric_epoch_lineage_fence), so
    the legal stale-leftover shape is a duplicate at a new high id."""
    assign, compact_after, n_epochs = sched
    state = str(tmp_path_factory.mktemp("thprop") / "s")
    rows = [(i % 17, e) for i, e in enumerate(assign)]
    df = spark.createDataFrame(rows, "k int, e int")
    leftovers = []
    for epoch in range(n_epochs):
        batch = df.filter(F.col("e") == epoch).select("k")
        if batch.count() == 0:
            continue
        sk.sketch_save_delta(
            sk.theta_sketch(batch, "k"), state, epoch)
        if epoch == dup % n_epochs:  # duplicate this delta as leftover
            leftovers.append((batch, 100 + epoch))
        if epoch in compact_after:
            sk.sketch_compact(spark, state, epoch, kind="theta")
    for batch, ver in leftovers:
        sk.sketch_save_delta(sk.theta_sketch(batch, "k"), state, ver)
    got = sk.sketch_totals(spark, state, kind="theta").first()
    want = df.select("k").distinct().count()
    assert got["distinct_est"] == want
