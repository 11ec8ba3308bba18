"""Event-time windows — batch and streaming assigners.

The reference assigns windows by flat-mapping each record to
``(record, window_end)`` pairs (kafi/streams/topologynode.py:672-714) and
aggregates keyed by ``(key, window_end)``; emission waits for the running
max event time ("watermark") to pass the window end (trigger,
topologynode.py:654-666).

Spark-first rendering:

* tumbling / hopping → native ``F.window`` (streaming gets watermark-driven
  append emission for free);
* session → native ``F.session_window`` in streaming; in batch, the
  classic lag/cumsum sessionization (one window shuffle) which also gives
  per-session aggregates with arbitrary expressions;
* cumulative (Flink CUMULATE) → explode over the covering window-ends
  (no native Spark equivalent);
* per-record sliding ([ts, ts+size], topologynode.py:702-707) → a range
  window frame in batch; streaming needs applyInPandasWithState.

All assigners compute in epoch seconds/millis (BIGINT) so downstream
group-bys hash integers, and oracle engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def _epoch_ms(ts: Column) -> Column:
    return F.unix_millis(ts)


def tumbling(df: DataFrame, ts_col: str, size_ms: int, start_alias: str = "w_start") -> DataFrame:
    """Assign the single tumbling window start (epoch ms)
    (topologynode.py:672-677: end = ⌊ts/size⌋*size + size)."""
    ms = _epoch_ms(F.col(ts_col))
    # integer arithmetic (no double division) so the boundary is exact;
    # pmod, not %, so pre-epoch (negative-ms) timestamps still FLOOR to
    # the window start below them (Spark's % keeps the dividend's sign,
    # which put a -5000 ms record in the window STARTING at -3000)
    return df.withColumn(
        start_alias, (ms - F.pmod(ms, F.lit(size_ms))).cast("long"))


def hopping(
    df: DataFrame, ts_col: str, size_ms: int, hop_ms: int, start_alias: str = "w_start"
) -> DataFrame:
    """Explode each record into every hop window covering it
    (topologynode.py:679-687). size/hop windows per record; the explode is
    JVM-side ``sequence``."""
    ms = _epoch_ms(F.col(ts_col))
    anchor = ms - F.pmod(ms, F.lit(hop_ms))  # pmod: pre-epoch-safe floor
    # candidates step back (size-1)//hop hops: every hop-multiple start
    # in (ms - size, ms]. size//hop - 1 under-stepped whenever hop does
    # not divide size (the earliest covering window was silently
    # dropped), and went NEGATIVE for hop > size (illegal sequence
    # bounds at runtime). The coverage filter then drops non-covering
    # candidates — with hop > size a record between windows correctly
    # explodes to zero rows.
    n_back = max((size_ms - 1) // hop_ms, 0)
    starts = F.sequence(
        (anchor - n_back * hop_ms).cast("long"),
        anchor.cast("long"),
        F.lit(hop_ms).cast("long"),
    )
    return df.withColumn(
        start_alias,
        F.explode(F.filter(starts, lambda s: (s + size_ms > ms) & (s <= ms))),
    )


def cumulative(
    df: DataFrame, ts_col: str, size_ms: int, step_ms: int, start_alias: str = "w_start",
    end_alias: str = "w_end",
) -> DataFrame:
    """Flink-style CUMULATE (topologynode.py:689-700): within each ``size``
    period starting at the period boundary, emit a window for every
    step-end STRICTLY after the record's timestamp (half-open
    [start, end) windows, Flink's convention — a record ON a step
    boundary belongs to the next step, not its own). Explode over the
    covering ends.

    ``size_ms`` must be a multiple of ``step_ms`` (the same contract
    Flink's CUMULATE enforces): with a partial final step, a record
    landing after the last whole step has no well-defined end sequence
    — previously that crashed data-dependently at runtime (illegal
    sequence bounds); now it is rejected up front."""
    if size_ms % step_ms:
        raise ValueError(
            f"size_ms must be a multiple of step_ms (Flink CUMULATE "
            f"contract), got size={size_ms}, step={step_ms}")
    ms = _epoch_ms(F.col(ts_col))
    period_start = (ms - F.pmod(ms, F.lit(size_ms))).cast("long")
    in_period = ms - period_start
    first_end = (period_start + (in_period - (in_period % step_ms)) + step_ms).cast("long")
    ends = F.sequence(first_end, (period_start + size_ms).cast("long"), F.lit(step_ms).cast("long"))
    return (
        df.withColumn(start_alias, period_start)
        .withColumn(end_alias, F.explode(ends))
    )


def sliding_count(
    df: DataFrame,
    ts_col: str,
    size_ms: int,
    partition_cols: list[str],
    agg_col: Column,
    alias: str,
) -> DataFrame:
    """Per-record sliding window [ts, ts+size] (topologynode.py:702-707):
    for every record, aggregate over the same key's records in the next
    ``size`` ms. A RANGE window frame over epoch-ms — one shuffle on the
    key, no self-join blowup."""
    ms_col = "__ms"
    w = (
        W.partitionBy(*partition_cols)
        .orderBy(F.col(ms_col))
        .rangeBetween(0, size_ms)
    )
    return (
        df.withColumn(ms_col, _epoch_ms(F.col(ts_col)))
        .withColumn(alias, agg_col.over(w))
        .drop(ms_col)
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    gap_ms: int,
    partition_cols: list[str],
    session_alias: str = "session_id",
) -> DataFrame:
    """Batch sessionization with gap merge (topologynode.py:709-714 buckets
    for expiry; true gap-merge in the aggregate at topologynode.py:757-819).

    lag + cumulative-sum-of-boundaries: one shuffle on the key; sessions
    numbered 1..n per key in event-time order (ties broken by all remaining
    columns deterministically is the caller's business — pass an order
    tie-break column in ``ts_col`` ordering if needed).
    """
    ms = _epoch_ms(F.col(ts_col))
    order = W.partitionBy(*partition_cols).orderBy(ms)
    prev = F.lag(ms).over(order)
    boundary = F.when(prev.isNull() | ((ms - prev) > gap_ms), 1).otherwise(0)
    running = W.partitionBy(*partition_cols).orderBy(ms).rowsBetween(W.unboundedPreceding, 0)
    return df.withColumn(session_alias, F.sum(boundary).over(running).cast("long"))


def streaming_tumbling(df: DataFrame, ts_col: str, size: str, lateness: str):
    """Streaming tumbling window groupBy key: ``withWatermark`` +
    ``F.window`` — Spark's native assign+trigger+expire fusion (SURVEY
    §2.9). Returns the windowed grouping expression for callers to agg on."""
    return df.withWatermark(ts_col, lateness), F.window(F.col(ts_col), size)


def streaming_session(df: DataFrame, ts_col: str, gap: str, lateness: str):
    """Streaming session window (Spark ≥3.2 native ``session_window``)."""
    return df.withWatermark(ts_col, lateness), F.session_window(F.col(ts_col), gap)
