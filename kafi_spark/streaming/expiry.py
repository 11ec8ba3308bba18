"""Window-shaped state expiry — the reference's expire_* wrappers.

The reference derives expiry from the window assigner: a record may be
evicted once the LAST window that could still use it has closed, i.e.
``expiry(ts) = max(window_ends(ts)) + allowed_lateness`` compared against
the watermark = max event time seen (kafi/streams/topologynode.py:
573-648 feedback operator; wrappers expire_tumbling/hopping/cumulative/
sliding/session at :832-855 via _expire_window :825-828).

These factories produce ``expire=`` callables for
:class:`~kafi_spark.streaming.incremental.IncrementalRunner` — its
per-source hook applies them to the integrated state each step. The
watermark is the max event time IN STATE (new deltas are integrated
before expiry, so it advances exactly like the reference's running max;
evicted records can never push it backward). The one scalar ``max``
aggregate per step is driver-side by design — this runner is the
retraction-parity harness; production streaming uses Structured
Streaming's ``withWatermark`` (runner.py), where eviction is native.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, functions as F


def _expiry_expr(kind: str, ms: Column, size_ms: int, hop_ms: int | None) -> Column:
    if kind == "tumbling":
        return (F.floor(ms / size_ms) + 1) * size_ms
    if kind == "hopping":
        if not hop_ms:
            raise ValueError("hopping expiry needs hop_ms")
        # last hop window covering ts ends at floor(ts/hop)*hop + size
        return F.floor(ms / hop_ms) * hop_ms + size_ms
    if kind == "cumulative":
        # record participates until the end of its large period
        return (F.floor(ms / size_ms) + 1) * size_ms
    if kind == "sliding":
        # per-record window [ts, ts + size] is CLOSED on the right
        # (windows.sliding_count uses rangeBetween(0, size) inclusive):
        # an event at exactly wm = ts + size still lands in ts's window,
        # so the last relevant end is one past it — ms + size evicted
        # the anchor while its window could still gain members
        return ms + size_ms + 1
    if kind == "session":
        # ts + max_session + 1, NOT the reference's max_session BUCKETS
        # (topologynode.py:709-714): bucketing evicts a record as soon
        # as its bucket closes, but a still-open session containing it
        # may legitimately run until its start + max_session — e.g.
        # (k, 900) bucketed to 1000 was evicted at wm=1050 while its
        # session with (k, 1050) was alive, emitting a wrong retraction
        # (review r7). With session length capped at max_session, no
        # session containing ts can outlive ts + max_session.
        return ms + size_ms + 1
    raise ValueError(f"unknown window kind {kind!r}")


def window_expiry(
    kind: str,
    ts_col: str,
    size_ms: int,
    hop_ms: int | None = None,
    lateness_ms: int = 0,
) -> Callable[[DataFrame], DataFrame]:
    """An ``expire=`` callable evicting records whose last relevant
    window end (+ lateness) is at or before the state's max event time.

    ``ts_col`` holds epoch milliseconds (the reference's ``time_fun``
    convention). Kinds: tumbling, hopping (needs ``hop_ms``),
    cumulative, sliding, session (``size_ms`` = max session length).
    """
    def expire(df: DataFrame) -> DataFrame:
        # IncrementalRunner checkpoints the integrated state before
        # invoking this hook (the max-agg and the filter both consume
        # it); standalone callers applying it to an expensive frame
        # should anchor it themselves.
        dt = dict(df.dtypes).get(ts_col, "")
        if dt.startswith("timestamp"):
            # epoch MILLISECONDS, whatever the physical type: a raw
            # cast("long") on TimestampType yields SECONDS, silently
            # making every window ~1000x longer (a 1-minute expiry
            # retained ~16.6 hours of state; review r7)
            ts = F.unix_millis(F.col(ts_col))
        else:
            ts = F.col(ts_col).cast("long")
        wm = df.agg(F.max(ts)).first()[0]
        if wm is None:
            return df
        keep = _expiry_expr(kind, ts, size_ms, hop_ms) + lateness_ms
        # null event times never expire (filter(NULL) would silently
        # evict them and retract their contributions): timeless records
        # are the caller's retention problem, not the watermark's
        return df.filter(F.col(ts_col).isNull() | (keep > F.lit(wm)))

    return expire


def expire_tumbling(ts_col: str, size_ms: int, lateness_ms: int = 0):
    return window_expiry("tumbling", ts_col, size_ms, lateness_ms=lateness_ms)


def expire_hopping(ts_col: str, size_ms: int, hop_ms: int, lateness_ms: int = 0):
    return window_expiry("hopping", ts_col, size_ms, hop_ms, lateness_ms)


def expire_cumulative(ts_col: str, size_ms: int, lateness_ms: int = 0):
    return window_expiry("cumulative", ts_col, size_ms, lateness_ms=lateness_ms)


def expire_sliding(ts_col: str, size_ms: int, lateness_ms: int = 0):
    return window_expiry("sliding", ts_col, size_ms, lateness_ms=lateness_ms)


def expire_session(ts_col: str, max_session_ms: int, lateness_ms: int = 0):
    return window_expiry("session", ts_col, max_session_ms, lateness_ms=lateness_ms)
