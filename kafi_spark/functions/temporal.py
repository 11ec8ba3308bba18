"""Temporal joins: as-of and range, the two joins time-series and
training-data pipelines need that plain equi/theta joins express badly.

Beyond the reference surface (kafi has only theta/equi joins,
``kafi/streams/topologynode.py:354-430``) — these cover the "attach the
latest dimension state to each fact" and "events within a window of an
anchor" shapes that otherwise tempt users into cartesian-ish theta joins.

Scale notes:

* :func:`asof_join` is the union + keyed-window plan — ONE shuffle on the
  join key, no inequality join, no per-row range explosion. State per key
  is a running "last right row seen", so skew only matters where key
  cardinality is degenerate (same place any keyed shuffle hurts).
* :func:`range_join` buckets time so the inequality condition becomes an
  equi-join on (key, bucket) plus an exact residual filter — Catalyst
  gets a hash join instead of a broadcast-nested-loop. Each right row
  lands in exactly one bucket and each left anchor explodes to the
  O((upper-lower)/bucket + 1) buckets its window covers, so no pair is
  produced twice and the fan-out is bounded by construction.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def _guard_internal_names(
    left: DataFrame, right: DataFrame, names: tuple[str, ...]
) -> None:
    clash = (set(left.columns) | set(right.columns)) & set(names)
    if clash:
        raise ValueError(
            f"columns {sorted(clash)} collide with join internals; "
            "rename them before joining"
        )


def _orderable(schema) -> bool:
    """True when every field sorts (no MapType anywhere) — the condition
    for using the payload struct as a deterministic window tie-break."""
    from pyspark.sql import types as T

    def go(dt) -> bool:
        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return go(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(go(f.dataType) for f in dt.fields)
        return True

    return go(schema)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    how: str = "inner",
    tolerance_us: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the LATEST right row of the same key with
    ``right_ts <= left_ts`` (ties at equal timestamps match).

    Matches DuckDB/pandas ``ASOF JOIN`` backward semantics. Right payload
    columns (everything but key + timestamp) are attached, renamed with
    ``suffix`` where they collide with a left column; the matched right
    timestamp is attached as ``{right_ts}{suffix}``.

    Plan: tag both sides, union, and take per key a running
    ``last(right_payload, ignorenulls)`` over ``(ts, tag)`` order — right
    rows sort before left rows at equal timestamps, so the window's last
    seen right-struct at a left row IS the as-of match. One exchange on
    the key, one sort, zero joins.

    ``how='inner'`` drops unmatched left rows (DuckDB default);
    ``'left'`` keeps them with nulls. ``tolerance_us`` additionally
    requires ``left_ts - right_ts <= tolerance`` (microseconds), like
    pandas ``merge_asof(tolerance=...)``.

    Ties: when several right rows share the same (key, timestamp), the
    one with the MAXIMAL payload struct wins (deterministic); if the
    right payload contains map columns (not orderable), the winner is
    arbitrary. Column names starting with ``__`` are rejected (they
    collide with join internals).
    """
    keys = [on] if isinstance(on, str) else list(on)
    _guard_internal_names(left, right, ("__t", "__tag", "__r", "__m", "__rts"))
    payload = [c for c in right.columns if c not in keys + [right_ts]]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in payload
    }
    ts_out = right_ts + suffix if right_ts in left.columns else right_ts

    r = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__tag"),
        F.struct(
            F.col(right_ts).alias("__rts"),
            *[F.col(c).alias(out_names[c]) for c in payload],
        ).alias("__r"),
    )
    l = left.withColumn("__t", F.col(left_ts)).withColumn("__tag", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    # tie-break: several right rows sharing (key, timestamp) would make
    # F.last pick an arbitrary one; ordering by the payload struct makes
    # the winner the MAXIMAL payload, deterministically (and keeps the
    # DuckDB-differential check stable). Struct ordering needs orderable
    # field types — with map-typed payloads we fall back to the
    # documented arbitrary-tie behavior rather than failing the join.
    order = ["__t", "__tag"]
    if _orderable(right.schema):
        order.append("__r")
    w = (
        W.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).filter(
        F.col("__tag") == 1
    )
    if tolerance_us is not None:
        in_tol = (
            F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col("__m.__rts"))
        ) <= F.lit(tolerance_us)
        matched = matched.withColumn(
            "__m", F.when(in_tol, F.col("__m"))
        )
    if how == "inner":
        matched = matched.filter(F.col("__m").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return matched.select(
        *left.columns,
        F.col("__m.__rts").alias(ts_out),
        *[F.col(f"__m.{out_names[c]}").alias(out_names[c]) for c in payload],
    )


def range_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    watermark: str = "10 seconds",
    suffix: str = "_r",
) -> DataFrame:
    """Streaming twin of :func:`range_join`: stream-stream inner join
    with watermarks on BOTH sides and the range predicate in the join
    condition — exactly the shape Structured Streaming uses to bound
    and GC join state (each side's state is dropped once the other
    side's watermark passes the window).

    The batch variant's bucket trick is unnecessary here: the range
    condition itself is the state bound. Inner join only (matches emit
    immediately; outer temporal joins need watermark-delayed emission).
    Right columns are renamed with ``suffix`` on collision, matching
    :func:`range_join` output naming.
    """
    if upper_us < lower_us:
        raise ValueError("upper_us must be >= lower_us")
    keys = [on] if isinstance(on, str) else list(on)
    rename = {
        c: (c + suffix if c in left.columns else c)
        for c in right.columns
        if c not in keys
    }
    r = right.select(
        *[F.col(k).alias(f"__rk_{k}") for k in keys],
        *[F.col(c).alias(rename[c]) for c in rename],
    ).withWatermark(rename[right_ts], watermark)
    l = left.withWatermark(left_ts, watermark)
    # the range condition is INTERVAL arithmetic on the raw watermarked
    # timestamp columns — the one shape StreamingJoinHelper can analyze
    # into a state-value watermark. An earlier unix_micros() form was
    # semantically identical but unanalyzable: results stayed correct
    # while join state was never evicted (unbounded growth) — the plan
    # now carries non-empty "state cleanup" predicates on both sides,
    # which the test asserts.
    rcol = F.col(rename[right_ts])
    lcol = F.col(left_ts)
    cond = (
        (rcol >= lcol + F.expr(f"INTERVAL {int(lower_us)} MICROSECOND"))
        & (rcol <= lcol + F.expr(f"INTERVAL {int(upper_us)} MICROSECOND"))
    )
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"__rk_{k}"))
    return l.join(r, cond, "inner").drop(*[f"__rk_{k}" for k in keys])


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    bucket_us: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Pairs (left, right) with the same key and
    ``left_ts + lower <= right_ts <= left_ts + upper`` (inclusive,
    microsecond offsets; ``lower_us`` may be negative for windows that
    open before the anchor).

    Returns left columns + right columns (right renamed with ``suffix``
    on collision). Aggregate on top for "N events within the window of
    each anchor" rollups.

    Plan: right rows key into exactly one time bucket; left anchors
    explode to the buckets their window spans (``(upper-lower)/bucket+1``
    of them, default bucket = window width ⇒ ≤ 2). Equi-join on
    (key, bucket), then the exact range residual. No pair meets twice, so
    no distinct is needed.
    """
    if upper_us < lower_us:
        raise ValueError("upper_us must be >= lower_us")
    keys = [on] if isinstance(on, str) else list(on)
    _guard_internal_names(left, right, ("__b",))
    width = max(upper_us - lower_us, 1)
    bucket = bucket_us or width

    lo = (F.unix_micros(F.col(left_ts)) + F.lit(lower_us))
    hi = (F.unix_micros(F.col(left_ts)) + F.lit(upper_us))
    l = left.withColumn(
        "__b",
        F.explode(
            F.sequence(F.floor(lo / F.lit(bucket)), F.floor(hi / F.lit(bucket)))
        ),
    )
    rename = {
        c: (c + suffix if c in left.columns else c)
        for c in right.columns
        if c not in keys
    }
    r = right.select(
        *keys,
        *[F.col(c).alias(rename[c]) for c in rename],
    ).withColumn(
        "__b", F.floor(F.unix_micros(F.col(rename[right_ts])) / F.lit(bucket))
    )
    rts = F.unix_micros(F.col(rename[right_ts]))
    return (
        l.join(r, keys + ["__b"])
        .filter((rts >= lo) & (rts <= hi))
        .drop("__b")
    )


def merge_intervals(
    df: DataFrame,
    on: str | Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge overlapping/touching intervals per key (union of coverage —
    the interval companion to gap-based sessionization).

    Island detection via one keyed window: an interval starts a new
    island when its start exceeds the running max end of everything
    before it; islands then aggregate to (min start, max end, n_merged).
    One shuffle on the key, one sort — the plan sessionize uses, with
    interval ends instead of gaps. Intervals that merely touch
    (start == previous end) merge.

    Output: key cols + (start_col, end_col, n_merged).
    """
    keys = [on] if isinstance(on, str) else list(on)
    _guard_internal_names(df, df, ("__island",))
    w = W.partitionBy(*keys).orderBy(F.col(start_col), F.col(end_col))
    prev_max_end = F.max(F.col(end_col)).over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    new_island = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    island = F.sum(new_island).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        df.withColumn("__island", island)
        .groupBy(*keys, "__island")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("__island")
    )
