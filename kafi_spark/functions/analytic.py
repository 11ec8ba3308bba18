"""Analytic / OLAP operators the reference lacks but Spark gives free.

SURVEY.md §2.7 notes the reference has "no grouping sets / cube / rollup;
no ranking or analytic window functions; no sort or top-k operator" and
that the new engine should expose them. These are thin, declarative
wrappers — Catalyst plans ranking as one shuffle on the partition keys
with in-partition sort, and rollup/cube as expanded grouping sets with
map-side partial aggregation.

Scale notes: ``topn_per_group`` is the rank-window top-k — at high group
cardinality the shuffle is hash-partitioned by group (no global sort);
for tiny k over huge groups prefer the aggregate form
``F.max_by``/``F.min_by`` or a pre-filter on an approximate threshold.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def topn_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    n: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-n rows per group by ``order_by`` (deterministic if the ordering
    is total). One shuffle on the group keys."""
    w = W.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
    )


def with_lag(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_by: Sequence[Column],
    col: str,
    lag_alias: str | None = None,
    lead_alias: str | None = None,
) -> DataFrame:
    """Attach lag/lead of ``col`` within each partition."""
    w = W.partitionBy(*partition_cols).orderBy(*order_by)
    out = df
    if lag_alias:
        out = out.withColumn(lag_alias, F.lag(col).over(w))
    if lead_alias:
        out = out.withColumn(lead_alias, F.lead(col).over(w))
    return out


def rollup_agg(
    df: DataFrame, group_cols: Sequence[str], *aggs: Column
) -> DataFrame:
    """ROLLUP aggregate over ``group_cols`` — subtotals at every prefix
    level plus the grand total. Null grouping keys from the rollup are
    left as-is (callers wanting engine-portable output should coalesce
    them to a sentinel)."""
    return df.rollup(*group_cols).agg(*aggs)


def cube_agg(df: DataFrame, group_cols: Sequence[str], *aggs: Column) -> DataFrame:
    """CUBE aggregate — subtotals for every subset of ``group_cols``."""
    return df.cube(*group_cols).agg(*aggs)


def percentiles(
    df: DataFrame,
    col: str,
    probs: Sequence[float],
    group_cols: Sequence[str] = (),
    approx: bool = False,
) -> DataFrame:
    """Percentiles of ``col`` (optionally per group), long format
    (group_cols..., prob, value).

    Exact mode uses ``F.percentile`` — continuous interpolation matching
    DuckDB's ``quantile_cont`` (differential-tested); it needs the
    group's values together (sort-based aggregate buffer), which holds
    to large-but-bounded group sizes. ``approx=True`` switches to
    ``percentile_approx`` — the constant-memory sketch for 100 TB
    groups, at bounded rank error.
    """
    fn = F.percentile_approx if approx else F.percentile
    agged = (df.groupBy(*group_cols) if group_cols else df.groupBy()).agg(
        *[
            fn(F.col(col), F.lit(p)).alias(f"__p{i}")
            for i, p in enumerate(probs)
        ]
    )
    entries = [
        F.struct(F.lit(float(p)).alias("prob"), F.col(f"__p{i}").alias("value"))
        for i, p in enumerate(probs)
    ]
    return agged.select(
        *group_cols, F.explode(F.array(*entries)).alias("__e")
    ).select(*group_cols, "__e.prob", "__e.value")


#: granularity name -> date_trunc unit (ordered coarse -> fine)
_TRUNC_UNITS = ("year", "quarter", "month", "week", "day", "hour", "minute")


def time_rollup(
    df: DataFrame,
    ts_col: str,
    granularities: Sequence[str],
    group_cols: Sequence[str] = (),
    *aggs: Column,
) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: the same aggregates
    at SEVERAL time granularities in one pass.

    Output columns: ``grain`` (the granularity name), ``bucket`` (the
    truncated timestamp), any ``group_cols``, then the aggregates.

    Plan: one scan; the row set is expanded to one (grain, bucket) pair
    per requested granularity via an inline array (posexplode of a
    k-element array — k = len(granularities), a constant), then a single
    hash aggregate with map-side partial combine. This beats k separate
    scans+aggregates whenever the scan dominates — the 100 TB case —
    and the shuffle carries only (grain, bucket, groups) keyed partials.
    """
    bad = [g for g in granularities if g not in _TRUNC_UNITS]
    if bad:
        raise ValueError(f"unsupported granularities {bad}; pick from {_TRUNC_UNITS}")
    clash = {"grain", "bucket"} & set(df.columns)
    if clash:
        raise ValueError(
            f"columns {sorted(clash)} collide with time_rollup output names; "
            "rename them before rolling up"
        )
    pairs = F.array(
        *[
            F.struct(
                F.lit(g).alias("grain"),
                F.date_trunc(g, F.col(ts_col)).alias("bucket"),
            )
            for g in granularities
        ]
    )
    exploded = df.select(F.explode(pairs).alias("__gb"), "*").select(
        F.col("__gb.grain").alias("grain"),
        F.col("__gb.bucket").alias("bucket"),
        *df.columns,
    )
    return exploded.groupBy("grain", "bucket", *group_cols).agg(*aggs)


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered-funnel conversion: how many users completed step 1, then
    step 2 STRICTLY AFTER their step 1, and so on — the classic event
    analytics funnel, as a chain of per-step aggregates.

    A user reaches step k+1 iff some step-(k+1) event lands strictly
    after their EARLIEST qualifying step-k time (the standard greedy
    definition — earliest-first maximizes later-step reachability for
    funnels without revisits); ``within_seconds`` additionally bounds
    every step to that horizon from the user's funnel START.

    Output: one row per step — ``(step_idx, step, n_users)``. Plan: k−1
    per-step joins on the user id (each stage frame is one row per
    surviving user, shrinking monotonically; Catalyst broadcasts late
    stages under AQE) + k single-row count aggregates unioned. No
    windows over the raw event stream, no UDFs.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    stage = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t"))
        .withColumn("__t0", F.col("__t"))
    )
    out = stage.agg(
        F.lit(0).alias("step_idx"),
        F.lit(steps[0]).alias("step"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
    )
    for i, step_name in enumerate(steps[1:], start=1):
        nxt = events.filter(F.col(type_col) == step_name).select(
            F.col(user_col), F.col(ts_col).alias("__ts")
        )
        joined = nxt.join(stage, user_col).filter(F.col("__ts") > F.col("__t"))
        if within_seconds is not None:
            # unix_micros, not cast("long"): the cast truncates to whole
            # seconds, so sub-second slack silently widened the window
            joined = joined.filter(
                F.unix_micros(F.col("__ts"))
                <= F.unix_micros(F.col("__t0")) + within_seconds * 1_000_000
            )
        stage = joined.groupBy(user_col).agg(
            F.min("__ts").alias("__t"), F.min("__t0").alias("__t0")
        )
        out = out.unionByName(
            stage.agg(
                F.lit(i).alias("step_idx"),
                F.lit(step_name).alias("step"),
                F.count(F.lit(1)).cast("long").alias("n_users"),
            )
        )
    return out


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
    max_periods: int = 12,
) -> DataFrame:
    """Cohort retention triangle: users grouped by their FIRST-ACTIVITY
    period (the cohort), counted in each later period they return.

    Output: ``(cohort, period_offset, n_users)`` — offset 0 is the
    cohort size itself. ``period`` must be a FIXED-LENGTH unit
    (``hour``/``day``/``week``): offset arithmetic on variable-length
    months or years would lie, so those raise. Plan:
    one window-free aggregate for first activity (groupBy min), one
    join back keyed on the user id, one distinct-count aggregate —
    the (user, period) distinct happens BEFORE counting so multiple
    events in a period count once, and the final aggregate counts
    DISTINCT users so two truncated periods that collapse to the same
    offset (possible in a DST-observing session timezone, where a
    truncated 'day' is 23/25 h and a 'week' 167/169 h) still count a
    user once per (cohort, offset) cell. Offsets are exact under a UTC
    session timezone (``spark.sql.session.timeZone=UTC``); under a
    DST zone adjacent offsets can shift by one at transitions.
    """
    if max_periods < 1:
        raise ValueError(f"max_periods must be >= 1, got {max_periods}")
    if period not in _PERIOD_SECONDS:
        raise ValueError(
            f"period must be one of {sorted(_PERIOD_SECONDS)} (fixed-length "
            f"units only — month/quarter/year offsets would be wrong), "
            f"got {period!r}"
        )
    per = F.date_trunc(period, F.col(ts_col))
    firsts = events.groupBy(user_col).agg(
        F.min(per).alias("__cohort")
    )
    activity = events.select(F.col(user_col), per.alias("__p")).distinct()
    offs = (
        activity.join(firsts, user_col)
        .select(
            F.col("__cohort").alias("cohort"),
            F.floor(
                (F.col("__p").cast("long") - F.col("__cohort").cast("long"))
                / F.lit(_PERIOD_SECONDS[period])
            ).cast("int").alias("period_offset"),
            F.col(user_col),
        )
        .filter(F.col("period_offset") < max_periods)
    )
    return offs.groupBy("cohort", "period_offset").agg(
        F.countDistinct(user_col).cast("long").alias("n_users")
    )


#: seconds per date_trunc unit for offset arithmetic (week = 7 days;
#: month/quarter/year are NOT fixed-length — use day/week units for
#: offset-based retention, or post-process cohort labels yourself)
_PERIOD_SECONDS = {
    "day": 86_400,
    "week": 7 * 86_400,
    "hour": 3_600,
}


def sessionize_labels(
    events: DataFrame,
    gap_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Assign a per-user SESSION ID to every event: a new session starts
    when the gap since the user's previous event exceeds
    ``gap_seconds``. Output: the input columns + ``session_id`` (0-based
    per user, ordered by time).

    The label layer under :mod:`kafi_spark.streams.windows`' session
    aggregation — use this when downstream needs the raw events tagged
    (session-level joins, funnel-within-session) rather than one
    aggregated row per session. One window shuffle keyed on the user:
    lag + cumulative sum of gap-break flags, both over the same ordered
    spec so Catalyst plans a single Window operator.
    """
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    # (named *_labels, gap in SECONDS — deliberately distinct from
    # streams.windows.sessionize, which aggregates and takes
    # MILLISECONDS; a same-named twin with different units was a
    # reviewer-flagged 1000x trap)
    w = W.partitionBy(user_col).orderBy(F.col(ts_col))
    prev = F.lag(F.col(ts_col)).over(w)
    # unix_micros, not cast("long"): the cast truncates to whole seconds,
    # so a 1.95 s gap measured as 1 never broke a 1 s-gap session
    is_break = (
        prev.isNotNull()
        & (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)
           > gap_seconds * 1_000_000)
    ).cast("long")
    return events.withColumn(
        "session_id",
        F.sum(is_break).over(w.rowsBetween(W.unboundedPreceding, 0)),
    )


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    keys: list[str] | None = None,
    threshold: float = 3.0,
    ddof: int = 0,
) -> DataFrame:
    """Per-group z-scores and an outlier flag for a numeric column:
    input columns + ``zscore`` (null when the group's std is 0 or the
    value is null) + ``is_outlier`` (|z| > threshold; false where z is
    null). ``keys=None`` scores against the GLOBAL distribution.

    Plan: one aggregate for group moments (map-side partials) joined
    back — the group-stats frame has one row per key combination, so
    it broadcasts under AQE for low-cardinality keys and hash-joins
    otherwise; population std by default (``ddof=0``, matching SQL's
    ``stddev_pop``).
    """
    if threshold <= 0:
        raise ValueError(f"threshold must be positive, got {threshold}")
    if ddof not in (0, 1):
        raise ValueError(f"ddof must be 0 (population) or 1 (sample), got {ddof}")
    std_fn = F.stddev_pop if ddof == 0 else F.stddev_samp
    v = F.col(value_col)
    if keys:
        stats = df.groupBy(*keys).agg(
            F.avg(v).alias("__mu"), std_fn(v).alias("__sd")
        )
        # null-SAFE key equality: groupBy emits a NULL-key stats row,
        # but a plain equi-join would never match it — silently DROPPING
        # every null-key input row from a row-preserving operator
        cond = None
        for k in keys:
            c = df[k].eqNullSafe(stats[k])
            cond = c if cond is None else (cond & c)
        joined = df.join(stats, cond).drop(*[stats[k] for k in keys])
    else:
        stats = df.agg(F.avg(v).alias("__mu"), std_fn(v).alias("__sd"))
        joined = df.crossJoin(F.broadcast(stats))
    z = F.when(
        v.isNotNull() & F.col("__sd").isNotNull() & (F.col("__sd") > 0),
        (v - F.col("__mu")) / F.col("__sd"),
    )
    return joined.withColumn("zscore", z).withColumn(
        "is_outlier", F.coalesce(F.abs(F.col("zscore")) > threshold, F.lit(False))
    ).drop("__mu", "__sd")
