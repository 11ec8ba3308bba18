"""Add-on batch operators (reference: ``kafi/addons.py``).

Compaction, diff, size stats, value sets, offset/time slicing — each a
single declarative DataFrame plan. All of these run on arbitrary-size
tables: compaction is one shuffle on the key, diff is one join, the stats
are single-pass aggregates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def compact(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str | Column],
    tombstone_col: str | None = None,
) -> DataFrame:
    """Kafka log-compaction semantics: last write wins per key, tombstone
    (null value) deletes the key (kafi/addons.py:19-41).

    One window shuffle on ``key_cols``: ``row_number() == 1`` over the
    descending ``order_cols``, then drop tombstones. At scale this is the
    same shuffle a groupBy on the key would need — minimal. Skewed keys are
    handled by AQE skew-join/partition splitting.
    """
    w = W.partitionBy(*key_cols).orderBy(*[F.col(c).desc() if isinstance(c, str) else c for c in order_cols])
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    if tombstone_col is not None:
        out = out.filter(F.col(tombstone_col).isNotNull())
    return out


def diff(
    df1: DataFrame,
    df2: DataFrame,
    on: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Pairwise diff of two topics joined on position (partition, offset in
    the reference's intent). Declared in the reference's tests but never
    implemented (test/test_cross_storage.py:634, see SURVEY §2.4) — this is
    the missing definition: full outer join on ``on``, keep rows where any
    compared column differs or the row exists on one side only.

    Output: join keys + ``<col>_1`` / ``<col>_2`` pairs + ``diff_kind`` in
    {'left_only','right_only','changed'}.
    """
    compare_cols = compare_cols or [c for c in df1.columns if c not in on and c in df2.columns]
    l = df1.select(*on, *[F.col(c).alias(f"{c}_1") for c in compare_cols], F.lit(1).alias("__l"))
    r = df2.select(*on, *[F.col(c).alias(f"{c}_2") for c in compare_cols], F.lit(1).alias("__r"))
    j = l.join(r, on=list(on), how="full_outer")
    # no shared non-key columns (key-only frames, or disjoint schemas):
    # nothing can be 'changed' — only presence differs. Without the
    # literal seed the filter below would OR a None into a Column and
    # crash (round-8 session review).
    changed = F.lit(False)
    for c in compare_cols:
        ne = ~(F.col(f"{c}_1").eqNullSafe(F.col(f"{c}_2")))
        changed = changed | ne
    kind = (
        F.when(F.col("__r").isNull(), F.lit("left_only"))
        .when(F.col("__l").isNull(), F.lit("right_only"))
        .otherwise(F.lit("changed"))
    )
    return (
        j.withColumn("diff_kind", kind)
        .filter(F.col("__l").isNull() | F.col("__r").isNull() | changed)
        .drop("__l", "__r")
    )


def message_size_stats(
    df: DataFrame,
    size_col: Column,
    loc_cols: Sequence[str],
) -> DataFrame:
    """total/avg/max/min byte size with argmax/argmin location
    (kafi/addons.py:158-207 tracks (partition, offset) of the extremes).

    Single aggregate pass using ``max_by``/``min_by`` structs — the
    reference does a second full scan to find the argmax.
    """
    loc = F.col(loc_cols[0]) if len(loc_cols) == 1 else F.struct(*[F.col(c) for c in loc_cols])
    sized = df.select(size_col.alias("__sz"), loc.alias("__loc"))
    return sized.agg(
        F.sum("__sz").cast("long").alias("total_bytes"),
        (F.sum("__sz").cast("double") / F.count(F.lit(1))).alias("avg_bytes"),
        F.max("__sz").cast("long").alias("max_bytes"),
        F.min("__sz").cast("long").alias("min_bytes"),
        F.max_by("__loc", F.struct(F.col("__sz"), F.col("__loc"))).alias("argmax_loc"),
        F.min_by("__loc", F.struct(F.col("__sz"), F.col("__loc"))).alias("argmin_loc"),
    )


def collect_value_set(df: DataFrame, *cols: str | Column) -> DataFrame:
    """Distinct value combinations (kafi/addons.py:210-219 JSON-serializes
    each value into a set). A shuffle-dedup — partial aggregation map-side
    keeps shuffle volume at #distinct, not #rows."""
    return df.select(*cols).distinct()


def offsets_diff(
    df: DataFrame,
    ts_col: str,
    ts_start,
    ts_end,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """#messages between two timestamps, per group (kafi/addons.py:133-154
    resolves both timestamps to offsets via offsets_for_times and subtracts;
    on a columnar table that's just a time-range count — and the range
    predicate prunes parquet row groups via min/max stats)."""
    filtered = df.filter((F.col(ts_col) >= ts_start) & (F.col(ts_col) < ts_end))
    if group_cols:
        return filtered.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_messages"))
    return filtered.agg(F.count(F.lit(1)).alias("n_messages"))
