"""Mergeable cardinality sketches — incremental distinct counts at scale.

``approx_count_distinct`` answers "how many distinct X" for ONE query
over ONE scan. At 100 TB the question recurs over shifting slices
("distinct users per day / per week / this quarter"), and rescanning a
quarter of raw events for every roll-up is the scale killer. The
standard fix is to persist MERGEABLE sketches at the finest grain
(day × dimension) and answer every coarser slice by unioning sketches —
bytes-sized reads instead of re-scans, and the union is exactly
associative (an HLL union is lossless over HLLs of the same precision;
the error bound of the merged sketch equals that of a sketch built
directly over the union of the inputs).

Built entirely on Spark's public Apache DataSketches bindings
(`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`, JVM-side
aggregates with map-side partial combine — no UDFs, no driver state).
The sketch column is a plain ``binary`` — it survives parquet
round-trips, so a daily pipeline appends one small row-set per day and
any later query merges an arbitrary subset.

Reference scope note: the reference engine has no sketch layer; this is
part of the beyond-reference LLM-pipeline / analytics extension
(SURVEY.md §2 extension).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

# Spark's hll_sketch_agg supports lgConfigK in [4, 21]; 12 ≈ 1.6% RSE
# at 16 KiB max sketch size — the DataSketches default.
_DEFAULT_LGK = 12


def distinct_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str] = (),
    lgk: int = _DEFAULT_LGK,
    sketch_col: str = "sketch",
) -> DataFrame:
    """One HLL sketch of distinct ``key_col`` per ``group_cols`` group.

    The finest-grain build step: run once per ingest batch/day and
    persist the result (sketch is a ``binary`` column). One hash
    aggregation — partial sketches combine map-side, so the shuffle
    carries one ≤ 2^lgk-byte sketch per (partition, group), never keys.
    """
    if not 4 <= lgk <= 21:
        raise ValueError(f"lgk must be in [4, 21], got {lgk}")
    agg = F.hll_sketch_agg(F.col(key_col), lgk).alias(sketch_col)
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def merge_sketches(
    df: DataFrame,
    group_cols: Sequence[str] = (),
    sketch_col: str = "sketch",
    allow_different_lgk: bool = False,
) -> DataFrame:
    """Union persisted sketches up to a coarser grain.

    ``group_cols`` is the (possibly empty) subset of grouping columns to
    keep; everything else is merged away. Union is associative and
    idempotent, so daily → monthly → yearly roll-ups can themselves be
    persisted and re-merged. ``allow_different_lgk=True`` lets sketches
    of mixed precision merge (result degrades to the coarsest input).
    """
    agg = F.hll_union_agg(
        F.col(sketch_col), allow_different_lgk
    ).alias(sketch_col)
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def estimate(sketch_col: str = "sketch", name: str = "distinct_est"):
    """Column expression: estimated cardinality of an HLL sketch."""
    return F.hll_sketch_estimate(F.col(sketch_col)).alias(name)


def distinct_over_time(
    df: DataFrame,
    key_col: str,
    time_col: str,
    grain: str = "day",
    dims: Sequence[str] = (),
    lgk: int = _DEFAULT_LGK,
) -> DataFrame:
    """Convenience composition: per-``grain`` (+dims) distinct sketches.

    Returns ``(bucket, *dims, sketch, distinct_est)`` where ``bucket``
    is ``date_trunc(grain, time_col)``. Persist this frame; answer any
    date-range/dim slice later with :func:`merge_sketches` +
    :func:`estimate` over the selected rows.
    """
    bucketed = df.withColumn(
        "bucket", F.date_trunc(grain, F.col(time_col))
    )
    out = distinct_sketch(bucketed, key_col, ["bucket", *dims], lgk)
    return out.select("bucket", *dims, "sketch", estimate())


def sketch_save_delta(
    sketches: DataFrame, state_dir: str, version: int | str
) -> None:
    """Persist one batch's grouped sketches under ``state_dir/v=<version>``.

    Versioned deltas make saves idempotent per version (a retried
    streaming epoch overwrites its own directory), and because HLL
    union is register-wise max — an idempotent commutative monoid, the
    same algebra as :func:`bloom.bloom_save_delta`'s bit_or — merging a
    delta twice or in any order never changes the merged state."""
    sketches.write.mode("overwrite").parquet(
        f"{state_dir.rstrip('/')}/v={version}"
    )


def sketch_totals(
    spark,
    state_dir: str,
    group_cols: Sequence[str] = (),
    sketch_col: str = "sketch",
) -> DataFrame:
    """Merged estimates over every persisted delta: one row per
    ``group_cols`` group with ``(sketch, distinct_est)``. This is the
    read path of the persisted-sketch pattern — answering a roll-up
    means scanning only the delta rows (bytes per group per epoch),
    never the raw data."""
    df = spark.read.parquet(state_dir)
    merged = merge_sketches(df, group_cols, sketch_col)
    return merged.withColumn(
        "distinct_est", F.hll_sketch_estimate(F.col(sketch_col))
    )


def sketch_compact(
    spark,
    state_dir: str,
    version: int | str,
    group_cols: Sequence[str] = (),
    sketch_col: str = "sketch",
) -> None:
    """Fold all deltas into a single delta at ``v=compact-<version>``.

    The ``compact-`` prefix keeps compaction keys in a namespace
    DISJOINT from stream epoch ids — without it, a later epoch whose id
    equals ``version`` would idempotently OVERWRITE the compacted delta
    (which holds the entire folded history) with one batch's sketches,
    silently shrinking every total. Pick ``version`` monotonically
    across compactions (e.g. the epoch id at compaction time). Union
    idempotence makes readers merging the compacted delta with stale
    leftovers still correct, so compaction needs no coordination;
    delete old ``v=`` dirs at leisure."""
    merged = merge_sketches(
        spark.read.parquet(state_dir), group_cols, sketch_col
    ).localCheckpoint()
    sketch_save_delta(merged, state_dir, f"compact-{version}")
