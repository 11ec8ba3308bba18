"""Bucketed tables — co-located storage for shuffle-free joins.

The 100 TB join story: two fact tables joined repeatedly on the same key
should be written bucketed on that key, so every join between them reads
co-partitioned buckets and Catalyst plans a SortMergeJoin with ZERO
Exchange — the shuffle is paid once at write time, then amortized over
every subsequent join/aggregate on the bucket key.

Spark's bucketing lives in the session catalog (``bucketBy`` +
``saveAsTable``), not plain ``parquet(path)`` — bucket metadata has to
survive in the catalog for the reader to trust it. These helpers wrap
that contract; ``assert_no_shuffle_join`` is the test hook proving the
property (used in tests, usable in perf harnesses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) catalog table.

    ``sort_cols`` defaulting to the bucket columns lets SortMergeJoin
    skip its sort as well (bucket files are pre-sorted). ``path`` makes
    it an external table."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table through the catalog (bucket metadata only
    applies via ``spark.table`` — a raw path read loses it)."""
    return spark.table(table)


def assert_no_shuffle_join(joined: DataFrame) -> None:
    """Raise if the join plan contains an Exchange — the property
    bucketed co-location is supposed to buy. Broadcast joins are also
    rejected (they hide the question being asked)."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # broadcast first: "BroadcastExchange" contains "Exchange", so the
    # shuffle branch used to shadow this one with a misleading message
    # (review r7)
    if "BroadcastHashJoin" in plan or "BroadcastExchange" in plan:
        raise AssertionError("join was broadcast — bucketing not exercised")
    if "Exchange" in plan:
        raise AssertionError(
            "join plans a shuffle despite bucketing:\n" + plan[:2000]
        )
