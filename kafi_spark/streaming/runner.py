"""Structured Streaming execution for topologies.

Replaces the reference's asyncio consumer/producer loop + pickle/zstd
checkpointing (kafi/streams/streams.py:58-293) with Spark's micro-batch
engine: ``readStream`` sources, the topology's DataFrame plan, and one
streaming query per sink — checkpointLocation gives offset-consistent
restart (strictly stronger than the reference's checkpoint-then-commit
ordering, streams.py:257-271).

Two sink styles:

* ``path`` sinks — append files in ``path_format`` (parquet default;
  csv/json supported) — Spark file sinks are append-only;
* ``foreachBatch`` sinks — per-micro-batch callback receiving the
  *consolidated Z-set* of that batch; retraction-aware downstreams
  (Debezium-out via kafi_spark.streams.cdc.to_debezium) plug in here.

Streaming supports the stateless + native-stateful subset (map/filter/
flatmap/merge, windowed and keyed aggregates in update mode, stream-stream
equi-joins with watermarks). Full retraction algebra (set difference,
distinct-with-deletes) runs through IncrementalRunner inside foreachBatch.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from kafi_spark.streams.zset import consolidate
from kafi_spark.streaming.topology import Topology


def _warn_unbounded_agg_state(plan: DataFrame, sink: str) -> None:
    """Streaming aggregates WITHOUT a watermark keep one state-store
    entry per group forever — for windowed groupings (a new w_start per
    interval) that is guaranteed unbounded growth until executor OOM.
    Joins get a hard guard at build time
    (topology._require_bounded_join_state); aggregates stay legal in
    update mode, so this is a loud advisory instead: use the native
    watermarked assigners (streams.windows.streaming_tumbling /
    streaming_session — withWatermark + F.window/session_window) for
    long-running queries (review r7)."""
    try:
        if not plan.isStreaming:
            return
        analyzed = plan._jdf.queryExecution().analyzed().toString()
    except Exception:  # noqa: BLE001 — advisory only
        return
    if "Aggregate" in analyzed and "EventTimeWatermark" not in analyzed:
        import warnings

        warnings.warn(
            f"streaming sink {sink!r} aggregates without a watermark: "
            "state grows one entry per group forever (windowed keys "
            "grow per interval). Add withWatermark via "
            "streams.windows.streaming_tumbling/streaming_session for "
            "long-running queries; availableNow/test runs are fine.",
            UserWarning,
            stacklevel=3,
        )


def run_streaming(
    topology: Topology,
    sources: dict[str, DataFrame],
    sinks: dict[str, str | Callable[[DataFrame, int], None]],
    checkpoint_root: str,
    output_mode: str = "update",
    trigger_available_now: bool = False,
    query_name_prefix: str = "kafi",
    path_format: str = "parquet",
):
    """Start one streaming query per sink; returns {sink: StreamingQuery}.

    ``sources`` are streaming DataFrames (readStream). ``sinks`` map sink
    name → output path (str) or foreachBatch callable. ``availableNow``
    processes everything pending then stops — the batch-parity trigger.
    ``output_mode`` applies to foreachBatch sinks; path sinks write
    ``path_format`` files (parquet/csv/json) in append mode — the only
    mode Spark's file sinks accept.
    """
    queries = {}
    for name, node in topology.sinks.items():
        plan = node._plan(sources)
        _warn_unbounded_agg_state(plan, name)
        target = sinks[name]
        if callable(target):
            fn = target

            def write(batch_df: DataFrame, epoch: int, _fn=fn):
                _fn(consolidate(batch_df), epoch)

            w = plan.writeStream.foreachBatch(write).outputMode(output_mode)
        else:
            # file sinks: Spark's file sources support ONLY append mode
            # (update/complete raise at start), so output_mode is
            # deliberately not applied here; the format comes from
            # path_format (default parquet)
            w = (
                plan.writeStream.format(path_format)
                .option("path", target)
                .outputMode("append")
            )
        w = (
            w.option("checkpointLocation", f"{checkpoint_root}/{name}")
            .queryName(f"{query_name_prefix}_{name}")
        )
        if trigger_available_now:
            w = w.trigger(availableNow=True)
        queries[name] = w.start()
    return queries


def await_all(queries: dict, timeout_s: float | None = None) -> None:
    """Block until every query terminates. ``timeout_s`` is an OVERALL
    deadline shared by all queries (not per query), and ``0`` means
    "poll without blocking" — a falsy-zero check here once turned it
    into "wait forever"."""
    if timeout_s is None:
        for q in queries.values():
            q.awaitTermination()
        return
    import time as _time

    deadline = _time.monotonic() + timeout_s
    for q in queries.values():
        remaining = deadline - _time.monotonic()
        if remaining >= 1e-3:
            # awaitTermination rejects non-positive timeouts, and py4j
            # floors the value to whole milliseconds (int(t * 1000)), so a
            # remaining deadline in (0, 1ms) would reach the JVM as 0 and
            # throw — skip the wait for anything under one millisecond
            # (expired deadline, timeout_s=0, or sub-ms residue alike)
            q.awaitTermination(remaining)
