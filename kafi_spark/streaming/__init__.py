"""Streams: the incremental topology engine.

The reference's second product is a fluent topology DSL compiled onto a
pydbsp Z-set circuit with a hand-rolled asyncio runtime
(kafi/streams/streams.py, kafi/streams/topologynode.py; SURVEY §3.3). The
Spark-first rendering keeps the DSL and swaps the engine:

* :mod:`kafi_spark.streaming.topology` — the fluent DAG builder; every
  node compiles to a declarative DataFrame plan over weight-column Z-sets,
  so one topology runs in batch, per-micro-batch, or incrementally.
* :mod:`kafi_spark.streaming.incremental` — a step runner with the
  reference's delta semantics (push deltas, get output deltas), rendered
  as bilinear join expansion + group re-aggregation instead of a circuit.
* :mod:`kafi_spark.streaming.runner` — Structured Streaming execution:
  readStream sources, watermarked windows, foreachBatch multi-sink fan-out,
  checkpointLocation (replaces the reference's pickle/zstd checkpoint
  machinery, kafi/streams/streams.py:133-166).
"""

from kafi_spark.streaming.topology import Topology

__all__ = ["Topology"]
