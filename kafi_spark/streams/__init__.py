"""Streams — the incremental layer, Spark-first.

The reference builds on pydbsp Z-set circuits (kafi/streams/topologynode.py);
here the same semantics are expressed as (a) a weight-column algebra over
DataFrames (:mod:`kafi_spark.streams.zset`) usable in batch and inside
``foreachBatch``, (b) event-time window assigners that compile to native
``window()``/``session_window()`` or explicit assignment columns
(:mod:`kafi_spark.streams.windows`), (c) Debezium CDC codecs
(:mod:`kafi_spark.streams.cdc`), and (d) a topology builder that compiles a
kafi-style fluent DAG to DataFrame/Structured Streaming plans
(:mod:`kafi_spark.streams.topology`).
"""

from kafi_spark.streams.zset import (
    WEIGHT,
    consolidate,
    from_records,
    neg,
    to_records,
    zset_distinct,
    zset_except,
    zset_intersect,
    zset_minus,
    zset_union,
)
