"""Incremental step runner: push source deltas, receive sink deltas.

The reference's execution model (pydbsp circuit, kafi/streams/streams.py:
229-280: push batch → step evaluator → drain latest per sink) maintains
per-operator delta state and re-emits only changes — insert/retract pairs
for aggregates (topologynode.py:469-478 Integrate∘Differentiate).

The Spark rendering uses the *view-diff* identity instead of per-operator
circuits: with S_t the integrated (cumulative) source Z-sets,

    Δout_t = Q(S_t) − Q(S_{t−1})

which is exactly the reference's observable contract for every operator
class (stateless, set ops, joins, aggregates, windows) — retraction-
correct by construction. Per-operator bilinear expansion (ΔL⋈R + L⋈ΔR +
ΔL⋈ΔR) is an optimization of the same algebra; on Spark the recompute is
vectorized + AQE-planned, and both sides of the diff are cached, so each
step costs one incremental-sized scan of cached state, not a cold rebuild.

At production scale the native path is Structured Streaming
(:mod:`kafi_spark.streaming.runner` — Spark's stateful operators maintain
exactly this state); this runner exists for full retraction parity
(Debezium-out, set-difference emission) and for differential testing.

State is bounded: cumulative sources and previous sink outputs are
``localCheckpoint``-ed each step (lineage truncation), and ``expire``
hooks evict records the queries can no longer affect — evictions propagate
as retractions through the diff automatically, matching the reference's
``expire`` operator (topologynode.py:573-648).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafi_spark.streams.zset import WEIGHT, consolidate, from_records, neg
from kafi_spark.streaming.topology import Topology


class _SourceEnv(dict):
    """Plan environment whose misses explain themselves: a sink referenced a
    source that has no delta yet and declared no schema."""

    def __missing__(self, name):
        raise ValueError(
            f"source {name!r} has received no delta and declares no schema; "
            f"pass Topology.source({name!r}, schema=...) to allow evaluation "
            "before its first delta"
        )


class IncrementalRunner:
    """Drive a :class:`Topology` in steps (reference run loop,
    kafi/streams/streams.py:229-280).

    ``expire``: optional per-source state eviction, ``{source_name:
    fn(cumulative_df) -> cumulative_df}`` applied after integration each
    step — the scalable equivalent of the reference's expiry feedback
    operator (retractions for evicted contributions are emitted by the
    diff)."""

    def __init__(
        self,
        topology: Topology,
        spark: SparkSession,
        expire: dict[str, Callable[[DataFrame], DataFrame]] | None = None,
    ):
        self.topology = topology
        self.spark = spark
        self.expire = expire or {}
        self._state: dict[str, DataFrame] = {}
        self._prev_out: dict[str, DataFrame] = {}
        self.steps = 0

    # -- state introspection (test/streams/test_base.py:132-139 asserts
    #    bounded state under expiry) --------------------------------------

    def state_rows(self) -> dict[str, int]:
        return {name: df.count() for name, df in self._state.items()}

    def integrated(self, source: str) -> DataFrame:
        return self._state[source]

    def step(self, deltas: dict[str, DataFrame]) -> dict[str, DataFrame]:
        """Push one batch of deltas (records or weighted Z-sets), get the
        consolidated output delta per sink."""
        unknown = set(deltas) - set(self.topology.source_names)
        if unknown:
            raise ValueError(
                f"step() got deltas for undeclared sources {sorted(unknown)} "
                f"(declared: {self.topology.source_names}) — a typo here "
                "used to be silently dropped")
        # integrate: S_t = S_{t-1} + Δ  (then expire)
        for name in self.topology.source_names:
            d = deltas.get(name)
            if d is None:
                continue
            z = from_records(d)
            cur = self._state.get(name)
            merged = z if cur is None else cur.unionByName(z)
            merged = consolidate(merged)
            if name in self.expire:
                merged = self.expire[name](merged)
            # truncate lineage so step cost doesn't grow with step count
            self._state[name] = merged.localCheckpoint(eager=True)

        # Seed delta-less sources as empty Z-sets so sinks referencing them
        # evaluate instead of KeyError-ing. Needs the declared schema; a
        # schema-less delta-less source only errors if actually referenced.
        env = _SourceEnv(self._state)
        for name in self.topology.source_names:
            schema = self.topology.source_schemas.get(name)
            if name not in env and schema is not None:
                env[name] = self.spark.createDataFrame([], f"{schema}, {WEIGHT} long")
        out: dict[str, DataFrame] = {}
        for sink, node in self.topology.sinks.items():
            cur = consolidate(node._plan(env)).localCheckpoint(eager=True)
            prev = self._prev_out.get(sink)
            delta = cur if prev is None else consolidate(cur.unionByName(neg(prev)))
            self._prev_out[sink] = cur
            out[sink] = delta
        self.steps += 1
        return out

    def latest(self, sink: str) -> DataFrame:
        """Current integrated value of a sink (reference ``latest()``,
        topologynode.py:1110-1129)."""
        return self._prev_out[sink]
