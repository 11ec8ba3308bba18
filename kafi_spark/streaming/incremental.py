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
        # ATOMIC step (review r7): every mutation lands in LOCAL dicts and
        # commits only after all sinks evaluated — a failure anywhere
        # (unseeded source, bad plan) leaves self._state/_prev_out exactly
        # as before, so the caller can retry the same deltas without
        # double-integrating them (weight-2 corruption) or losing a
        # sink's baseline.
        new_state = dict(self._state)
        # integrate: S_t = S_{t-1} + Δ  (then expire)
        for name in self.topology.source_names:
            d = deltas.get(name)
            if d is None:
                continue
            z = from_records(d)
            cur = new_state.get(name)
            merged = z if cur is None else cur.unionByName(z)
            # anchor BEFORE the expire hook: the hook's max-agg and
            # filter both consume the frame, and the old shape
            # checkpointed twice per expired source per step (once
            # inside window_expiry, once here)
            merged = consolidate(merged).localCheckpoint(eager=True)
            if name in self.expire:
                # expiry is a depth-1 filter over the checkpoint — next
                # step's consolidate+checkpoint collapses it, so lineage
                # stays bounded
                merged = self.expire[name](merged)
            new_state[name] = merged

        # Seed delta-less sources as empty Z-sets so sinks referencing them
        # evaluate instead of KeyError-ing. Needs the declared schema; a
        # schema-less delta-less source only errors if actually referenced.
        env = _SourceEnv(new_state)
        for name in self.topology.source_names:
            schema = self.topology.source_schemas.get(name)
            if name not in env and schema is not None:
                env[name] = self.spark.createDataFrame([], f"{schema}, {WEIGHT} long")
        out: dict[str, DataFrame] = {}
        new_prev = dict(self._prev_out)
        for sink, node in self.topology.sinks.items():
            # eager checkpoint = the evaluation point: plan errors raise
            # HERE, before anything is committed
            cur = consolidate(node._plan(env)).localCheckpoint(eager=True)
            prev = new_prev.get(sink)
            delta = cur if prev is None else consolidate(cur.unionByName(neg(prev)))
            new_prev[sink] = cur
            out[sink] = delta
        self._state = new_state
        self._prev_out = new_prev
        self.steps += 1
        return out

    def latest(self, sink: str) -> DataFrame:
        """Current integrated value of a sink (reference ``latest()``,
        topologynode.py:1110-1129)."""
        return self._prev_out[sink]
