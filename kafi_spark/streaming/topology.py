"""Fluent topology builder (reference: kafi/streams/topologynode.py).

A ``Topology`` holds named sources and sinks; ``TNode`` is the fluent
vertex. Where the reference's ``_build_fun`` wires pydbsp circuit nodes at
build time (topologynode.py:37-57, 1035-1051), here each node's build
function composes a *DataFrame plan* from its parents' plans — the DAG is
the IR, Catalyst is the optimizer, and the same topology runs:

* ``build_batch(sources)`` — one-shot over batch DataFrames (weights
  consolidate at the sinks);
* through :class:`kafi_spark.streaming.incremental.IncrementalRunner` —
  the reference's push/step/latest delta loop;
* through :mod:`kafi_spark.streaming.runner` — Structured Streaming for
  the natively-supported subset.

All data flows as Z-sets: DataFrames with a ``weight BIGINT`` column
(SURVEY §1.4). Stateless ops thread the weight; joins multiply it
(bilinearity); aggregates weight their inputs.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from kafi_spark.streams.zset import (
    WEIGHT,
    consolidate,
    from_records,
    zset_distinct,
    zset_intersect,
    zset_minus,
    zset_union,
)


def _require_bounded_join_state(l: DataFrame, r: DataFrame, kind: str) -> None:
    """Shared stream-stream join state guard: without event-time
    watermarks on BOTH sides (plus, for full eviction, a time-range
    conjunct in the predicate) Spark keeps every joined row in the state
    store forever — for THETA joins because every stored row stays a
    match candidate, and for EQUI joins just the same, because indexing
    the state by key changes lookup cost, not retention (inner equi
    joins run without watermarks but never evict). Fail at build time,
    not at executor OOM."""
    if not (l.isStreaming and r.isStreaming):
        return
    marks = {side: _has_watermark(d)
             for side, d in (("left", l), ("right", r))}
    unverifiable = [side for side, m in marks.items() if m is None]
    if unverifiable:
        # plan introspection unavailable (Spark Connect): warn loudly
        # rather than fail open OR block builds that may well be
        # correctly watermarked
        import warnings

        warnings.warn(
            "cannot verify event-time watermarks on the "
            f"{' and '.join(unverifiable)} side(s) of a streaming "
            f"{kind} join (plan introspection unavailable); without "
            "withWatermark() on both sources plus a time-range "
            "conjunct, join state grows unboundedly",
            stacklevel=4,
        )
    missing = [side for side, m in marks.items() if m is False]
    if missing:
        raise ValueError(
            f"streaming {kind} join with unbounded state: the "
            f"{' and '.join(missing)} side(s) have no event-time "
            "watermark, so joined state is never evicted and grows "
            "with the stream. Apply withWatermark() to both source "
            "streams and include a time-range constraint between the "
            "watermarked columns in the join predicate."
        )


def _has_watermark(df: DataFrame) -> bool | None:
    """True/False iff the frame's analyzed plan does/doesn't carry an
    event-time watermark (``withWatermark`` somewhere upstream); None
    when the plan can't be introspected (Spark Connect has no _jdf) —
    the caller must treat None as "unverifiable", not as "safe",
    otherwise the unbounded-state guard silently fails open exactly
    where it can't look."""
    try:
        return "EventTimeWatermark" in df._jdf.queryExecution().analyzed().toString()
    except Exception:  # noqa: BLE001 — connect-mode / plan access failure
        return None


def _weighted_group_agg(df: DataFrame, group_cols, aggs) -> "DataFrame":
    """THE weighted-aggregate epilogue, shared by every grouped op
    (group_by_agg / agg / window_*): aggregate with the net group
    weight riding along, keep only net-PRESENT groups (a fully
    retracted input must yield the empty Z-set, not a phantom zeroed
    row), re-weight survivors to 1. One definition so the
    group-presence rule can never drift between the five call sites
    (review r7)."""
    return (
        df.groupBy(*group_cols)
        .agg(*aggs, F.sum(WEIGHT).alias("__net"))
        .filter(F.col("__net") > 0)
        .drop("__net")
        .withColumn(WEIGHT, F.lit(1).cast("long"))
    )


class Topology:
    """Builder container: tracks sources and sinks by name
    (kafi/streams/streams.py:33-51)."""

    def __init__(self):
        self.source_names: list[str] = []
        self.source_schemas: dict[str, str | None] = {}
        self.sinks: dict[str, TNode] = {}
        self._id_counter = 0

    def _next_id(self) -> str:
        # deterministic sequential ids (the reference uses uuid4,
        # topologynode.py:40 — sequential ids render reproducibly, which
        # uuids can't, and carry the same disambiguation information)
        self._id_counter += 1
        return f"n{self._id_counter}"

    def source(self, name: str, schema: str | None = None) -> "TNode":
        """Declare a named source (streams.py:33-42, topologynode.py:977-989).

        ``schema`` (DDL string, e.g. ``"word string, n long"``) is optional;
        when given, step runners can evaluate sinks before this source has
        received any delta by treating it as an empty Z-set."""
        if name not in self.source_names:
            # a re-declared name (one source referenced from two pipeline
            # branches) must NOT register twice: step() iterates this
            # list, and a duplicate made it integrate the same delta into
            # state twice — every record silently carried weight 2
            self.source_names.append(name)
        prev = self.source_schemas.get(name)
        if schema is not None and prev is not None and prev != schema:
            # a DIVERGENT redeclaration is a build-time typo, not a
            # branch reuse: last-wins silently replaced the schema and
            # the runner's delta-less seeding then built an empty frame
            # missing columns (round-9 review; the r7 guard below only
            # protects against None-erasure)
            raise ValueError(
                f"source {name!r} redeclared with a different schema: "
                f"{prev!r} vs {schema!r}")
        if schema is not None or name not in self.source_schemas:
            # a schema-less re-declaration must not ERASE a previously
            # declared schema (review r7: branch 2's bare source('ev')
            # made delta-less seeding impossible again)
            self.source_schemas[name] = schema
        return TNode(self, lambda env: from_records(env[name]),
                     name=f"source_{name}")

    def build_batch(self, sources: dict[str, DataFrame]) -> dict[str, DataFrame]:
        """Evaluate every sink over batch inputs (one shared plan cache
        across sinks — see TNode._plan; the copy keeps the caller's dict
        unmutated); outputs are consolidated
        Z-sets (record columns + weight)."""
        env = dict(sources)
        return {name: consolidate(node._plan(env))
                for name, node in self.sinks.items()}

    def topology(self, include_ids: bool = False) -> str:
        """Render every sink as a recursive term, one line per sink —
        the reference's notebook-facing display (topologynode.py:
        1252-1287): leaf = name, unary = ``name(child)``, binary =
        ``name(left, right)``, an already-rendered node = ``REF:name``.
        The visited set is SHARED across sinks so a sub-DAG feeding two
        sinks renders once and REFs after — the reference gets the same
        effect by merging multi-sink roots (topologynode.py:998-1024)."""
        visited: set[int] = set()
        return "\n".join(
            f"sink_{name}({node._term(include_ids, visited)})"
            for name, node in self.sinks.items()
        )

    def mermaid(self, include_ids: bool = False) -> str:
        """Render the whole DAG as a fenced ``graph TD`` mermaid block
        (topologynode.py:1289-1315): one ``child[label] --> parent[label]``
        edge per data-flow edge, deduped, plus a ``node --> sink_<name>``
        edge per registered sink. Edges are sorted (the reference emits
        set order — nondeterministic; sorting renders reproducibly)."""
        edges: set[str] = set()
        visited: set[int] = set()
        for name, node in self.sinks.items():
            edges.add(
                f"{node.node_id}[{node._label(include_ids)}] --> "
                f"sink_{name}[sink_{name}]\n"
            )
            node._edges(include_ids, edges, visited)
        return "```mermaid\ngraph TD\n" + "".join(sorted(edges)) + "```"


class TNode:
    """Fluent vertex. ``_build`` maps {source_name: zset DataFrame} to this
    node's zset DataFrame; parents recorded for DAG walks
    (topologynode.py:37-57 _daughter_tn_set)."""

    def __init__(self, topology: Topology, build: Callable[[dict], DataFrame],
                 parents: Sequence["TNode"] = (), name: str = "node"):
        self._topology = topology
        self._build = build
        self.parents = list(parents)
        self.name = name
        self.node_id = topology._next_id()

    def _plan(self, env: dict[str, DataFrame]) -> DataFrame:
        """Memoized per environment: a shared sub-DAG (one node feeding
        several consumers or sinks — the REF case the mermaid renderer
        draws) builds its DataFrame ONCE per step instead of once per
        consumer. The closure-chain rebuild re-planned the whole
        upstream chain per sink (k nested diamonds → O(2^k) plan nodes)
        and re-executed expensive shared aggregates once per consumer
        unless exchange reuse happened to fire (round-9 review). The
        cache lives IN the env dict, so its lifetime is exactly one
        build — step()/build_batch construct a fresh env per call."""
        cache = env.get("__plan_cache__")
        if cache is None:
            cache = {}
            env["__plan_cache__"] = cache
        got = cache.get(self.node_id)
        if got is None:
            got = self._build(env)
            cache[self.node_id] = got
        return got

    def _derive(self, f: Callable[[DataFrame], DataFrame],
                name: str = "op") -> "TNode":
        return TNode(self._topology, lambda env: f(self._plan(env)), [self],
                     name=name)

    def _derive2(self, other: "TNode",
                 f: Callable[[DataFrame, DataFrame], DataFrame],
                 name: str = "op") -> "TNode":
        return TNode(
            self._topology,
            lambda env: f(self._plan(env), other._plan(env)),
            [self, other],
            name=name,
        )

    # -- rendering (topologynode.py:1252-1315) -------------------------------

    def _label(self, include_ids: bool) -> str:
        return f"{self.name}_{self.node_id}" if include_ids else self.name

    def _term(self, include_ids: bool, visited: set[int]) -> str:
        """Recursive term over this node's INPUTS (the reference recurses
        into ``_daughter_tn_set`` — its daughters are a node's inputs)."""
        if id(self) in visited:
            return f"REF:{self._label(include_ids)}"
        visited.add(id(self))
        args = ", ".join(p._term(include_ids, visited) for p in self.parents)
        return f"{self._label(include_ids)}({args})" if args else self._label(include_ids)

    def topology(self, include_ids: bool = False,
                 visited: set[int] | None = None) -> str:
        """This node's sub-DAG as a recursive term (reference surface:
        ``tn.topology()``, topologynode.py:1252-1287)."""
        return self._term(include_ids, visited if visited is not None else set())

    def _edges(self, include_ids: bool, edges: set[str], visited: set[int]) -> None:
        if id(self) in visited:
            return
        visited.add(id(self))
        for p in self.parents:
            edges.add(
                f"{p.node_id}[{p._label(include_ids)}] --> "
                f"{self.node_id}[{self._label(include_ids)}]\n"
            )
            p._edges(include_ids, edges, visited)

    def mermaid(self, include_ids: bool = False) -> str:
        """This node's sub-DAG as a fenced mermaid ``graph TD`` block
        (reference surface: ``tn.mermaid()``, topologynode.py:1289-1315;
        edges sorted for reproducibility where the reference emits
        nondeterministic set order)."""
        edges: set[str] = set()
        self._edges(include_ids, edges, set())
        return "```mermaid\ngraph TD\n" + "".join(sorted(edges)) + "```"

    # -- stateless (topologynode.py:120-274) --------------------------------

    def map(self, *cols: Column | str) -> "TNode":
        """Projection; weight threads through (topologynode.py:146-155)."""
        return self._derive(lambda df: df.select(*cols, F.col(WEIGHT)), "map_op")

    def map_py(self, f: Callable[[dict], dict], schema: str) -> "TNode":
        """Arbitrary Python record transform (map_fun parity) — the weight
        rides along outside the lambda."""
        from kafi_spark.functional import fmap_py

        def op(df: DataFrame) -> DataFrame:
            recs = [c for c in df.columns if c != WEIGHT]
            wrapped = lambda r: {**f({k: r[k] for k in recs}), WEIGHT: r[WEIGHT]}  # noqa: E731
            return fmap_py(df, wrapped, f"{schema}, {WEIGHT} long")

        return self._derive(op, "map_op")

    def filter(self, predicate: Column) -> "TNode":
        """Weight-blind predicate (topologynode.py:267-274)."""
        return self._derive(lambda df: df.filter(predicate), "filter_op")

    def filter_w(self, predicate: Column) -> "TNode":
        """Weight-aware filter (``_filter`` topologynode.py:244-265; used to
        keep only inserts via ``weight > 0``, e.g. T:664, T:938)."""
        return self._derive(lambda df: df.filter(predicate), "_filter_op")

    def flatmap(self, array_col: Column, alias: str, keep: Sequence[str] = ()) -> "TNode":
        """1:N expansion; weights of identical outputs consolidate
        (topologynode.py:231-240: flatmap re-consolidates). On streaming
        frames consolidation is deferred to the next aggregate — same bag
        semantics, and it keeps the plan to one stateful operator."""
        def op(df: DataFrame) -> DataFrame:
            out = df.select(*keep, F.explode(array_col).alias(alias), F.col(WEIGHT))
            return out if df.isStreaming else consolidate(out)

        return self._derive(op, "flatmap_op")

    def neg(self) -> "TNode":
        """Negate weights (topologynode.py:197-204)."""
        return self._derive(lambda df: df.withColumn(WEIGHT, -F.col(WEIGHT)), "_neg_op")

    def peek(self, label: str | None = None) -> "TNode":
        """Debug pass-through (topologynode.py:157-183). The reference
        prints each record; the distributed rendering is an ``observe``
        metric (row count under ``label``, readable from the query's
        observed-metrics listener) — per-row driver printing doesn't exist
        on a cluster. The default label is suffixed with the node id:
        CollectMetrics names must be unique per query, so two bare
        ``peek()`` calls in one sink plan would otherwise fail analysis."""
        node = self._derive(
            lambda df, _lb=label: df.observe(
                _lb if _lb is not None else f"peek_{node.node_id}",
                F.count(F.lit(1)).alias("rows"),
            ),
            "peek_op",
        )
        return node

    def from_value(self, value_col: str = "value") -> "TNode":
        """Project to the payload: record -> r[value] (topologynode.py:185-189).
        Struct payloads flatten to their fields; scalars keep the column."""
        def op(df: DataFrame) -> DataFrame:
            dt = df.schema[value_col].dataType.typeName()
            inner = [f"{value_col}.*"] if dt == "struct" else [value_col]
            return df.select(*inner, F.col(WEIGHT))

        return self._derive(op, "from_value_op")

    def to_value(self, value_col: str = "value") -> "TNode":
        """Wrap the record as {value: r} (topologynode.py:191-195)."""
        def op(df: DataFrame) -> DataFrame:
            rec = [c for c in df.columns if c != WEIGHT]
            return df.select(F.struct(*rec).alias(value_col), F.col(WEIGHT))

        return self._derive(op, "to_value_op")

    def merge(self, other: "TNode") -> "TNode":
        """Bag union, no dedup (topologynode.py:549-567)."""
        return self._derive2(other, lambda a, b: a.unionByName(b), "merge_op")

    # -- set ops (topologynode.py:278-350) ----------------------------------

    def distinct(self) -> "TNode":
        return self._derive(zset_distinct, "distinct_op")

    def union(self, other: "TNode") -> "TNode":
        return self._derive2(other, zset_union, "union_op")

    def intersect(self, other: "TNode") -> "TNode":
        return self._derive2(other, zset_intersect, "intersect_op")

    def minus(self, other: "TNode") -> "TNode":
        return self._derive2(other, zset_minus, "diff_op")

    # -- joins (topologynode.py:354-430) ------------------------------------

    def join(self, other: "TNode", predicate: Column, select: Sequence[Column | str]) -> "TNode":
        """Theta join with arbitrary predicate; output weight = w_l * w_r
        (bilinear, topologynode.py:354-388). Catalyst picks BNLJ/cartesian.
        Column name collisions are the caller's to alias (as in the
        reference's projection_fun).

        Streaming: a stream-stream theta join keeps BOTH sides' rows in
        state and, unlike an equi join, every stored row stays a match
        candidate for every future row — without event-time bounds the
        state grows with the stream, unboundedly. Building this node
        over two streaming inputs therefore REQUIRES a watermark on
        each side (``withWatermark`` before the topology source), and
        the predicate must include a time-range constraint between the
        watermarked columns for Spark to actually evict state (the
        watermark alone only bounds lateness). Spark additionally
        requires at least one EQUALITY conjunct in a stream-stream join
        predicate (its analyzer rejects pure theta at query start); a
        genuinely equality-free theta topology runs incrementally
        through :class:`~kafi_spark.streaming.incremental.
        IncrementalRunner` instead."""
        def op(l: DataFrame, r: DataFrame) -> DataFrame:
            _require_bounded_join_state(l, r, "theta")
            lw = l.withColumnRenamed(WEIGHT, "__wl")
            rw = r.withColumnRenamed(WEIGHT, "__wr")
            return (
                lw.join(rw, predicate, "inner")
                .select(*select, (F.col("__wl") * F.col("__wr")).alias(WEIGHT))
            )

        return self._derive2(other, op, "join_op")

    def join_equi(self, other: "TNode", on: Sequence[str] | Column,
                  select: Sequence[Column | str]) -> "TNode":
        """Equi join — indexed state in the reference (topologynode.py:
        390-430); here Catalyst picks broadcast/hash/SMJ. Streaming:
        stream-stream equi-join state is retained forever without
        watermarks just like the theta join's (the index changes lookup
        cost, not retention), so the same build-time guard applies."""
        def op(l: DataFrame, r: DataFrame) -> DataFrame:
            _require_bounded_join_state(l, r, "equi")
            lw = l.withColumnRenamed(WEIGHT, "__wl")
            rw = r.withColumnRenamed(WEIGHT, "__wr")
            return (
                lw.join(rw, on, "inner")
                .select(*select, (F.col("__wl") * F.col("__wr")).alias(WEIGHT))
            )

        return self._derive2(other, op, "join_equi_op")

    def asof_join(self, other: "TNode", on: Sequence[str] | str,
                  left_ts: str, right_ts: str, how: str = "inner",
                  tolerance_us: int | None = None) -> "TNode":
        """As-of join (beyond-reference; see functions/temporal.py) for
        INSERT-ONLY inputs: "latest prior right row" is not linear in the
        right multiset, so retractions (negative weights) do not
        distribute over it — weights must be +1 on both sides. The left
        weight travels through; the right row contributes its payload
        only. The right side is consolidated to NET-PRESENT rows first
        (round-9 review, same treatment window_session got in r7): a
        mid-topology right input like ``a.merge(b.neg())`` carries +1/−1
        row pairs whose bare ``drop(WEIGHT)`` left both physical rows —
        the window's ``last()`` then matched left rows against a record
        that is not in the set."""
        def op(l: DataFrame, r: DataFrame) -> DataFrame:
            from kafi_spark.functions.temporal import asof_join as _asof
            from kafi_spark.streams.zset import consolidate as _cons

            present = _cons(r).filter(F.col(WEIGHT) > 0)
            return _asof(
                l, present.drop(WEIGHT), on=on, left_ts=left_ts,
                right_ts=right_ts, how=how, tolerance_us=tolerance_us,
            )

        return self._derive2(other, op, "asof_join_op")

    # -- aggregates (topologynode.py:434-543) -------------------------------

    def group_by_agg(self, keys: Sequence[str], *aggs: Column) -> "TNode":
        """Keyed aggregate over the weighted multiset (topologynode.py:
        434-487). ``aggs`` must be weight-correct expressions — use the
        ``w*``  helpers below (wsum/wcount/wmin/wmax). Output is a Z-set of
        (keys, aggs) rows with weight 1 per present group."""
        def op(df: DataFrame) -> DataFrame:
            return _weighted_group_agg(df, list(keys), aggs)

        return self._derive(op, "group_by_agg_op")

    def group_by_sum(self, keys: Sequence[str], col: str, alias: str | None = None) -> "TNode":
        return self.group_by_agg(keys, wsum(col).alias(alias or f"sum_{col}"))

    def group_by_count(self, keys: Sequence[str], alias: str = "count") -> "TNode":
        return self.group_by_agg(keys, wcount().alias(alias))

    def group_by_max(self, keys: Sequence[str], col: str, alias: str | None = None) -> "TNode":
        return self.group_by_agg(keys, wmax(col).alias(alias or f"max_{col}"))

    def group_by_min(self, keys: Sequence[str], col: str, alias: str | None = None) -> "TNode":
        return self.group_by_agg(keys, wmin(col).alias(alias or f"min_{col}"))

    def agg(self, *aggs: Column) -> "TNode":
        """Global aggregate = constant-key group (topologynode.py:515-519)."""
        def op(df: DataFrame) -> DataFrame:
            return _weighted_group_agg(
                df.withColumn("__g", F.lit(0)), ["__g"], aggs
            ).drop("__g")

        return self._derive(op, "agg_op")

    # -- windows (topologynode.py:672-714, 865-944) -------------------------

    def window_tumbling(self, ts_col: str, size_ms: int, keys: Sequence[str],
                        *aggs: Column) -> "TNode":
        """Tumbling-window aggregate: assign + group by (key, window_start)
        (topologynode.py:888-898 via _window_aligned 865-884)."""
        from kafi_spark.streams.windows import tumbling

        def op(df: DataFrame) -> DataFrame:
            win = tumbling(df, ts_col, size_ms)
            return _weighted_group_agg(win, [*keys, "w_start"], aggs)

        return self._derive(op, "window_tumbling_op")

    def window_hopping(self, ts_col: str, size_ms: int, hop_ms: int,
                       keys: Sequence[str], *aggs: Column) -> "TNode":
        from kafi_spark.streams.windows import hopping

        def op(df: DataFrame) -> DataFrame:
            win = hopping(df, ts_col, size_ms, hop_ms)
            return _weighted_group_agg(win, [*keys, "w_start"], aggs)

        return self._derive(op, "window_hopping_op")

    def window_session(self, ts_col: str, gap_ms: int, keys: Sequence[str],
                       *aggs: Column) -> "TNode":
        from kafi_spark.streams.windows import sessionize

        def op(df: DataFrame) -> DataFrame:
            # session boundaries are NOT linear in the Z-set: a net-
            # negative row (over-retraction, transiently possible when
            # a retraction outruns its insert) would anchor the lag/
            # cumsum chain and bridge or split sessions of records that
            # ARE present. Consolidate and keep only net-present rows
            # before sessionizing — for well-formed states the output
            # is unchanged (review r7). Tumbling/hopping stay linear
            # (per-row window assignment; weights cancel in the agg).
            from kafi_spark.streams.zset import consolidate as _cons

            present = _cons(df).filter(F.col(WEIGHT) > 0)
            s = sessionize(present, ts_col, gap_ms, list(keys))
            return _weighted_group_agg(s, [*keys, "session_id"], aggs)

        return self._derive(op, "window_session_op")

    def window_tumbling_native(self, ts_col: str, size: str,
                               keys: Sequence[str], *aggs: Column,
                               slide: str | None = None) -> "TNode":
        """Native ``F.window`` aggregate — THE streaming-safe window
        node. The grouping contains ``window(ts)``, so with an event-
        time watermark upstream (``withWatermark`` on the source feed —
        the pairing :func:`kafi_spark.streams.windows.streaming_tumbling`
        packages) Spark EVICTS closed windows' state instead of keeping
        one entry per window forever. The epoch-long ``window_*`` nodes
        above mirror the reference's batch assigners
        (topologynode.py:672-714) and group on a DERIVED long — legal
        in streaming but never evicted (Spark's state cleanup only
        recognizes window/session_window expressions over the
        watermarked column); a long-running stream should group through
        THIS node. Batch semantics are identical (``F.window`` is
        batch-legal). Emits ``w_start``/``w_end`` timestamps; ``slide``
        makes it hopping."""
        def op(df: DataFrame) -> DataFrame:
            win = (F.window(F.col(ts_col), size, slide) if slide
                   else F.window(F.col(ts_col), size))
            out = (
                df.groupBy(*[F.col(k) for k in keys], win.alias("__w"))
                .agg(*aggs, F.sum(WEIGHT).alias("__net"))
                .filter(F.col("__net") > 0)
                .drop("__net")
                .withColumn(WEIGHT, F.lit(1).cast("long"))
            )
            rest = [c for c in out.columns
                    if c not in (*keys, "__w")]
            return out.select(
                *keys,
                F.col("__w.start").alias("w_start"),
                F.col("__w.end").alias("w_end"),
                *rest,
            )

        return self._derive(op, "window_tumbling_native_op")

    # -- sinks --------------------------------------------------------------

    def sink(self, name: str) -> "TNode":
        """Register as a named sink (streams.py:44-51). Returns self for
        further chaining (multi-sink DAGs, topologynode.py:991-1024)."""
        self._topology.sinks[name] = self
        return self


# -- weight-correct aggregate helpers ---------------------------------------

def wsum(col: str | Column) -> Column:
    """Weighted sum: Σ value·weight — retraction-correct."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c * F.col(WEIGHT))


def wcount() -> Column:
    """Weighted count: Σ weight."""
    return F.sum(F.col(WEIGHT))


def wmax(col: str | Column) -> Column:
    """Max over present records. NOTE: correct when the group's current
    members all have net-positive weight (the reference recomputes per
    group each step, topologynode.py:495-505 — same caveat)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.max(F.when(F.col(WEIGHT) > 0, c))


def wmin(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.min(F.when(F.col(WEIGHT) > 0, c))
