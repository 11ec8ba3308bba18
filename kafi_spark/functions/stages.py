"""Resumable multi-stage pipeline execution.

A 100 TB curation run is hours of work across many stages; a failure at
stage 7 must not recompute stages 1-6. This runner materializes each
stage's DataFrame to parquet under a work directory and SKIPS stages
whose output already committed — Spark's own ``_SUCCESS`` marker is the
commit record, so a stage killed mid-write (no marker) re-runs cleanly
while finished stages are only re-read. Restart semantics come free
from the filesystem; no driver-side state, no bookkeeping service.

Stages declare dependencies by name; each builder receives the
DataFrames of its dependencies (lazily read from their parquet — so a
resumed run's stage 7 reads stage 6's output exactly as the original
run would have) and returns the stage's DataFrame.

This is deliberately a BATCH orchestration primitive — the streaming
layer has its own checkpointing (``streaming/runner.py``); and unlike
``localCheckpoint`` (session-lifetime, memory/disk of the running
cluster) these materializations survive the cluster.
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession


_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]*$")


class Stage:
    """One named pipeline stage: ``build(deps)`` maps dependency-name →
    DataFrame to this stage's output DataFrame."""

    def __init__(
        self,
        name: str,
        build: Callable[[dict[str, DataFrame]], DataFrame],
        deps: Sequence[str] = (),
    ) -> None:
        # charset-allowlist, NOT just a '/' check: '..' or '.' would
        # escape/clobber the work dir through the overwrite-mode write
        if not _NAME_RE.match(name) or name in (".", ".."):
            raise ValueError(f"invalid stage name {name!r}")
        self.name = name
        self.build = build
        self.deps = tuple(deps)


def _out_dir(work_dir: str, name: str) -> str:
    return os.path.join(work_dir, name)


def _committed(spark: SparkSession, path: str) -> bool:
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(os.path.join(path, "_SUCCESS"))
    return p.getFileSystem(hconf).exists(p)


def run_pipeline(
    spark: SparkSession,
    stages: Sequence[Stage],
    work_dir: str,
    force: Sequence[str] = (),
) -> dict[str, DataFrame]:
    """Execute ``stages`` in order with resume-on-restart.

    A stage runs iff its output is not committed (or it is named in
    ``force``, which also invalidates every transitive dependent —
    rerunning a stage against stale downstream outputs would silently
    mix pipeline versions). Returns {name: DataFrame} reading each
    stage's materialized output. Stages must be topologically ordered
    (a dep appearing after its dependent raises)."""
    known: set[str] = set()
    for st in stages:
        missing = [d for d in st.deps if d not in known]
        if missing:
            raise ValueError(
                f"stage {st.name!r} depends on {missing} which are not "
                "defined earlier in the stage list"
            )
        known.add(st.name)
    names = [st.name for st in stages]
    if len(set(names)) != len(names):
        raise ValueError("duplicate stage names")

    unknown = set(force) - set(names)
    if unknown:
        raise ValueError(f"force names not in the stage list: {sorted(unknown)}")

    # force-invalidation propagates to dependents
    invalid: set[str] = set(force)
    for st in stages:
        if any(d in invalid for d in st.deps):
            invalid.add(st.name)

    # persist the invalidation BEFORE anything runs: uncommit every
    # invalidated stage by deleting its _SUCCESS marker. A crash after a
    # forced stage reran but before its dependents did would otherwise
    # leave committed-but-stale dependents that a plain resume silently
    # serves (new upstream + old downstream, mixed forever).
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    # dependents-FIRST (reverse topological order, then set order is
    # irrelevant): deleting upstream markers before downstream ones
    # opens exactly the crash window this loop exists to close — crash
    # after s3's marker went but before its dependent s4's did, and a
    # plain resume rebuilds s3 while serving the stale committed s4
    ordered = [st.name for st in stages if st.name in invalid]
    for name in reversed(ordered):
        marker = jvm.org.apache.hadoop.fs.Path(
            os.path.join(_out_dir(work_dir, name), "_SUCCESS")
        )
        fs = marker.getFileSystem(hconf)
        if fs.exists(marker):
            fs.delete(marker, False)

    out: dict[str, DataFrame] = {}
    for st in stages:
        path = _out_dir(work_dir, st.name)
        if st.name not in invalid and _committed(spark, path):
            out[st.name] = spark.read.parquet(path)
            continue
        deps = {d: out[d] for d in st.deps}
        df = st.build(deps)
        df.write.mode("overwrite").parquet(path)
        out[st.name] = spark.read.parquet(path)
    return out
