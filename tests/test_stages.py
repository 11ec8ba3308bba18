"""Resumable pipeline stages (kafi_spark.functions.stages)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from kafi_spark.functions.stages import Stage, run_pipeline


def _stages(spark, calls):
    def src(_):
        calls.append("src")
        return spark.range(10).select(F.col("id").alias("doc_id"))

    def double(deps):
        calls.append("double")
        return deps["src"].select((F.col("doc_id") * 2).alias("doc_id"))

    def head(deps):
        calls.append("head")
        return deps["double"].filter(F.col("doc_id") < 10)

    return [Stage("src", src), Stage("double", double, deps=["src"]),
            Stage("head", head, deps=["double"])]


def test_run_and_resume_skips_committed(spark, tmp_path):
    wd = str(tmp_path / "wd")
    calls: list[str] = []
    out = run_pipeline(spark, _stages(spark, calls), wd)
    assert sorted(r.doc_id for r in out["head"].collect()) == [0, 2, 4, 6, 8]
    assert calls == ["src", "double", "head"]

    # full resume: nothing rebuilds, results identical
    calls.clear()
    out2 = run_pipeline(spark, _stages(spark, calls), wd)
    assert calls == []
    assert sorted(r.doc_id for r in out2["head"].collect()) == [0, 2, 4, 6, 8]

    # crash simulation: stage output without its commit marker re-runs
    os.remove(os.path.join(wd, "double", "_SUCCESS"))
    calls.clear()
    run_pipeline(spark, _stages(spark, calls), wd)
    assert calls == ["double"]

    # deleting a stage dir re-runs just that stage (deps untouched)
    shutil.rmtree(os.path.join(wd, "head"))
    calls.clear()
    run_pipeline(spark, _stages(spark, calls), wd)
    assert calls == ["head"]


def test_force_invalidates_transitive_dependents(spark, tmp_path):
    wd = str(tmp_path / "wd")
    calls: list[str] = []
    run_pipeline(spark, _stages(spark, calls), wd)
    calls.clear()
    run_pipeline(spark, _stages(spark, calls), wd, force=["src"])
    # src reruns AND everything downstream of it
    assert calls == ["src", "double", "head"]
    calls.clear()
    run_pipeline(spark, _stages(spark, calls), wd, force=["double"])
    assert calls == ["double", "head"]


def test_validation(spark, tmp_path):
    with pytest.raises(ValueError):
        run_pipeline(spark, [Stage("b", lambda d: None, deps=["a"])],
                     str(tmp_path))
    with pytest.raises(ValueError):
        Stage("bad/name", lambda d: None)
    dup = [Stage("x", lambda d: spark.range(1)),
           Stage("x", lambda d: spark.range(1))]
    with pytest.raises(ValueError):
        run_pipeline(spark, dup, str(tmp_path))


def test_stage_runner_composes_real_curation(spark, sf_dir, tmp_path):
    """The stage runner orchestrating actual operators: extract → curate
    → chunk, resumable between stages."""
    from kafi_spark.functions.pipeline import curate_documents
    from kafi_spark.functions.spans import chunk_text

    wd = str(tmp_path / "wd")
    calls: list[str] = []

    def mk():
        def load(_):
            calls.append("load")
            return spark.read.parquet(f"{sf_dir}/documents.parquet")

        def curate(deps):
            calls.append("curate")
            ids = curate_documents(deps["load"]).select("doc_id")
            return deps["load"].join(ids, "doc_id", "left_semi")

        def chunks(deps):
            calls.append("chunks")
            return chunk_text(deps["curate"], max_tokens=16)

        return [Stage("load", load), Stage("curate", curate, deps=["load"]),
                Stage("chunks", chunks, deps=["curate"])]

    out = run_pipeline(spark, mk(), wd)
    n_curated = out["curate"].count()
    n_chunks = out["chunks"].count()
    assert 0 < n_curated < 500 and n_chunks >= n_curated
    # resume recomputes nothing and reads identical results
    calls.clear()
    out2 = run_pipeline(spark, mk(), wd)
    assert calls == []
    assert out2["chunks"].count() == n_chunks
