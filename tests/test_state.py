"""Shared versioned-delta state discipline (kafi_spark.functions.state).

The families (bloom / KLL / CMS / dedup epochs) test their own
correctness; these pin the SHARED machinery's contracts directly —
the _SUCCESS commit fence, own-epoch exclusion, one-listing compaction
watermark, and prune bounds — so a regression here fails small and
points at the right module.
"""

from __future__ import annotations

import os

import pytest

from kafi_spark.functions import state as st


def _delta(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x int")


def test_save_load_exclude_and_missing_dir(spark, tmp_path):
    d = str(tmp_path / "s")
    # missing dir: empty frame of the declared schema
    out = st.load_deltas(spark, d, empty_schema="x int")
    assert out.count() == 0 and out.schema.simpleString() == "struct<x:int>"
    # missing dir without a schema: the reader's error surfaces
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        st.load_deltas(spark, d)
    st.save_delta(_delta(spark, [1, 2]), d, 0)
    st.save_delta(_delta(spark, [3]), d, "run1-1")  # string version ok
    assert {r["x"] for r in st.load_deltas(spark, d).collect()} == {1, 2, 3}
    # own-version exclusion is BY COLUMN (string compare)
    assert {r["x"] for r in
            st.load_deltas(spark, d, exclude_version="run1-1").collect()
            } == {1, 2}
    # idempotent per-version overwrite: re-saving replaces, not stacks
    st.save_delta(_delta(spark, [9]), d, 0)
    assert {r["x"] for r in
            st.load_deltas(spark, d, "run1-1").collect()} == {9}


def test_committed_dirs_fences_and_watermark(spark, tmp_path):
    d = str(tmp_path / "s")
    with pytest.raises(FileNotFoundError):
        st.committed_dirs(d)
    for e in (0, 1, 2):
        st.save_delta(_delta(spark, [e]), d, e)
    # an uncommitted delta (no _SUCCESS) is invisible
    os.remove(f"{d}/v=1/_SUCCESS")
    wm, compact, live = st.committed_dirs(d)
    assert wm is None and compact is None
    assert sorted(os.path.basename(p) for p in live) == ["v=0", "v=2"]
    # watermark_paths: own-epoch exclusion on the live set
    names = [os.path.basename(p) for p in st.watermark_paths(d, 2)]
    assert names == ["v=0"]
    assert st.watermark_paths(str(tmp_path / "absent")) == []


def test_compact_fold_watermark_prune_and_fence(spark, tmp_path):
    d = str(tmp_path / "s")
    for e in (0, 1, 2):
        st.save_delta(_delta(spark, [e]), d, e)
    wm = st.compact_fold(spark, d, lambda df: df.select("x").distinct())
    assert wm == 2
    wm2, compact, live = st.committed_dirs(d)
    assert wm2 == 2 and compact.endswith("v=compact-2") and live == []
    # reader set = the fold alone; stale epoch dirs still on disk
    assert [os.path.basename(p) for p in st.watermark_paths(d)] == [
        "v=compact-2"]
    # nothing live: compact returns the existing watermark, writes nothing
    assert st.compact_fold(spark, d, lambda df: df) == 2
    # new epochs past the fence fold into a NEWER compact; prune removes
    # superseded epochs and older compacts, keeps the new fold
    st.save_delta(_delta(spark, [7]), d, 3)
    wm3 = st.compact_fold(
        spark, d, lambda df: df.select("x").distinct(), prune=True)
    assert wm3 == 3
    left = sorted(n for n in os.listdir(d) if n.startswith("v="))
    assert left == ["v=compact-3"]
    rows = {r["x"] for r in
            st.load_deltas(spark, d).select("x").collect()}
    assert rows == {0, 1, 2, 7}
    # an UNCOMMITTED compact must not move the fence
    st.save_delta(_delta(spark, [8]), d, 4)
    os.makedirs(f"{d}/v=compact-9", exist_ok=True)
    wm4, compact4, live4 = st.committed_dirs(d)
    assert wm4 == 3 and [os.path.basename(p) for p in live4] == ["v=4"]


def test_scheme_paths_list_through_hadoop_fs(spark, tmp_path):
    """Round-8 review: the additive readers were os.listdir-only, so
    scheme:// state that save_delta wrote fine read back as 'no state'
    (streaming dedup gate silently passing near-dups; kll/cms totals
    crashing). file:// exercises the HadoopIO route end-to-end."""
    d = "file://" + str(tmp_path / "hs")
    st.save_delta(_delta(spark, [1]), d, 0)
    st.save_delta(_delta(spark, [2]), d, 1)
    wm, compact, live = st.committed_dirs(d, spark)
    assert wm is None and compact is None and len(live) == 2
    assert len(st.watermark_paths(d, exclude_epoch=1, spark=spark)) == 1
    wm = st.compact_fold(spark, d, lambda df: df.select("x").distinct(),
                         prune=True)
    assert wm == 1
    wm2, compact2, live2 = st.committed_dirs(d, spark)
    assert wm2 == 1 and compact2.endswith("v=compact-1") and live2 == []
    rows = {r["x"] for r in st.load_deltas(spark, d).select("x").collect()}
    assert rows == {1, 2}
    # os.listdir confirms prune really deleted through the FS layer
    left = sorted(n for n in os.listdir(tmp_path / "hs")
                  if n.startswith("v="))
    assert left == ["v=compact-1"]


def test_non_numeric_epoch_delta_fails_with_named_cause(spark, tmp_path):
    """Round-8 review: a stray non-numeric delta poisoned every read
    with a bare ValueError; the fence now names the offending dir."""
    d = str(tmp_path / "p")
    st.save_delta(_delta(spark, [1]), d, 0)
    st.save_delta(_delta(spark, [2]), d, "2.5")
    with pytest.raises(ValueError, match="v=2.5"):
        st.committed_dirs(d)
