"""File-level bloom skip-index (kafi_spark.functions.skipindex)."""

from __future__ import annotations

import glob
import os

import pytest

from pyspark.sql import functions as F

from kafi_spark.functions import skipindex as si
from kafi_spark.session import read_table


@pytest.fixture(scope="module")
def data_path(spark, sf_dir, tmp_path_factory):
    """documents written as 8 files in RANDOM doc_id layout — the case
    min/max stats cannot prune and only the bloom can."""
    out = str(tmp_path_factory.mktemp("skip") / "docs")
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    d.repartition(8, F.col("text")).write.parquet(out)
    si.build_skip_index(spark, out, ["doc_id", "lang"], num_bits=1 << 14)
    return out


def test_index_invisible_to_plain_reads(spark, data_path, sf_dir):
    want = read_table(spark, sf_dir, "documents").count()
    assert spark.read.parquet(data_path).count() == want
    assert os.path.isdir(os.path.join(data_path, "_kafi_skip_index"))


def test_no_false_negatives_and_exact_read(spark, data_path):
    """For present keys: pruned read == full-scan filter, row for row."""
    some = [r["doc_id"] for r in
            spark.read.parquet(data_path).select("doc_id").limit(5).collect()]
    got = sorted(
        (r["doc_id"], r["lang"])
        for r in si.pruned_point_read(
            spark, data_path, "doc_id", some).collect()
    )
    want = sorted(
        (r["doc_id"], r["lang"])
        for r in spark.read.parquet(data_path)
        .filter(F.col("doc_id").isin(some)).collect()
    )
    assert got == want and len(got) == len(some)


def test_every_owning_file_is_candidate(spark, data_path):
    """The no-false-negative property, checked against ground truth."""
    rows = (
        spark.read.parquet(data_path)
        .select("doc_id", F.input_file_name().alias("f"))
        .limit(200)
        .collect()
    )
    for r in rows[:20]:
        cands = si.skip_index_candidates(
            spark, data_path, "doc_id", [r["doc_id"]])
        assert si._norm_uri(r["f"]) in cands, r["doc_id"]


def test_point_lookup_prunes_most_files(spark, data_path):
    """One doc_id lives in one of 8 files; the bloom must rule out most
    of the rest (at 14 bits for ~60-ish distinct ids per file the
    false-positive rate is far below 1/8)."""
    n_files = len(glob.glob(f"{data_path}/part-*.parquet"))
    assert n_files == 8
    one = spark.read.parquet(data_path).select("doc_id").first()["doc_id"]
    cands = si.skip_index_candidates(spark, data_path, "doc_id", [one])
    assert 1 <= len(cands) <= 2


def test_absent_key_scans_nothing(spark, data_path):
    cands = si.skip_index_candidates(
        spark, data_path, "doc_id", [10**12 + 7])
    assert cands == []
    out = si.pruned_point_read(spark, data_path, "doc_id", [10**12 + 7])
    assert out.count() == 0
    assert out.schema == spark.read.parquet(data_path).schema


def test_string_column_and_multivalue(spark, data_path):
    langs = [r["lang"] for r in
             spark.read.parquet(data_path).select("lang")
             .distinct().limit(2).collect()]
    got = si.pruned_point_read(spark, data_path, "lang", langs).count()
    want = spark.read.parquet(data_path).filter(
        F.col("lang").isin(langs)).count()
    assert got == want > 0


def test_unindexed_column_and_null_probe_rejected(spark, data_path):
    with pytest.raises(ValueError, match="not indexed"):
        si.skip_index_candidates(spark, data_path, "text", ["x"])
    with pytest.raises(ValueError, match="NULL"):
        si.skip_index_candidates(spark, data_path, "doc_id", [None])


def test_rebuild_overwrites(spark, data_path):
    """Rebuilding with different geometry replaces the manifest and the
    probes keep working (no stale-geometry mixing)."""
    si.build_skip_index(spark, data_path, ["doc_id"], num_bits=1 << 15, k=5)
    one = spark.read.parquet(data_path).select("doc_id").first()["doc_id"]
    assert len(si.skip_index_candidates(
        spark, data_path, "doc_id", [one])) >= 1
    # restore the module-scoped fixture's geometry for later tests
    si.build_skip_index(
        spark, data_path, ["doc_id", "lang"], num_bits=1 << 14)


def test_num_bits_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="num_bits"):
        si.build_skip_index(spark, str(tmp_path), ["x"], num_bits=100)


def test_append_drift_no_false_negatives(spark, tmp_path):
    """Files appended AFTER the index build are unindexed ⇒ always
    candidates: lookups of brand-new keys still find them."""
    out = str(tmp_path / "drift")
    spark.range(100).selectExpr("id", "id * 2 AS v").repartition(2) \
        .write.parquet(out)
    si.build_skip_index(spark, out, ["id"], num_bits=1 << 12)
    # append new rows with keys far outside the indexed range
    spark.range(1000, 1010).selectExpr("id", "id * 2 AS v") \
        .repartition(1).write.mode("append").parquet(out)
    got = si.pruned_point_read(spark, out, "id", [1005]).collect()
    assert [(r["id"], r["v"]) for r in got] == [(1005, 2010)]
    # and the pruning still works for indexed keys: 2 indexed files
    # bloom-pruned + 1 unindexed file always scanned ⇒ ≤ 2 candidates
    cands = si.skip_index_candidates(spark, out, "id", [7])
    assert 1 <= len(cands) <= 2


def test_delete_drift_no_error(spark, tmp_path):
    """Files deleted after the build drop out of the candidate set
    instead of crashing the pruned read."""
    import glob as _g
    import os as _os

    out = str(tmp_path / "del")
    spark.range(100).selectExpr("id", "id * 2 AS v").repartition(4) \
        .write.parquet(out)
    si.build_skip_index(spark, out, ["id"], num_bits=1 << 12)
    victim = sorted(_g.glob(f"{out}/part-*.parquet"))[0]
    _os.remove(victim)
    left = spark.read.parquet(out).count()
    got = si.pruned_point_read(
        spark, out, "id", list(range(100))).count()
    assert got == left < 100


def test_partitioned_layout_keeps_partition_column(spark, tmp_path):
    """Hive-partitioned data (an FS topic's layout): the pruned read
    preserves the directory-derived partition column via basePath."""
    out = str(tmp_path / "hive")
    spark.range(200).selectExpr(
        "id", "cast(id % 4 AS int) AS part", "id * 3 AS v"
    ).write.partitionBy("part").parquet(out)
    si.build_skip_index(spark, out, ["id"], num_bits=1 << 12)
    got = si.pruned_point_read(spark, out, "id", [42]).collect()
    assert len(got) == 1
    r = got[0]
    assert r["part"] == 42 % 4 and r["v"] == 126


def test_probe_hashes_at_indexed_column_type(spark, tmp_path):
    """xxhash64(int 42) != xxhash64(bigint 42): a probe that hashes
    Python ints at Spark's inferred bigint against an int-column index
    silently returns ZERO rows for present keys. The manifest now pins
    each column's dtype and the probe casts to it."""
    from kafi_spark.functions.skipindex import (
        build_skip_index, pruned_point_read, skip_index_candidates)

    path = str(tmp_path / "intdata")
    spark.range(1000).selectExpr(
        "cast(id as int) as id", "id * 2 as payload"
    ).repartition(4).write.parquet(path)
    build_skip_index(spark, path, ["id"])
    assert skip_index_candidates(spark, path, "id", [42])
    got = pruned_point_read(spark, path, "id", [42]).collect()
    assert len(got) == 1 and got[0]["id"] == 42
    # float column too (the other silently-mistyped family)
    path2 = str(tmp_path / "floatdata")
    spark.range(100).selectExpr(
        "cast(id as float) as f", "id"
    ).repartition(2).write.parquet(path2)
    build_skip_index(spark, path2, ["f"])
    assert pruned_point_read(spark, path2, "f", [7.0]).count() == 1


def test_probe_collect_bounded_not_per_file(spark, tmp_path, monkeypatch):
    """The probe verdict is computed distributed (join/agg over the index
    tables): driver-side collects during one probe are bounded by
    k·|values| (needed word indexes) + |candidates| — NEVER O(indexed
    files). Over a 64-file index a per-file implementation collects ≥ 64
    bloom/minmax rows; the bound here is < 16."""
    from pyspark.sql import DataFrame

    out = str(tmp_path / "many")
    df = spark.range(6400).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    )
    df.repartition(64, "k").write.parquet(out)
    si.build_skip_index(spark, out, ["k"], num_bits=1 << 14)
    assert len(glob.glob(f"{out}/part-*.parquet")) == 64

    counts: list[int] = []
    orig = DataFrame.collect

    def counting(self):
        rows = orig(self)
        counts.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", counting)
    cands = si.skip_index_candidates(spark, out, "k", [1234])
    # one value in exactly one file (+ possible bloom false positives)
    assert 1 <= len(cands) <= 3
    total = sum(counts)
    assert total <= 7 + len(cands), (
        f"driver collected {total} rows for a 1-value probe over 64 files "
        f"(per-collect: {counts}) — the verdict is not distributed"
    )


def test_append_indexes_new_files_and_restores_pruning(spark, tmp_path):
    """skip_index_append: appended files regain pruning without a corpus
    re-scan; a crashed-retry double-append (duplicate bloom rows) never
    causes a false negative; deleted files drop from the manifest."""
    out = str(tmp_path / "grow")
    spark.range(0, 4000).select(F.col("id").alias("k")) \
        .repartition(8, "k").write.parquet(out)
    si.build_skip_index(spark, out, ["k"], num_bits=1 << 14)

    # drift: 8 new files appear after the build
    spark.range(4000, 8000).select(F.col("id").alias("k")) \
        .repartition(8, "k").write.mode("append").parquet(out)
    new_key = 6789
    # pre-append: every new file is a candidate (unindexed -> must scan)
    pre = si.skip_index_candidates(spark, out, "k", [new_key])
    assert len(pre) >= 8

    added = si.skip_index_append(spark, out)
    assert len(added) == 8
    # post-append: the key prunes back down to its owning file (+FP tail)
    post = si.skip_index_candidates(spark, out, "k", [new_key])
    assert 1 <= len(post) <= 3
    # no false negative: the owning file is among the candidates
    own = spark.read.parquet(out).filter(F.col("k") == new_key) \
        .select(F.input_file_name().alias("f")).first()["f"]
    assert si._norm_uri(own) in post
    # idempotent when current
    assert si.skip_index_append(spark, out) == []

    # crashed-retry simulation: duplicate the new files' bloom rows by
    # appending the SAME delta again (manifest already updated), then
    # probe — count_distinct keeps n_ok == n_need, no false negatives
    new_df = spark.read.option("basePath", out).parquet(*added)
    si._write_index_delta(new_df, out, ["k"], 1 << 14, si._DEFAULT_K,
                          mode="append")
    dup = si.skip_index_candidates(spark, out, "k", [new_key])
    assert si._norm_uri(own) in dup
    present = [r["k"] for r in spark.read.parquet(out)
               .sample(0.01, seed=7).limit(5).collect()]
    got = sorted(r["k"] for r in
                 si.pruned_point_read(spark, out, "k", present).collect())
    assert got == sorted(present)
