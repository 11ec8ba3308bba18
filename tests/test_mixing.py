"""Corpus mixing — fraction math exactly, sampling statistically."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_fractions_exact_math():
    from kafi_spark.functions.mixing import mix_fractions

    counts = {"web": 8000, "books": 1000, "code": 1000}
    # want 50/25/25 — books is scarcest: T = 1000/0.25 = 4000
    f = mix_fractions(counts, {"web": 2, "books": 1, "code": 1})
    assert f == {"web": 4000 * 0.5 / 8000, "books": 1.0, "code": 1.0}


def test_fractions_total_cap_and_validation():
    from kafi_spark.functions.mixing import mix_fractions

    counts = {"a": 100, "b": 100}
    f = mix_fractions(counts, {"a": 1, "b": 1}, total=50)
    assert f == {"a": 0.25, "b": 0.25}
    with pytest.raises(ValueError):
        mix_fractions(counts, {"a": 0})
    with pytest.raises(ValueError):
        mix_fractions(counts, {"a": 1, "zzz": 1})


def test_mix_sources_proportions(spark, sf_dir):
    from kafi_spark.functions.mixing import mix_sources
    from kafi_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    srcs = [r[0] for r in docs.select("source").distinct().collect()]
    if len(srcs) < 2:
        pytest.skip("need >= 2 sources")
    targets = {srcs[0]: 3.0, srcs[1]: 1.0}
    out = mix_sources(docs, "source", targets, seed=7)
    got = {r[0]: r[1] for r in out.groupBy("source").count().collect()}
    assert set(got) <= set(targets)
    ratio = got[srcs[0]] / max(got[srcs[1]], 1)
    assert 1.8 <= ratio <= 5.0  # 3:1 within binomial noise at sf0.001

    # determinism for a fixed seed
    again = mix_sources(docs, "source", targets, seed=7)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_mix_fractions_properties_hypothesis():
    from hypothesis import given, settings, strategies as st

    from kafi_spark.functions.mixing import mix_fractions

    counts_st = st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(min_value=1, max_value=10_000),
        min_size=2,
    )

    @given(counts=counts_st, w=st.integers(min_value=1, max_value=9))
    @settings(max_examples=50, deadline=None)
    def run(counts, w):
        srcs = sorted(counts)
        targets = {s: float(w if i == 0 else 1) for i, s in enumerate(srcs)}
        f = mix_fractions(counts, targets)
        # fractions are valid probabilities
        assert all(0 < f[s] <= 1.0 for s in srcs)
        # expected sampled counts realize the target proportions exactly
        expected = {s: counts[s] * f[s] for s in srcs}
        total = sum(expected.values())
        wsum = sum(targets.values())
        for s in srcs:
            assert abs(expected[s] / total - targets[s] / wsum) < 1e-9
        # the binding (scarcest-relative) source is fully used
        assert any(abs(f[s] - 1.0) < 1e-9 for s in srcs)

    run()


def test_split_corpus_partitions_and_is_deterministic(spark):
    from kafi_spark.functions.mixing import split_corpus

    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    splits = split_corpus(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    sizes = {k: v.count() for k, v in splits.items()}
    assert sum(sizes.values()) == 5000            # complete
    train_ids = {r.doc_id for r in splits["train"].collect()}
    val_ids = {r.doc_id for r in splits["val"].collect()}
    test_ids = {r.doc_id for r in splits["test"].collect()}
    assert not (train_ids & val_ids) and not (train_ids & test_ids) \
        and not (val_ids & test_ids)              # disjoint
    assert abs(sizes["train"] - 4000) < 200       # ~proportions
    assert abs(sizes["val"] - 500) < 120
    # stable under repartitioning and re-evaluation
    again = split_corpus(df.repartition(17), {"train": 0.8, "val": 0.1, "test": 0.1})
    assert {r.doc_id for r in again["val"].collect()} == val_ids


def test_split_corpus_rejects_bad_weights(spark):
    import pytest

    from kafi_spark.functions.mixing import split_corpus

    df = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        split_corpus(df, {"a": 0.0, "b": 0.0})
    with pytest.raises(ValueError):
        split_corpus(df, {"a": -1.0, "b": 2.0})


def test_stratified_sample_exact_counts_and_determinism(spark, sf_dir):
    from kafi_spark.functions.mixing import stratified_sample_exact

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = stratified_sample_exact(df, "source", k_per_stratum=10, seed=7)
    counts = {r.source: r.c for r in
              out.groupBy("source").agg(F.count(F.lit(1)).alias("c")).collect()}
    avail = {r.source: r.c for r in
             df.groupBy("source").agg(F.count(F.lit(1)).alias("c")).collect()}
    for s, c in counts.items():
        assert c == min(10, avail[s])
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(r.doc_id for r in
                  stratified_sample_exact(df, "source", 10, seed=7).collect())
    assert ids1 == ids2
    ids3 = sorted(r.doc_id for r in
                  stratified_sample_exact(df, "source", 10, seed=8).collect())
    assert ids3 != ids1
    # repartitioning the input must not change membership
    ids4 = sorted(r.doc_id for r in stratified_sample_exact(
        df.repartition(7), "source", 10, seed=7).collect())
    assert ids4 == ids1


def test_shuffle_deterministic_is_a_stable_permutation(spark, sf_dir):
    from kafi_spark.functions.mixing import shuffle_deterministic

    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    o1 = [r.doc_id for r in shuffle_deterministic(df, seed=1).collect()]
    o2 = [r.doc_id for r in shuffle_deterministic(df.repartition(5), seed=1).collect()]
    assert o1 == o2                      # partition-layout independent
    assert sorted(o1) == sorted(set(o1))  # a permutation, no dup/loss
    o3 = [r.doc_id for r in shuffle_deterministic(df, seed=2).collect()]
    assert o3 != o1


def test_mix_fractions_rejects_negative_weights():
    from kafi_spark.functions.mixing import mix_fractions

    import pytest as _pytest
    with _pytest.raises(ValueError, match=">= 0"):
        mix_fractions({"a": 100, "b": 100}, {"a": 2, "b": -1})
