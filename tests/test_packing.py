"""Sequence packing invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from kafi_spark.session import read_table

    return read_table(spark, sf_dir, "documents").select(
        "doc_id", F.greatest(F.lit(1), (F.col("n_chars") / 4)).cast("long").alias("n_tokens")
    )


def test_every_doc_packed_once(docs):
    from kafi_spark.functions.packing import pack_documents

    out = pack_documents(docs, "doc_id", "n_tokens", budget=512, n_buckets=8)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()


def test_packs_respect_budget(docs):
    from kafi_spark.functions.packing import pack_documents

    out = pack_documents(docs, "doc_id", "n_tokens", budget=512, n_buckets=8)
    # recompute pack totals from members; must match pack_tokens and
    # stay within budget except single-doc oversized packs
    totals = out.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("tot"),
        F.count(F.lit(1)).alias("members"),
        F.max("pack_tokens").alias("claimed"),
    )
    assert totals.filter(F.col("tot") != F.col("claimed")).count() == 0
    over = totals.filter(F.col("tot") > 512)
    assert over.filter(F.col("members") > 1).count() == 0


def test_oversized_doc_gets_own_pack(spark):
    from kafi_spark.functions.packing import pack_documents

    df = spark.createDataFrame(
        [(1, 100), (2, 9000), (3, 200)], "doc_id long, n_tokens long"
    )
    out = pack_documents(df, "doc_id", "n_tokens", budget=512, n_buckets=1)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[2]["pack_tokens"] == 9000  # alone, flagged by > budget
    # docs 1+3 fit one pack together (same bucket, FFD)
    assert rows[1]["pack_id"] == rows[3]["pack_id"]
    assert rows[1]["pack_tokens"] == 300


def test_deterministic(docs):
    from kafi_spark.functions.packing import pack_documents

    a = pack_documents(docs, "doc_id", "n_tokens", budget=512, n_buckets=8)
    b = pack_documents(docs, "doc_id", "n_tokens", budget=512, n_buckets=8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_rejects_bad_budget(docs):
    from kafi_spark.functions.packing import pack_documents

    with pytest.raises(ValueError):
        pack_documents(docs, "doc_id", "n_tokens", budget=0)


def test_packing_invariants_hypothesis(spark):
    from hypothesis import HealthCheck, given, settings, strategies as st

    from kafi_spark.functions.packing import pack_documents

    @given(
        tokens=st.lists(st.integers(min_value=1, max_value=700), max_size=15),
        budget=st.sampled_from([128, 512]),
    )
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def run(tokens, budget):
        if not tokens:
            return
        df = spark.createDataFrame(
            list(enumerate(tokens)), "doc_id long, n_tokens long"
        )
        out = pack_documents(df, "doc_id", "n_tokens", budget=budget, n_buckets=3)
        rows_ = out.collect()
        # every doc exactly once
        assert sorted(r["doc_id"] for r in rows_) == sorted(range(len(tokens)))
        # per-pack totals consistent and within budget unless singleton
        packs = {}
        for r in rows_:
            packs.setdefault(r["pack_id"], []).append(r)
        for members in packs.values():
            tot = sum(r["n_tokens"] for r in members)
            assert all(r["pack_tokens"] == tot for r in members)
            if len(members) > 1:
                assert tot <= budget

    run()


def test_pack_documents_null_tokens_dropped_and_fixed_buckets(spark):
    """Round-6 review: a NULL token count crashed the pandas kernel
    (NaN->int); the default bucket count is now cluster-independent so
    the documented same-input-same-packs guarantee actually holds."""
    from kafi_spark.functions.packing import pack_documents

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 5)], "doc_id long, n_tokens long")
    out = pack_documents(df, "doc_id", "n_tokens", budget=16).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 3]
    assert all(r["pack_tokens"] <= 16 for r in out)
