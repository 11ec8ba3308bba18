"""Product-quantization ANN (kafi_spark.functions.pq)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kafi_spark.functions import pq


def test_kmeans_np_deterministic_and_shaped():
    rng = np.random.RandomState(0)
    X = rng.randn(500, 8)
    C1 = pq._kmeans_np(X, 16, seed=3)
    C2 = pq._kmeans_np(X, 16, seed=3)
    assert C1.shape == (16, 8)
    assert np.array_equal(C1, C2)
    # tiny input pads to n_codes
    C3 = pq._kmeans_np(X[:4], 16, seed=3)
    assert C3.shape == (16, 8)


def test_pq_encode_code_width(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    cb = pq.pq_train(df, m_subspaces=8, n_codes=16)
    enc = pq.pq_encode(df, cb)
    rows = enc.collect()
    assert len(rows) == 50
    assert all(len(r.pq_code) == 8 for r in rows)
    # same input → identical codes (seeded training, deterministic encode)
    enc2 = {r.vec_id: r.pq_code for r in pq.pq_encode(df, cb).collect()}
    assert all(enc2[r.vec_id] == r.pq_code for r in rows)


def test_pq_validation(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(20)
    with pytest.raises(ValueError):
        pq.pq_train(df, m_subspaces=7)   # 64 not divisible by 7
    with pytest.raises(ValueError):
        pq.pq_train(df, n_codes=512)


def test_pq_topk_recall_vs_exact(spark, sf_dir):
    from kafi_spark.functions.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    corpus = emb.filter(F.col("vec_id") >= 10)
    exact = {(r.query_id, r.vec_id) for r in cosine_topk(corpus, queries, k=5).collect()}
    got_df = pq.cosine_topk_pq(corpus, queries, k=5, m_subspaces=8, rescore_factor=4)
    got = {(r.query_id, r.vec_id) for r in got_df.collect()}
    assert len(got) == len(exact)
    assert len(exact & got) / len(exact) >= 0.9
    # scores are EXACT cosines (rescored), so overlapping pairs must
    # carry identical ranks-by-score semantics: every rank in 1..5
    per_q = {}
    for r in got_df.collect():
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_pq_paths_drop_null_embeddings(spark):
    """Round-6 review: the ANN family's null policy now covers PQ —
    a null embedding used to crash train/encode executor-side."""
    from kafi_spark.functions.pq import pq_encode, pq_train

    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, None), (3, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    cb = pq_train(df, m_subspaces=2, n_codes=2)
    out = pq_encode(df, cb)
    assert sorted(r["vec_id"] for r in out.collect()) == [1, 3]
