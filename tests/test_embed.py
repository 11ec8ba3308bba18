"""Embedding plumbing (kafi_spark.functions.embed)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from kafi_spark.functions import embed as em


def test_hash_embedding_is_deterministic_unit_vector(spark):
    df = spark.createDataFrame([("hello world",), ("hello world",),
                                ("different",)], "text string")
    out = [r.e for r in df.select(
        em.hash_embedding_col(F.col("text"), dim=16).alias("e")).collect()]
    assert out[0] == out[1]                  # equal text ⇒ identical vector
    assert out[0] != out[2]
    for v in out:
        assert len(v) == 16
        assert sum(x * x for x in v) == pytest.approx(1.0, rel=1e-5)
    with pytest.raises(ValueError):
        em.hash_embedding_col(F.col("text"), dim=0)


def test_hash_embedding_matches_duckdb(spark):
    """The stub is itself oracle-replayable (md5-derived floats)."""
    df = spark.createDataFrame([("abc",)], "text string")
    got = df.select(em.hash_embedding_col(F.col("text"), dim=4).alias("e")
                    ).first().e
    con = duckdb.connect()
    want_raw = [con.sql(
        f"SELECT (('0x'||substring(md5(CAST({i} AS VARCHAR)||':'||'abc'),1,15))::BIGINT"
        f" / {float(1 << 60)}) * 2.0 - 1.0").fetchone()[0] for i in range(4)]
    n = math.sqrt(sum(x * x for x in want_raw))
    want = [x / n for x in want_raw]
    for g, w in zip(got, want):
        assert g == pytest.approx(w, rel=1e-6)


def test_chunk_embed_pool_retrieval_roundtrip(spark, sf_dir):
    """The full plumbing: chunk → embed → mean-pool → exact ANN. A
    document's pooled vector must retrieve ITSELF as rank 1 when the
    query set is built from the same pooled vectors."""
    from kafi_spark.functions.similarity import cosine_topk, mean_pool_embeddings

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    chunk_vecs = em.embed_chunks(docs, max_tokens=16, dim=32)
    assert chunk_vecs.columns == ["doc_id", "chunk_id", "start_token",
                                  "embedding"]
    pooled = mean_pool_embeddings(chunk_vecs, "doc_id")
    queries = pooled.filter("doc_id < 5").select(
        F.col("doc_id").alias("query_id"), "embedding")
    hits = cosine_topk(pooled.withColumnRenamed("doc_id", "vec_id"),
                       queries, k=1)
    got = {r.query_id: r.vec_id for r in hits.collect()}
    assert got == {i: i for i in range(5)}


def test_model_embedder_is_gated():
    with pytest.raises(ImportError):
        em.model_embedder("any-model", dim=8)
