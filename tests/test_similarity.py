from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafi_spark.functions import similarity as sim
from tests.conftest import rows


@pytest.fixture(scope="module")
def vectors(spark):
    # axis-aligned + diagonal vectors with known cosines
    data = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [1.0, 1.0, 0.0, 0.0]),   # cos with 0 = 1/sqrt(2)
        (3, [2.0, 0.0, 0.0, 0.0]),   # cos with 0 = 1.0
        (4, [-1.0, 0.0, 0.0, 0.0]),  # cos with 0 = -1.0
    ]
    return spark.createDataFrame(data, "vec_id long, embedding array<float>")


def test_dot_and_norm(spark):
    df = spark.createDataFrame([([1.0, 2.0], [3.0, 4.0])], "a array<float>, b array<float>")
    r = df.select(
        sim.dot(F.col("a"), F.col("b")).alias("d"),
        sim.l2_norm(F.col("a")).alias("n"),
        sim.cosine(F.col("a"), F.col("b")).alias("c"),
    ).collect()[0]
    assert r.d == pytest.approx(11.0)
    assert r.n == pytest.approx(math.sqrt(5))
    assert r.c == pytest.approx(11.0 / (math.sqrt(5) * 5.0))


def test_cosine_topk(vectors):
    queries = vectors.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    corpus = vectors.filter(F.col("vec_id") != 0)
    out = sim.cosine_topk(corpus, queries, k=2)
    got = [(r.vec_id, r.rank) for r in out.orderBy("rank").collect()]
    assert got == [(3, 1), (2, 2)]  # cos: id3=1.0, id2=0.707, id1=0, id4=-1


def test_cosine_topk_lsh_recall_on_exact_match(vectors):
    queries = vectors.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    corpus = vectors.filter(F.col("vec_id") != 0)
    out = sim.cosine_topk_lsh(corpus, queries, dim=4, k=2, n_planes=4, n_tables=8)
    got = {r.vec_id for r in out.collect()}
    # id3 is colinear with the query -> identical signatures in every table
    assert 3 in got


def test_embedding_neardup_exact(vectors):
    pairs = sim.embedding_neardup_pairs(vectors, threshold=0.99, exact=True)
    got = {(r.id_1, r.id_2) for r in pairs.collect()}
    assert got == {(0, 3)}


def test_embedding_neardup_lsh(vectors):
    pairs = sim.embedding_neardup_pairs(
        vectors, threshold=0.99, exact=False, dim=4, n_planes=4, n_tables=8
    )
    got = {(r.id_1, r.id_2) for r in pairs.collect()}
    assert (0, 3) in got


def test_lsh_signatures_udf_deterministic(vectors, spark):
    tables = [sim._hyperplanes(4, 8, seed=7)]
    udf = sim.lsh_signatures_udf(tables)
    a = rows(vectors.select("vec_id", udf(F.col("embedding")).alias("s")))
    b = rows(vectors.select("vec_id", udf(F.col("embedding")).alias("s")))
    assert a == b
    # colinear vectors share signatures; opposite vectors flip every bit
    sigs = {vid: s[0] for vid, s in a}
    assert sigs[0] == sigs[3]
    assert sigs[0] != sigs[4]


def test_cosine_topk_ivf_recall(spark, sf_dir):
    from kafi_spark.functions.similarity import cosine_topk, cosine_topk_ivf
    from kafi_spark.session import read_table
    from pyspark.sql import functions as F

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(corpus, queries, k=5).collect()
    }
    ivf = {
        (r.query_id, r.vec_id)
        for r in cosine_topk_ivf(corpus, queries, k=5, n_cells=8, n_probe=4).collect()
    }
    # candidate pruning can only drop, never invent, neighbors — and with
    # half the cells probed recall should be high
    recall = len(ivf & exact) / len(exact)
    assert recall >= 0.7
    assert len(ivf) == len(exact)


def test_quantize_embeddings_roundtrip(spark, sf_dir):
    import numpy as np

    from kafi_spark.functions.similarity import quantize_embeddings
    from kafi_spark.session import read_table

    emb = read_table(spark, sf_dir, "embeddings").limit(20)
    q8 = quantize_embeddings(emb).collect()
    orig = {r.vec_id: np.asarray(r.embedding) for r in emb.collect()}
    assert len(q8) == len(orig)
    for r in q8:
        x = orig[r.vec_id]
        q = np.frombuffer(r.qvec, dtype=np.int8).astype(np.float64)
        assert len(q) == len(x)
        m = np.abs(x).max() or 1.0
        # dequantized cosine error is tiny: int8 rounding only
        num = float(q @ x)
        den = float(np.linalg.norm(q) * np.linalg.norm(x)) or 1.0
        assert num / den > 0.995


def test_cosine_topk_quantized_recall(spark, sf_dir):
    from kafi_spark.functions.similarity import cosine_topk, cosine_topk_quantized
    from kafi_spark.session import read_table
    from pyspark.sql import functions as F

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(corpus, queries, k=5).collect()
    }
    quant = cosine_topk_quantized(corpus, queries, k=5, rescore_factor=4).collect()
    got = {(r.query_id, r.vec_id) for r in quant}
    assert len(got) == len(exact)
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9  # int8 stage-1 + exact rescore: near-lossless
    # ranks are 1..5 per query after exact rescoring
    per_q = {}
    for r in quant:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())
