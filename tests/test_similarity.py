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


# --- semantic dedup (SemDeDup-style) ---------------------------------------


@pytest.fixture(scope="module")
def planted(spark):
    """60 well-separated base vectors + 20 planted near-copies (tiny
    perturbation → cosine ≈ 1): every planted pair is a semantic dup."""
    import random as _r

    rng = _r.Random(7)
    data, dup_pairs = [], set()
    vid = 0
    for i in range(60):
        base = [rng.gauss(0, 1) for _ in range(16)]
        data.append((vid, [float(x) for x in base]))
        base_id = vid
        vid += 1
        if i < 20:
            pert = [float(x + rng.gauss(0, 0.001)) for x in base]
            data.append((vid, pert))
            dup_pairs.add((base_id, vid))
            vid += 1
    df = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    return df, dup_pairs


def test_semantic_dedup_pairs_recall_and_precision(planted):
    df, dup_pairs = planted
    got = {(r.id_1, r.id_2)
           for r in sim.semantic_dedup_pairs(df, threshold=0.999,
                                             n_clusters=6).collect()}
    # near-identical vectors share a kmeans cell: high recall expected
    assert len(got & dup_pairs) / len(dup_pairs) >= 0.9
    # every reported pair is genuinely above threshold (exact rescore
    # within cluster → precision 1.0 against the exact all-pairs)
    exact = {(r.id_1, r.id_2)
             for r in sim.embedding_neardup_pairs(df, threshold=0.999,
                                                  exact=True).collect()}
    assert got <= exact


def test_semantic_dedup_keeps_one_per_group(planted):
    df, dup_pairs = planted
    kept = sim.semantic_dedup(df, threshold=0.999, n_clusters=6)
    kept_ids = {r.vec_id for r in kept.collect()}
    assert kept.columns == df.columns
    # at least one survivor per planted pair, never both for pairs the
    # clustering caught
    caught = {(a, b) for (a, b) in dup_pairs
              if not ({a, b} <= kept_ids)}
    assert len(caught) / len(dup_pairs) >= 0.9
    for a, b in dup_pairs:
        assert a in kept_ids or b in kept_ids


def test_block_pairs_group_col_restricts_pairing(spark):
    """With group_col, rows in different groups are never compared even
    when identical."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0), (3, [1.0, 0.0], 1)],
        "vec_id long, embedding array<float>, cell int")
    got = {(r.id_1, r.id_2)
           for r in sim._block_pairs_exact(df, "vec_id", "embedding",
                                           0.99, 2, group_col="cell").collect()}
    assert got == {(1, 2)}


def test_mean_pool_embeddings(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (1, [3.0, 4.0]), (2, [5.0, 6.0])],
        "doc_id long, embedding array<float>")
    got = {r.doc_id: r.embedding
           for r in sim.mean_pool_embeddings(df, "doc_id").collect()}
    assert got[1] == pytest.approx([2.0, 3.0])
    assert got[2] == pytest.approx([5.0, 6.0])


def test_kmeans_empty_training_sample_raises_clearly():
    import numpy as np
    import pytest as _pytest

    from kafi_spark.functions.similarity import _kmeans_np

    with _pytest.raises(ValueError, match="empty training sample"):
        _kmeans_np(np.zeros((0, 4)), n_codes=4, seed=0)


def test_prototypicality_scores_shape_and_range(spark, sf_dir):
    from kafi_spark.functions.similarity import prototypicality_scores

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = prototypicality_scores(emb, n_clusters=8)
    rows = out.collect()
    assert out.columns == ["vec_id", "embedding", "cell", "proto_score"]
    assert len(rows) == emb.count()
    assert all(-1.0 - 1e-6 <= r.proto_score <= 1.0 + 1e-6 for r in rows)
    assert {r.cell for r in rows} <= set(range(8))
    # determinism (seeded centroids, pure scoring)
    again = {r.vec_id: (r.cell, r.proto_score)
             for r in prototypicality_scores(emb, n_clusters=8).collect()}
    for r in rows:
        assert again[r.vec_id] == (r.cell, r.proto_score)


def test_prototype_prune_policies(spark, sf_dir):
    from kafi_spark.functions.similarity import (
        prototype_prune, prototypicality_scores)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    hard = prototype_prune(emb, keep_frac=0.5, n_clusters=8).collect()
    easy = prototype_prune(emb, keep_frac=0.5, n_clusters=8,
                           policy="keep_easy").collect()
    # approximate halves (sketch cuts; ties may wobble a few rows)
    assert 0.35 * n <= len(hard) <= 0.65 * n
    assert 0.35 * n <= len(easy) <= 0.65 * n
    # the two policies partition by difficulty: within any cell, every
    # kept-hard score <= every kept-easy score (they can share only the
    # cut value itself)
    from collections import defaultdict
    h, e = defaultdict(list), defaultdict(list)
    for r in hard:
        h[r.cell].append(r.proto_score)
    for r in easy:
        e[r.cell].append(r.proto_score)
    for c in set(h) & set(e):
        assert max(h[c]) <= min(e[c]) + 1e-9
    # keep_frac=1.0 is the identity on scored rows
    assert len(prototype_prune(emb, keep_frac=1.0,
                               n_clusters=8).collect()) == n
    import pytest as _pt
    with _pt.raises(ValueError):
        prototype_prune(emb, keep_frac=0.0)
    with _pt.raises(ValueError):
        prototype_prune(emb, policy="bogus")


def test_prototypicality_null_embeddings(spark):
    from kafi_spark.functions.similarity import (
        prototype_prune, prototypicality_scores)

    df = spark.createDataFrame(
        [(i, [float(i % 4), 1.0]) for i in range(40)] + [(99, None)],
        "vec_id long, embedding array<float>")
    scored = {r.vec_id: r for r in prototypicality_scores(
        df, n_clusters=4).collect()}
    assert len(scored) == 41
    assert scored[99].cell is None and scored[99].proto_score is None
    # null-safe filters: the null row drops from any pruned output
    kept = {r.vec_id for r in prototype_prune(
        df, keep_frac=0.5, n_clusters=4).collect()}
    assert 99 not in kept


def test_zero_norm_vectors_score_zero_not_null(spark):
    """Round-6 review: cosine_topk's kernel lacked the den==0 guard its
    siblings have — zero vectors yielded NaN→null scores and a zero
    QUERY produced an all-null ranking."""
    from kafi_spark.functions.similarity import cosine_topk

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0])], "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 0.0])], "query_id long, embedding array<float>")
    out = cosine_topk(corpus, queries, k=2).collect()
    assert all(r["score"] is not None for r in out)
    z = {(r["query_id"], r["vec_id"]): r["score"] for r in out}
    assert z[(10, 2)] == 0.0 and z[(11, 1)] == 0.0


def test_kmeans_assign_drops_null_embeddings(spark):
    """Round-6 review: a single null embedding used to kill the whole
    semantic-dedup job with an executor-side numpy shape error; nulls
    now drop up front (the family's standard policy)."""
    from kafi_spark.functions.similarity import kmeans_assign

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = kmeans_assign(df, 2)
    assert sorted(r["vec_id"] for r in out.collect()) == [1, 3]


def test_cosine_column_zero_vector_scores_zero(spark):
    """Round-9 review: the Column-side cosine returned NULL for a
    zero-norm vector (ANSI-off division by zero) while every numpy
    kernel scores 0.0 — threshold filters silently dropped the row.
    One convention: zero vector scores 0.0; null vector stays null."""
    from kafi_spark.functions.similarity import cosine

    df = spark.createDataFrame(
        [(1, [1.0, 0.0], [0.0, 0.0]),
         (2, [1.0, 0.0], [1.0, 0.0]),
         (3, [1.0, 0.0], None)],
        "i long, a array<double>, b array<double>")
    got = {r.i: r.c for r in df.select(
        "i", cosine(F.col("a"), F.col("b")).alias("c")).collect()}
    assert got[1] == 0.0
    assert got[2] == pytest.approx(1.0)
    assert got[3] is None


def test_block_pairs_n_blocks_validated(spark):
    """Round-9 review: n_blocks=0 made every block key NULL and the
    exact pair set silently EMPTY — semantic dedup then kept every row.
    Must refuse loudly."""
    from kafi_spark.functions.similarity import (
        embedding_neardup_pairs, semantic_dedup_pairs)

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0])],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="n_blocks"):
        embedding_neardup_pairs(df, threshold=0.9, exact=True,
                                n_blocks=0).collect()
    with pytest.raises(ValueError, match="n_blocks"):
        semantic_dedup_pairs(df, threshold=0.9, n_clusters=1,
                             n_blocks=0).collect()


def test_quantized_rescore_ignores_null_duplicate_query_row(spark):
    """Round-9 review: the exact-rescore join read the RAW queries
    frame, so a duplicated query_id carrying one null-vector row fed
    __qvec=None into the cosine kernel. The join must see the same
    null-filtered projection as the stage-1 closure."""
    from kafi_spark.functions.similarity import cosine_topk_quantized

    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0, 0.0]), (11, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (1, None)],
        "query_id long, embedding array<double>")
    out = cosine_topk_quantized(corpus, queries, k=1)
    rows = out.collect()
    assert [(r.query_id, r.vec_id) for r in rows] == [(1, 10)]
