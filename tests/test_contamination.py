"""Benchmark decontamination — fixed cases + DuckDB differential."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafi_spark.functions.contamination import contamination_report, decontaminate


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the model was evaluated on the held out benchmark split"),
            (2, "completely unrelated text about cooking pasta al dente"),
            (3, "was evaluated on the held"),  # exactly one 5-gram of bench
            (4, "short"),
        ],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(
        [(100, "the model was evaluated on the held out test data")],
        "doc_id long, text string",
    )


def test_contamination_report(corpus, bench):
    got = {
        r.doc_id: r.n_contaminated_ngrams
        for r in contamination_report(corpus, bench, n=5).collect()
    }
    # doc 1 shares the 5-gram window sliding over the common prefix
    # "the model was evaluated on the held out" (8 words -> 4 shared 5-grams)
    assert got[1] == 4
    assert got[3] == 1
    assert 2 not in got and 4 not in got


def test_decontaminate_drops_hits(corpus, bench):
    kept = {r.doc_id for r in decontaminate(corpus, bench, n=5).collect()}
    assert kept == {2, 4}


def test_short_benchmark_prompt_matches_verbatim_copy(spark, corpus):
    # benchmark doc shorter than n words -> its full text is the gram;
    # a corpus doc CONTAINING those words as a window should NOT match
    # (windows are n words), but the verbatim short doc itself should.
    bench = spark.createDataFrame([(7, "short")], "doc_id long, text string")
    got = {r.doc_id for r in contamination_report(corpus, bench, n=5).collect()}
    assert got == {4}


def test_contamination_matches_duckdb(spark, sf_dir):
    import duckdb

    from kafi_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corp = docs.filter(F.col("doc_id") % 20 != 0)
    got = sorted(
        (r.doc_id, r.n_contaminated_ngrams)
        for r in contamination_report(corp, bench, n=5).collect()
    )
    assert got, "planted near-duplicates should contaminate"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(
        con.sql(
            r"""
            WITH sh AS (
              SELECT doc_id,
                     unnest(list_distinct(list_transform(
                       range(0, greatest(len(ws) - 5, 0) + 1),
                       i -> array_to_string(ws[i+1:i+5], ' ')))) AS gram
              FROM (SELECT doc_id,
                           regexp_extract_all(text, '\S+') AS ws
                    FROM documents)
            ),
            bg AS (SELECT DISTINCT gram FROM sh WHERE doc_id % 20 = 0),
            cg AS (SELECT doc_id, gram FROM sh WHERE doc_id % 20 != 0)
            SELECT doc_id, count(*) AS n_contaminated_ngrams
            FROM cg JOIN bg USING (gram)
            GROUP BY doc_id
            """
        ).fetchall()
    )
    assert got == want


def test_empty_benchmark_is_noop(spark, corpus):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert contamination_report(corpus, empty, n=5).count() == 0
    assert decontaminate(corpus, empty, n=5).count() == corpus.count()


def test_contamination_matches_python_oracle_hypothesis(spark):
    """Differential vs a brute-force Python n-gram set intersection over
    small random word documents."""
    import itertools
    import random

    rnd = random.Random(7)
    vocab = ["a", "b", "c", "d", "e"]
    def doc(n): return " ".join(rnd.choice(vocab) for _ in range(n))
    corpus_rows = [(i, doc(rnd.randint(1, 12))) for i in range(20)]
    bench_rows = [(100 + i, doc(rnd.randint(1, 12))) for i in range(4)]
    n = 3

    def grams(t):
        ws = t.split()
        if len(ws) <= n:
            return {" ".join(ws)}
        return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}

    bench_set = set(itertools.chain.from_iterable(grams(t) for _, t in bench_rows))
    want = {}
    for i, t in corpus_rows:
        hits = len(grams(t) & bench_set)
        if hits:
            want[i] = hits

    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    got = {r.doc_id: r.n_contaminated_ngrams
           for r in contamination_report(corpus, bench, n=n).collect()}
    assert got == want


# ------------------------------------------------- embedding-space gate


@pytest.fixture(scope="module")
def emb_corpus(spark):
    """4 corpus vectors: two aligned with eval directions (planted
    leaks, one verbatim, one slightly rotated), one orthogonal, one
    null."""
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),       # verbatim eval vector
        (2, [0.99, 0.14, 0.0, 0.0]),     # paraphrase-ish: cos ~0.99
        (3, [0.0, 0.0, 0.0, 1.0]),       # orthogonal to eval
        (4, None),                       # no signal
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def emb_bench(spark):
    return spark.createDataFrame(
        [(100, [2.0, 0.0, 0.0, 0.0]),    # scale-invariant: unit-normed
         (101, [0.0, 1.0, 0.0, 0.0])],
        "eval_id long, embedding array<float>")


def test_semantic_contamination_report(spark, emb_corpus, emb_bench):
    from kafi_spark.functions.contamination import (
        semantic_contamination_report)

    hits = {r.vec_id: r.max_eval_sim for r in semantic_contamination_report(
        emb_corpus, emb_bench, threshold=0.95).collect()}
    assert set(hits) == {1, 2}
    assert hits[1] == pytest.approx(1.0, abs=1e-6)
    assert 0.95 < hits[2] < 1.0


def test_semantic_decontaminate_survivors_and_null_policy(
        spark, emb_corpus, emb_bench):
    from kafi_spark.functions.contamination import semantic_decontaminate

    kept = {r.vec_id for r in semantic_decontaminate(
        emb_corpus, emb_bench, threshold=0.95).collect()}
    # orthogonal survives; null embedding survives (no evidence)
    assert kept == {3, 4}
    # a looser threshold keeps everything below it
    assert {r.vec_id for r in semantic_decontaminate(
        emb_corpus, emb_bench, threshold=1.01).collect()} == {1, 2, 3, 4}


def test_semantic_contamination_matches_numpy_oracle(spark, sf_dir):
    import numpy as np

    from kafi_spark.functions.contamination import (
        semantic_contamination_report)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bench = emb.filter("vec_id % 97 = 0").selectExpr(
        "vec_id as eval_id", "embedding")
    got = {r.vec_id: r.max_eval_sim for r in semantic_contamination_report(
        emb, bench, threshold=0.8).collect()}

    P = emb.toPandas()
    X = np.stack(P["embedding"].to_numpy())
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    sel = (P["vec_id"] % 97 == 0).to_numpy()
    sims = (X @ X[sel].T).max(axis=1)
    want = {int(i): float(s)
            for i, s in zip(P["vec_id"], sims) if s >= 0.8}
    assert set(got) == set(want)
    for k in got:
        assert got[k] == pytest.approx(want[k], abs=1e-6)


def test_semantic_eval_cap_guard(spark, emb_corpus, emb_bench):
    from kafi_spark.functions.contamination import (
        semantic_contamination_report)

    with pytest.raises(ValueError, match="eval_cap"):
        semantic_contamination_report(emb_corpus, emb_bench, eval_cap=1)


def test_semantic_empty_benchmark_is_noop(spark, emb_corpus):
    """Empty or all-null benchmark: nothing is contaminated; the full
    corpus survives (no numpy crash on the empty matrix)."""
    from kafi_spark.functions.contamination import (
        semantic_contamination_report, semantic_decontaminate)

    empty = spark.createDataFrame([], "eval_id long, embedding array<float>")
    allnull = spark.createDataFrame(
        [(1, None)], "eval_id long, embedding array<float>")
    for bench in (empty, allnull):
        assert semantic_contamination_report(
            emb_corpus, bench, threshold=0.5).count() == 0
        assert semantic_decontaminate(
            emb_corpus, bench, threshold=0.5).count() == emb_corpus.count()
