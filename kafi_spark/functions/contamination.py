"""Benchmark decontamination — find and drop training documents that
leak evaluation data.

A standard step in large-scale training-data pipelines (public
methodology: GPT-3 appendix C, PaLM, Llama papers): a training document
is "contaminated" when it shares at least one word n-gram (n typically
8-13) with any document of an evaluation benchmark. Beyond the
reference surface — kafi has no corpus operators; this extends the
engine's LLM-pipeline layer alongside dedup/similarity.

Scale shape: the benchmark side (eval sets — thousands of docs) reduces
to a DISTINCT n-gram set that broadcasts; the corpus side is one
shingle explode + a broadcast hash join, so the 100 TB corpus is
scanned ONCE with no corpus-side shuffle before the (tiny) hit set
aggregates per document. No driver collect anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from kafi_spark.functions.dedup import shingles


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
) -> DataFrame:
    """Per contaminated corpus document: the number of DISTINCT word
    n-grams it shares with the benchmark set.

    Output: (``id_col``, n_contaminated_ngrams), only docs with ≥ 1 hit.
    Documents shorter than ``n`` words contribute their full text as a
    single gram (same convention as :func:`~kafi_spark.functions.dedup.
    shingles`, which both sides reuse — so a short benchmark prompt
    still matches its verbatim copy).
    """
    bench_grams = (
        shingles(
            benchmark,
            bench_text_col or text_col,
            bench_id_col or id_col,
            k=n,
        )
        .select("shingle")
        .distinct()
    )
    corpus_grams = shingles(corpus, text_col, id_col, k=n)
    # no compile-time broadcast hint (review r7): a big benchmark suite
    # can carry ~10^7 distinct 8-grams — the forced hint would collect
    # it on the driver and OOM where AQE degrades to a shuffle join;
    # AQE still broadcasts automatically while the gram set is small
    # (the common case the docstring describes)
    return (
        corpus_grams.join(bench_grams, "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_ngrams"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
) -> DataFrame:
    """Corpus minus contaminated documents (anti-join on the report)."""
    hits = contamination_report(
        corpus, benchmark, n, text_col, id_col, bench_text_col, bench_id_col
    ).select(id_col)
    return corpus.join(hits, id_col, "left_anti")


def semantic_contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_vec_col: str | None = None,
    eval_cap: int = 200_000,
) -> DataFrame:
    """Embedding-space contamination: corpus rows whose maximum cosine
    similarity to ANY benchmark embedding reaches ``threshold``.

    The n-gram report catches verbatim leakage; paraphrased or
    reformatted eval data slips it. This is the embedding-side
    complement (the Llama/Phi-style "semantic decontamination" pass):
    benchmark embeddings are unit-normalized into ONE broadcast matrix
    (eval sets are small by nature; ``eval_cap`` guards the driver
    against a mistakenly-huge benchmark frame with a clear error, not
    an OOM), and the corpus is scanned once through an Arrow-batched
    max-similarity kernel — one BLAS matmul per batch, no corpus-side
    shuffle, no candidate join at all.

    Output: (``id_col``, max_eval_sim) for rows at/over the threshold.
    Null/ragged corpus embeddings score null and never report — a
    missing vector is no EVIDENCE of leakage; run the n-gram report for
    text-side coverage.
    """
    from kafi_spark.functions.similarity import _mat, _unit

    bvc = bench_vec_col or vec_col
    n_eval = benchmark.count()
    if n_eval > eval_cap:
        raise ValueError(
            f"benchmark has {n_eval} rows > eval_cap={eval_cap}; a "
            "benchmark this large would broadcast a huge matrix — raise "
            "eval_cap deliberately or pre-reduce the eval set")
    bench_pd = benchmark.select(F.col(bvc)).filter(
        F.col(bvc).isNotNull()).toPandas()[bvc]
    # ragged benchmark guard (mixed-dim eval sets unioned together):
    # np.vstack inside _mat would crash with an opaque shape error —
    # reject with the actual dimensions instead
    dims = {len(x) for x in bench_pd}
    if len(dims) > 1:
        raise ValueError(
            f"benchmark embeddings have mixed dimensions {sorted(dims)}; "
            "embed every eval set with one model (or split the report)")
    # empty/all-null benchmark: nothing can be contaminated — an empty
    # matrix must short-circuit here because _mat's vstack needs >= 1 row
    E = _unit(_mat(bench_pd)) if len(bench_pd) else np.zeros((0, 0))
    dim = E.shape[1] if E.size else 0
    bc = corpus.sparkSession.sparkContext.broadcast(E)

    @pandas_udf("double")
    def max_sim(v: pd.Series) -> pd.Series:
        mask = np.fromiter(
            (x is not None and len(x) == dim for x in v), bool, len(v))
        vals = np.full(len(v), np.nan)
        if bc.value.size and mask.any():
            X = _unit(_mat(v[mask]))
            vals[mask] = (X @ bc.value.T).max(axis=1)
        # Float64 (nullable) so no-signal rows arrive as SQL NULL, not
        # NaN — Spark orders NaN ABOVE every number, so a NaN would
        # pass the >= threshold gate and report a null embedding
        return pd.Series(vals).astype("Float64")

    scored = corpus.select(
        F.col(id_col), max_sim(F.col(vec_col)).alias("max_eval_sim"))
    return scored.filter(F.col("max_eval_sim") >= threshold)


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_vec_col: str | None = None,
    eval_cap: int = 200_000,
) -> DataFrame:
    """Corpus rows SURVIVING the embedding-space contamination gate
    (anti-join against :func:`semantic_contamination_report`; null
    embeddings survive — see the report's null policy)."""
    hits = semantic_contamination_report(
        corpus, benchmark, threshold, id_col, vec_col, bench_vec_col,
        eval_cap)
    return corpus.join(hits.select(id_col), id_col, "left_anti")
