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

from pyspark.sql import DataFrame, functions as F

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
    return (
        corpus_grams.join(F.broadcast(bench_grams), "shingle")
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
