"""Scale probe: operators at ~100× the unit-test corpus, generated
entirely executor-side (spark.range + column expressions — no driver
data, no collect of inputs). Not a benchmark — a correctness-shaped
check that the plans hold up when the data is 50k documents instead of
500: counts come back exact, dedup math stays consistent, and nothing
driver-side blows up. Runtime is bounded to keep the suite fast."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def big_corpus(spark):
    """50k documents: ~16 words each from a 50-word vocabulary, with a
    planted EXACT-duplicate cohort (every 100th doc repeats doc 0's
    text) — generated as pure column expressions."""
    n = 50_000
    words = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda i: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(F.col("id"), i), F.lit(50))
        ),
    )
    base = spark.range(n).select(
        F.col("id").alias("doc_id"), F.array_join(words, " ").alias("text")
    )
    dup_text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda i: F.concat(
                F.lit("w"), F.pmod(F.xxhash64(F.lit(0).cast("long"), i), F.lit(50))
            ),
        ),
        " ",
    )
    return base.select(
        "doc_id",
        F.when(F.col("doc_id") % 100 == 0, dup_text).otherwise(F.col("text"))
        .alias("text"),
    )


def test_exact_dedup_at_50k(big_corpus):
    from kafi_spark.functions.dedup import dedup_exact

    out = dedup_exact(big_corpus, "text", "doc_id")
    stats = out.agg(
        F.count(F.lit(1)).alias("groups"),
        F.sum("n_copies").alias("total"),
        F.max("n_copies").alias("biggest"),
    ).first()
    assert stats.total == 50_000
    # the planted cohort: 500 copies of doc 0's text collapse to one
    assert stats.biggest >= 500
    keeper = out.orderBy(F.col("n_copies").desc()).first()
    assert keeper.doc_id == 0


def test_span_dedup_at_50k(big_corpus):
    from kafi_spark.functions.spans import span_dedup

    out = span_dedup(big_corpus, span_tokens=8, keep="first")
    # survivors never exceed input docs; the duplicate cohort's spans
    # survive only in their first occurrence
    n = out.count()
    assert 0 < n <= 50_000
    # reassembled text of the planted keeper retains both its spans
    k = out.filter("doc_id = 0").first()
    assert k is not None and k.n_spans_kept == 2


def test_bloom_at_50k(spark, big_corpus):
    from kafi_spark.functions.bloom import bloom_build, bloom_new, bloom_params

    m, k = bloom_params(25_000, 0.001)
    hist = big_corpus.filter("doc_id % 2 = 0").select("text")
    batch = big_corpus.filter("doc_id % 2 = 1")
    filt = bloom_build(hist, "text", m, k)
    survivors = bloom_new(batch, filt, "text", m, k).count()
    # odd ids are distinct from even-id texts except hash luck: nearly
    # all pass; the 0.1% FP budget bounds the loss
    assert survivors >= 24_000
