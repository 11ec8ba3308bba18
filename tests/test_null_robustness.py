"""Null/empty-text robustness sweep: every text-family operator must
survive a corpus containing NULL, empty, and whitespace-only documents
without raising — silently skipping or null-scoring them per its
documented semantics. Production corpora always contain such rows; an
operator that crashes on them fails the whole job."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def dirty(spark):
    return spark.createDataFrame(
        [(1, "normal document with several plain words"),
         (2, None),
         (3, ""),
         (4, "   "),
         (5, "the and of to in a is it filler words everywhere")],
        "doc_id long, text string")


def test_text_stats_handles_dirty(dirty):
    from kafi_spark.functions.text import text_stats

    rows = {r.doc_id: r for r in text_stats(dirty).collect()}
    assert len(rows) == 5
    assert rows[3].n_tokens == 0 and rows[4].n_tokens == 0


def test_dedup_families_handle_dirty(dirty):
    from kafi_spark.functions.dedup import (
        dedup_exact, minhash_lsh_pairs, ngram_jaccard_pairs, simhash_pairs)

    assert dedup_exact(dirty, "text", "doc_id").count() >= 3
    ngram_jaccard_pairs(dirty, "text", "doc_id", threshold=0.5).count()
    minhash_lsh_pairs(dirty, "text", "doc_id").count()
    simhash_pairs(dirty, "text", "doc_id").count()


def test_span_family_handles_dirty(dirty):
    from kafi_spark.functions.spans import (
        boilerplate_filter, chunk_text, line_dedup, span_dedup)

    out = span_dedup(dirty, span_tokens=3)
    assert out.filter(F.col("doc_id").isin(1, 5)).count() == 2
    # null docs come back unchanged from the line-keyed ops too — the
    # family contract (they used to silently disappear, r8 review)
    lines = {r.doc_id: r for r in line_dedup(dirty).collect()}
    assert lines[2].text is None and lines[2].n_spans_kept == 0
    boiler = {r.doc_id: r for r in boilerplate_filter(dirty).collect()}
    assert boiler[2].text is None and boiler[2].n_lines_kept == 0
    chunks = chunk_text(dirty, max_tokens=4)
    # null/empty/whitespace docs emit NO chunk rows
    assert {r.doc_id for r in chunks.collect()} == {1, 5}
    assert chunks.filter(F.col("chunk").isNull()).count() == 0


def test_selection_and_quality_handle_dirty(dirty):
    from kafi_spark.functions.classify import score_text
    from kafi_spark.functions.importance import (
        importance_weights, lm_quality_score)
    from kafi_spark.functions.text import gopher_filter

    ref = dirty.filter("doc_id in (1, 5)")
    importance_weights(dirty, ref, n_buckets=256).count()
    lm_quality_score(dirty, ref, n_buckets=256).count()
    kept = {r.doc_id for r in gopher_filter(dirty).collect()}
    assert 2 not in kept and 3 not in kept       # no words -> fails rules
    scored = {r.doc_id: r.score for r in score_text(dirty, "text").collect()}
    assert scored[2] == 0 and scored[3] == 0     # reference null contract


def test_search_and_bpe_handle_dirty(dirty):
    from kafi_spark.functions.bpe import bpe_encode, train_bpe, word_histogram
    from kafi_spark.functions.search import bm25_topk

    q = dirty.sparkSession.createDataFrame(
        [(1, "plain words"), (2, None)], "query_id long, query string")
    hits = bm25_topk(dirty, q, k=3)
    assert hits.filter("query_id = 1").count() > 0
    assert hits.filter("query_id = 2").count() == 0   # null query -> no terms
    hist = word_histogram(dirty)
    merges = train_bpe(hist, vocab_size=50)
    enc = {r.doc_id: r.n_tokens for r in bpe_encode(dirty, merges).collect()}
    assert enc[2] == 0 and enc[3] == 0 and enc[1] > 0


def test_bloom_and_contamination_handle_dirty(dirty, tmp_path):
    from kafi_spark.functions.bloom import bloom_build, bloom_contains
    from kafi_spark.functions.contamination import decontaminate

    filt = bloom_build(dirty.select("text"), "text", 512, 3)
    bloom_contains(dirty, filt, "text", 512, 3).count()
    decontaminate(dirty, dirty.filter("doc_id = 5").select("doc_id", "text")).count()


def test_sketch_families_handle_nulls(spark):
    """HLL/theta/KLL/CMS all ignore null keys/values (the DataSketches
    aggregates skip nulls; CMS filters them) — estimates equal those
    over the non-null subset, never a crash or a phantom key."""
    from kafi_spark.functions import sketches as sk

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (None, 30.0), (4, 40.0), (None, None)],
        "k long, v double")
    assert sk.distinct_sketch(df, "k").select(
        sk.estimate()).first()["distinct_est"] == 3
    assert sk.theta_sketch(df, "k").select(
        sk.theta_estimate()).first()["distinct_est"] == 3
    out = sk.quantile_values(
        sk.quantile_sketch(df, "v"), [0.5], "double").first()
    assert out["n"] == 3  # null values not absorbed
    cms = sk.cms_sketch(df, "k")
    got = {
        r["k"]: r["est"] for r in sk.cms_estimate(
            cms, df.filter(F.col("k").isNotNull()).select("k").distinct(),
            "k").collect()
    }
    assert got == {1: 1, 2: 1, 4: 1}


def test_skipindex_handles_null_rows(spark, tmp_path):
    """Null cells in an indexed column are skipped at build; lookups of
    real keys in files that also contain nulls stay exact."""
    from kafi_spark.functions import skipindex as si

    out = str(tmp_path / "nulls")
    spark.createDataFrame(
        [(1, "a"), (None, "b"), (3, None), (4, "d")],
        "id long, s string",
    ).repartition(2).write.parquet(out)
    si.build_skip_index(spark, out, ["id", "s"], num_bits=1 << 12)
    assert [r["s"] for r in
            si.pruned_point_read(spark, out, "id", [4]).collect()] == ["d"]
    assert [r["id"] for r in
            si.pruned_point_read(spark, out, "s", ["b"]).collect()] == [None]


def test_round5_operators_handle_dirty(dirty, spark):
    from kafi_spark.functions.dedup import dedup_against, minhash_lsh_join
    from kafi_spark.functions.importance import perplexity_buckets
    from kafi_spark.functions.profile import corpus_report
    from kafi_spark.functions.quality import quality_fit, quality_score

    ref = dirty.filter("doc_id in (1, 5)")

    # CCNet bucketing: null/empty docs get null score AND null band
    rows = {r.doc_id: r for r in perplexity_buckets(
        dirty, ref, n_buckets=256, accuracy=100).collect()}
    assert len(rows) == 5
    for i in (2, 3, 4):
        assert rows[i].lm_score is None and rows[i].ppl_bucket is None

    # dataset card: dirty rows counted, no raise, sane values
    rep = {(r.section, r.metric): r.value
           for r in corpus_report(dirty).collect()}
    assert int(rep[("global", "rows")]) == 5
    assert float(rep[("global", "dup_rate")]) >= 0.0

    # cross-corpus LSH join: dirty rows simply can't match
    assert minhash_lsh_join(dirty, ref, threshold=0.5).filter(
        "left_id in (2, 3, 4)").count() == 0
    kept = {r.doc_id for r in dedup_against(dirty, ref).collect()}
    assert {2, 3, 4} <= kept                       # null/empty survive

    # trainable classifier: null-text training rows dropped, scoring
    # nulls score null (both documented policies)
    model = quality_fit(dirty.filter("doc_id in (1, 5)"), dirty,
                        max_iter=3, n_features=256)
    scored = {r.doc_id: r.quality_prob
              for r in quality_score(model, dirty).collect()}
    for i in (2, 3, 4):
        assert scored[i] is None


def test_round5_embedding_ops_handle_dirty(spark):
    from kafi_spark.functions.contamination import semantic_decontaminate

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>")
    bench = spark.createDataFrame(
        [(9, [1.0, 0.0]), (10, None)],
        "eval_id long, embedding array<float>")
    # null benchmark vectors are dropped from the matrix; null corpus
    # vectors survive the gate (no evidence)
    kept = {r.vec_id for r in semantic_decontaminate(
        corpus, bench, threshold=0.95).collect()}
    assert kept == {2, 3}


def test_ann_family_drops_null_embeddings(spark):
    """The in-memory ANN entry points enforce the same null-embedding
    policy as the persisted index (ann_index.py): a null vector is
    dropped at entry, never fed to a numpy kernel (where it dies as an
    opaque vstack shape error mid-job) — r8 session review."""
    from kafi_spark.functions.similarity import (
        cosine_topk, cosine_topk_ivf, cosine_topk_lsh,
        cosine_topk_quantized, embedding_neardup_pairs,
        quantize_embeddings)

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.9, 0.1]), (4, [0.0, 1.0])],
        "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(9, [1.0, 0.0]), (10, None)],
        "query_id long, embedding array<float>")

    out = cosine_topk(corpus, queries, k=2).collect()
    assert {r.query_id for r in out} == {9}
    assert all(r.vec_id != 2 for r in out)
    assert {r.vec_id for r in quantize_embeddings(corpus).collect()} == {1, 3, 4}
    assert {r.query_id for r in
            cosine_topk_quantized(corpus, queries, k=2).collect()} == {9}
    assert {r.query_id for r in
            cosine_topk_lsh(corpus, queries, dim=2, k=2).collect()} == {9}
    assert {r.query_id for r in cosine_topk_ivf(
        corpus, queries, k=2, n_cells=2, n_probe=2).collect()} == {9}
    pairs = embedding_neardup_pairs(corpus, threshold=0.9, exact=True).collect()
    assert {(r.id_1, r.id_2) for r in pairs} == {(1, 3)}
    pairs_lsh = embedding_neardup_pairs(
        corpus, threshold=0.9, dim=2, n_planes=4, n_tables=4).collect()
    assert all(2 not in (r.id_1, r.id_2) for r in pairs_lsh)


def test_lsh_plane_capacity_guard(spark):
    from kafi_spark.functions.similarity import (
        _hyperplanes, lsh_signature, lsh_signatures_udf)

    with pytest.raises(ValueError, match="64"):
        lsh_signatures_udf([_hyperplanes(4, 65, 1)])
    with pytest.raises(ValueError, match="63"):
        lsh_signature(F.col("v"), _hyperplanes(4, 64, 1))
    # 64 planes per long is legal in the vectorized path (bit 63 is the
    # sign bit — signatures are equality-only keys)
    lsh_signatures_udf([_hyperplanes(4, 64, 1)])


def test_lsh_plane_63_participates_in_bucketing(spark):
    """Data-level proof of the 64-plane packing (round-9 ADVICE: the
    capacity test only CONSTRUCTED the UDF; int64 wraparound at bit 63
    was asserted in a comment): with axis-aligned planes, two vectors
    differing only in the plane-63 coordinate's sign must pack to
    signatures differing in exactly bit 63 — distinct buckets, no
    aliasing onto plane 0."""
    from kafi_spark.functions.similarity import lsh_signatures_udf

    planes = [[1.0 if j == p else 0.0 for j in range(64)]
              for p in range(64)]
    a = [1.0] * 64
    b = [1.0] * 63 + [-1.0]
    df = spark.createDataFrame(
        [(1, a), (2, b)], "vid long, v array<float>")
    sigs = {r.vid: r.s[0] for r in df.select(
        "vid", lsh_signatures_udf([planes])(F.col("v")).alias("s")
    ).collect()}
    assert sigs[1] != sigs[2]
    diff = (sigs[1] ^ sigs[2]) & ((1 << 64) - 1)
    assert diff == 1 << 63
    # bit 63 makes the packed long negative — legal, equality-only key
    assert sigs[2] >= 0 > sigs[1] or sigs[1] >= 0 > sigs[2]
