"""End-to-end flagship composition — the README's LLM-pipeline example,
run verbatim shape against the synthetic documents table. Pins the
public API the README promises (each stage's signature and the glue
between them) and the global invariants of the composed job: survivors
are curated docs only, every packed sequence respects the token budget,
splits partition the packed set, and the epoch order is deterministic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_readme_pipeline_composition(spark, sf_dir):
    from kafi_spark.functions.bpe import bpe_encode, train_bpe, word_histogram
    from kafi_spark.functions.mixing import (
        shuffle_deterministic, split_corpus)
    from kafi_spark.functions.packing import pack_documents
    from kafi_spark.functions.pipeline import curate_documents_extended
    from kafi_spark.functions.text import gopher_filter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    docs = gopher_filter(docs)                    # quality rules
    ev = docs.filter("doc_id < 5")
    clean = curate_documents_extended(            # dedup + decontam
        docs, eval_df=ev, decontam_n=8)
    assert clean.count() > 0

    merges = train_bpe(word_histogram(docs), vocab_size=300)
    toks = bpe_encode(docs.join(clean, "doc_id", "left_semi"), merges)
    packed = pack_documents(toks, "doc_id", "n_tokens", budget=512)

    # every pack respects the budget
    over = packed.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("t")).filter(F.col("t") > 512)
    assert over.count() == 0
    # packing preserved the curated set exactly
    assert packed.count() == clean.count()

    splits = split_corpus(packed, {"train": 8, "val": 1, "test": 1})
    n = {k: v.count() for k, v in splits.items()}
    assert sum(n.values()) == packed.count()
    assert n["train"] > n["val"] and n["train"] > n["test"]

    order1 = [r.doc_id for r in shuffle_deterministic(
        splits["train"], seed=0).select("doc_id").collect()]
    order2 = [r.doc_id for r in shuffle_deterministic(
        splits["train"], seed=0).select("doc_id").collect()]
    assert order1 == order2 and len(order1) == n["train"]
    assert sorted(order1) != order1               # actually shuffled


def test_dupheavy_corpus_builder(spark, sf_dir):
    """dupheavy_corpus (moved from bench.py in r13 so the harness stays
    measurement-only) plants `copies` suffix-perturbed near-copies of
    every `every`-th doc: exact row arithmetic, clone-id scheme, and the
    near-dup-not-exact-dup property the stress benches rely on."""
    from kafi_spark.functions.pipeline import dupheavy_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    n = docs.count()
    n_seed = docs.filter(F.col("doc_id") % 100 == 0).count()
    out = dupheavy_corpus(docs)
    assert out.count() == n + n_seed * 100
    # clone ids never collide with real ids and decode back to the seed
    clones = out.filter(F.col("doc_id") >= 1_000_000)
    assert clones.count() == n_seed * 100
    joined = clones.select(
        (F.col("doc_id") % 1_000_000).alias("seed_id"), "text")
    base = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("seed_id"), F.col("text").alias("base"))
    j = joined.join(base, "seed_id")
    assert j.count() == n_seed * 100
    # every clone is its seed text plus a UNIQUE " zq<n>" suffix: passes
    # exact dedup, caught by near-dup
    bad = j.filter(~F.col("text").startswith(F.col("base"))).count()
    assert bad == 0
    assert out.select("text").distinct().count() == out.count() - (
        docs.count() - docs.select("text").distinct().count())
