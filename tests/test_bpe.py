"""BPE tokenizer (kafi_spark.functions.bpe)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafi_spark.functions import bpe


def test_train_bpe_classic_example():
    # the canonical Sennrich toy: 'low' family — first merges build
    # frequent substrings
    hist = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe.train_bpe(hist, vocab_size=30)
    assert merges  # learned something
    # 'es' (from newest+widest, 9 occurrences) must be an early merge
    assert ("e", "s") in merges[:3]
    # deterministic
    assert merges == bpe.train_bpe(hist, vocab_size=30)


def test_encode_word_respects_merge_order():
    merges = [("e", "s"), ("es", "t" + bpe._EOW)]
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe._encode_word("test", ranks) == ["t", "est" + bpe._EOW]
    # unknown word falls back to characters
    assert bpe._encode_word("xy", ranks) == ["x", "y" + bpe._EOW]


def test_word_histogram_counts_and_cap(spark):
    df = spark.createDataFrame(
        [(1, "a a a b b c")], "doc_id long, text string")
    hist = bpe.word_histogram(df)
    assert hist == [("a", 3), ("b", 2), ("c", 1)]
    assert bpe.word_histogram(df, max_words=2) == [("a", 3), ("b", 2)]


def test_bpe_encode_roundtrip_and_counts(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    hist = bpe.word_histogram(df)
    merges = bpe.train_bpe(hist, vocab_size=200)
    enc = bpe.bpe_encode(df, merges)
    rows = enc.collect()
    assert len(rows) == 100
    # token concatenation reconstructs the original words exactly
    orig = {r.doc_id: r.text for r in df.collect()}
    for r in rows:
        rebuilt = "".join(r.tokens).replace(bpe._EOW, " ").rstrip()
        assert rebuilt == " ".join(orig[r.doc_id].split())
        assert r.n_tokens == len(r.tokens)
    # a trained vocab compresses: fewer tokens than characters, more
    # than (or equal to) words
    n_words = sum(len(t.split()) for t in orig.values())
    total = sum(r.n_tokens for r in rows)
    n_chars = sum(len(t.replace(" ", "")) for t in orig.values())
    assert n_words <= total < n_chars


def test_bpe_encode_deterministic(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    merges = bpe.train_bpe(bpe.word_histogram(df), vocab_size=100)
    a = {r.doc_id: tuple(r.tokens) for r in bpe.bpe_encode(df, merges).collect()}
    b = {r.doc_id: tuple(r.tokens) for r in bpe.bpe_encode(df, merges).collect()}
    assert a == b


def test_bpe_tokenize_then_pack_composition(spark, sf_dir):
    """The tokenize→pack path: real BPE token counts feed the packer;
    every pack respects the budget and covers every document."""
    from pyspark.sql import functions as F

    from kafi_spark.functions.packing import pack_documents

    df = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    merges = bpe.train_bpe(bpe.word_histogram(df), vocab_size=300)
    enc = bpe.bpe_encode(df, merges).select("doc_id", "n_tokens")
    packed = pack_documents(enc, "doc_id", "n_tokens", budget=256)
    rows = packed.collect()
    assert {r.doc_id for r in rows} == {r.doc_id for r in enc.collect()}
    per_pack = {}
    for r in rows:
        per_pack.setdefault(r.pack_id, []).append(r)
    for pid, members in per_pack.items():
        total = sum(m.n_tokens for m in members)
        assert all(m.pack_tokens == total for m in members)
        # a pack exceeds the budget only as a single oversized doc
        if total > 256:
            assert len(members) == 1


def test_bpe_save_load_roundtrip(spark, tmp_path):
    from kafi_spark.functions.bpe import (
        bpe_encode, load_bpe, save_bpe, train_bpe, word_histogram)

    df = spark.createDataFrame(
        [(1, "low lower lowest new newer newest"),
         (2, "low low newer newest")],
        "doc_id long, text string")
    merges = train_bpe(word_histogram(df), vocab_size=40)
    p = str(tmp_path / "merges.json")
    save_bpe(merges, p)
    back = load_bpe(p)
    assert back == merges                      # order preserved
    a = {r.doc_id: r.tokens for r in bpe_encode(df, merges).collect()}
    b = {r.doc_id: r.tokens for r in bpe_encode(df, back).collect()}
    assert a == b
    import pytest as _pt
    (tmp_path / "bad.json").write_text('{"format": "other"}')
    with _pt.raises(ValueError):
        load_bpe(str(tmp_path / "bad.json"))
