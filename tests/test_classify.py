"""Text classification / scoring — operator units + the reference's
end-to-end enrichment flow (classify.py:1-27): consume a JSON topic,
score each document, attach a typed sentiment struct, produce protobuf.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from kafi_spark.functions.classify import (
    fear_index_col,
    lexicon_fear_index,
    score_text,
    transformers_scorer,
)


def test_lexicon_scorer_units():
    assert lexicon_fear_index(["market crash and panic today"]) == [40]
    assert lexicon_fear_index([None, "", "calm sunny day"]) == [0, 0, 0]
    assert lexicon_fear_index(["crash crash crash"]) == [100]
    # punctuation stripped before lookup
    assert lexicon_fear_index(["big loss, then fear!"]) == [50]


def test_score_text_pandas_path(spark):
    df = spark.createDataFrame(
        [(1, "market crash and panic today"), (2, "all fine"), (3, None)],
        "doc_id long, text string",
    )
    got = dict(
        (r.doc_id, r.score) for r in score_text(df, "text").collect()
    )
    assert got == {1: 40, 2: 0, 3: 0}


def test_fear_index_column_expr_matches_pandas_scorer(spark, sf_dir):
    """The pure-Column formulation and the Arrow scorer agree on the real
    documents corpus."""
    from kafi_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    both = score_text(docs, "text", out_col="py_score").withColumn(
        "col_score", fear_index_col(F.col("text"))
    )
    diff = both.filter(F.col("py_score") != F.col("col_score")).count()
    assert diff == 0


def test_fear_index_edge_whitespace_matches_python(spark):
    """Leading/trailing non-space whitespace must not inflate the word
    count (F.trim strips only spaces; empty split tokens are dropped)."""
    samples = [None, "", "bad\n", "\ncrash here", "  crash  ", "\t\n"]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "i long, text string"
    )
    got = dict(
        (r.i, r.f)
        for r in df.select("i", fear_index_col(F.col("text")).alias("f")).collect()
    )
    assert got == dict(enumerate(lexicon_fear_index(samples)))


def test_transformers_scorer_gated():
    with pytest.raises(NotImplementedError):
        transformers_scorer("any-model")


def test_classify_flow_json_to_protobuf(spark, tmp_path):
    """The reference's classify flow (classify.py:16-27) on this engine:
    JSON-valued topic -> score -> typed sentiment struct -> protobuf
    topic, via cp(transform=...) between FS topics."""
    from kafi_spark.sources.fs_topic import FSTopicStorage
    from kafi_spark.sources.protobuf_wire import from_protobuf_df, to_protobuf_df

    proto = """
    syntax = "proto3";
    message Scored {
      string text = 1;
      message Sentiment { string model = 1; int32 score = 2; }
      Sentiment sentiment = 3;
    }
    """
    store = FSTopicStorage(spark, str(tmp_path / "store"))
    store.create("scraped_json", partitions=1)
    docs = [{"text": "market crash and panic today"}, {"text": "fine day"}]
    src = spark.createDataFrame(
        [(None, json.dumps(d).encode()) for d in docs],
        "key binary, value binary",
    )
    store.produce("scraped_json", src)
    store.create("scored_protobuf", partitions=1)

    def enrich(df):
        parsed = df.withColumn(
            "v", F.from_json(F.col("value").cast("string"), "text string")
        )
        scored = score_text(parsed, "v.text", out_col="score")
        packed = scored.withColumn(
            "msg",
            F.struct(
                F.col("v.text").alias("text"),
                F.struct(
                    F.lit("lexicon").alias("model"),
                    F.col("score").alias("score"),
                ).alias("sentiment"),
            ),
        )
        return to_protobuf_df(packed, "msg", proto, message="Scored").select(
            "key", F.col("msg").alias("value")
        )

    store.cp("scraped_json", store, "scored_protobuf", transform=enrich)

    back = from_protobuf_df(
        store.consume("scored_protobuf"), "value", proto, message="Scored"
    ).select("value.text", "value.sentiment.*")
    got = {r.text: (r.model, r.score) for r in back.collect()}
    assert got == {
        "market crash and panic today": ("lexicon", 40),
        "fine day": ("lexicon", 0),
    }


def test_fear_index_col_unicode_whitespace_parity(spark):
    """Round-8 review: Java's bare \\s is ASCII-only while the Python
    twin's str.split() breaks on Unicode whitespace — an NBSP-joined
    'fear\\u00a0panic' scored 0 in the Column form and 100 in Python.
    (?U) closes the divergence; differential over the tricky cases."""
    texts = ["fear panic", "crash loss", "calm day",
             "fear panic", "", None, "  crash  "]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string")
    got = {r["id"]: r["s"] for r in
           df.select("id", fear_index_col(F.col("text")).alias("s")).collect()}
    want = dict(enumerate(lexicon_fear_index(texts)))
    assert got == want
