from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafi_spark import shell
from tests.conftest import rows


@pytest.fixture(scope="module")
def topic(spark):
    data = [
        (0, 0, "k1", "the quick brown fox"),
        (0, 1, "k2", "jumps over"),
        (1, 0, "k3", "the lazy dog"),
        (1, 1, "k1", "again and again"),
        (1, 2, None, ""),
    ]
    return spark.createDataFrame(data, "partition int, offset long, key string, value string")


def test_cat(topic):
    assert topic.count() == 5
    mapped = shell.cat(topic, map_fun=lambda df: [F.upper(F.col("value")).alias("v")])
    assert ("THE LAZY DOG",) in rows(mapped)


def test_cat_limit(topic):
    assert shell.cat(topic, n=3).count() == 3


def test_head_tail(topic):
    h = shell.head(topic, ["partition", "offset"], n=2).collect()
    assert [(r.partition, r.offset) for r in h] == [(0, 0), (0, 1)]
    t = shell.tail(topic, ["partition", "offset"], n=2).collect()
    assert [(r.partition, r.offset) for r in t] == [(1, 2), (1, 1)]


def test_grep(topic):
    out = shell.grep(topic, "the", cols=["value"])
    assert out.count() == 2
    capped = shell.grep(topic, "the", cols=["value"], n=1)
    assert capped.count() == 1


def test_grep_matches_key_too(topic):
    assert shell.grep(topic, "k1", cols=["key"]).count() == 2


def test_grep_stats(topic):
    r = shell.grep_stats(topic, "the", cols=["value"]).collect()[0]
    assert (r.n_matches, r.n_scanned) == (2, 5)


def test_wc(topic):
    r = shell.wc(topic, ["value"]).collect()[0]
    # words: 4 + 2 + 3 + 3 + 0 = 12; bytes = sum of utf-8 lengths
    assert r.n_messages == 5
    assert r.n_words == 12
    assert r.n_bytes == sum(len(v.encode()) for v in
                            ["the quick brown fox", "jumps over", "the lazy dog", "again and again", ""])


def test_wc_whitespace_edges_and_empty_topic(spark):
    """Review r7 (runtime-confirmed bugs): edge \n/\t grew phantom
    words ('hello world\n' counted 3), whitespace-only values counted 2,
    and sums over an EMPTY topic were NULL where the reference gives 0."""
    df = spark.createDataFrame(
        [("hello world\n",), ("\tfoo",), ("\n",)], "value string")
    r = shell.wc(df, ["value"]).collect()[0]
    assert r.n_words == 3  # 2 + 1 + 0
    empty = spark.createDataFrame([], "value string")
    r0 = shell.wc(empty, ["value"]).collect()[0]
    assert (r0.n_messages, r0.n_words, r0.n_bytes) == (0, 0, 0)
    g0 = shell.grep_stats(empty, "x", cols=["value"]).collect()[0]
    assert (g0.n_matches, g0.n_scanned) == (0, 0)


def test_stat(topic):
    assert shell.stat(topic).collect()[0].n_messages == 5
