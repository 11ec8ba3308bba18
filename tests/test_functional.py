from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafi_spark import functional as fn
from tests.conftest import rows


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(1, "a b"), (2, "c"), (3, "d e f")], "id long, text string"
    )


def test_fmap(df):
    out = fn.fmap(df, F.col("id"), (F.col("id") * 2).alias("dbl"))
    assert rows(out) == [(1, 2), (2, 4), (3, 6)]


def test_ffilter(df):
    assert rows(fn.ffilter(df, F.col("id") > 1), "id") == [(2,), (3,)]


def test_fflatmap(df):
    out = fn.fflatmap(df, F.split("text", " "), "word", keep=["id"])
    assert rows(out) == [
        (1, "a"), (1, "b"), (2, "c"), (3, "d"), (3, "e"), (3, "f"),
    ]


def test_foldl_as_agg(df):
    r = fn.foldl(df, F.sum("id").alias("s"), F.count(F.lit(1)).alias("n")).collect()[0]
    assert (r.s, r.n) == (6, 3)


def test_fmap_py(df):
    out = fn.fmap_py(df, lambda r: {"id": r["id"], "n": len(r["text"])}, "id long, n long")
    assert rows(out) == [(1, 3), (2, 1), (3, 5)]


def test_ffilter_py(df):
    out = fn.ffilter_py(df, lambda r: r["id"] % 2 == 1)
    assert rows(out, "id") == [(1,), (3,)]


def test_fflatmap_py(df):
    out = fn.fflatmap_py(
        df,
        lambda r: [{"id": r["id"], "word": w} for w in r["text"].split()],
        "id long, word string",
    )
    assert rows(out) == [
        (1, "a"), (1, "b"), (2, "c"), (3, "d"), (3, "e"), (3, "f"),
    ]


def test_foldl_sequential(df):
    acc = fn.foldl_sequential(
        df, lambda acc, r: acc + [r["id"]], [], order_by=["id"]
    )
    assert acc == [1, 2, 3]


def test_foldl_sequential_break_and_cap(df):
    # break_fun checks BEFORE folding (reference storage_consumer.py:140-154)
    acc = fn.foldl_sequential(
        df, lambda a, r: a + [r["id"]], [],
        order_by=["id"], break_fun=lambda r: r["id"] >= 3,
    )
    assert acc == [1, 2]
    acc = fn.foldl_sequential(
        df, lambda a, r: a + [r["id"]], [], order_by=["id"], n=2,
    )
    assert acc == [1, 2]
