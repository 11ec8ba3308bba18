"""Salted join equivalence with plain join under a hot key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows


def test_salted_join_matches_plain(spark):
    from kafi_spark.functions.skew import salted_join

    # 90% of left rows share key 0 (the hot key); right has multiplicity
    left = spark.createDataFrame(
        [(0, i) for i in range(90)] + [(i, 1000 + i) for i in range(1, 11)],
        "k long, lv long",
    )
    right = spark.createDataFrame(
        [(0, "a"), (0, "b"), (1, "c"), (99, "zz")], "k long, rv string"
    )
    for how in ("inner", "left"):
        want = rows(left.join(right, "k", how), "k", "lv", "rv")
        got = rows(salted_join(left, right, "k", how), "k", "lv", "rv")
        assert got == want, how
    # hot key actually scatters across salts
    salted = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8))
    )
    n_salts = salted.filter("k = 0").select("__salt").distinct().count()
    assert n_salts > 1


def test_salted_join_rejects_outer(spark):
    from kafi_spark.functions.skew import salted_join

    df = spark.createDataFrame([(1, 1)], "k long, v long")
    with pytest.raises(ValueError):
        salted_join(df, df, "k", how="full")
