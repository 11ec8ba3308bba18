"""Bucketed co-located joins: the zero-Exchange property, verified."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    from kafi_spark.sources.bucketed import write_bucketed

    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "bk_a", ["k"], 4, path=str(tmp_path / "bk_a"))
    write_bucketed(b, "bk_b", ["k"], 4, path=str(tmp_path / "bk_b"))
    yield "bk_a", "bk_b"
    spark.sql("DROP TABLE IF EXISTS bk_a")
    spark.sql("DROP TABLE IF EXISTS bk_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    from kafi_spark.sources.bucketed import assert_no_shuffle_join, read_bucketed

    ta, tb = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_bucketed(spark, ta).join(read_bucketed(spark, tb), "k")
        j.write.format("noop").mode("overwrite").save()
        assert_no_shuffle_join(j)
        assert j.count() == 1000
        got = rows(j.filter(F.col("k") < 3), "k", "va", "vb")
        assert got == [(0, 0, 0), (1, 2, 3), (2, 4, 6)]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_same_join_does_shuffle(spark, bucketed_pair):
    """Control: the identical join over plain parquet plans an Exchange —
    proving the bucketed assertion is measuring bucketing, not luck."""
    from kafi_spark.sources.bucketed import assert_no_shuffle_join

    a = spark.range(0, 1000).select(F.col("id").alias("k"))
    b = spark.range(0, 1000).select(F.col("id").alias("k"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, "k")
        j.write.format("noop").mode("overwrite").save()
        with pytest.raises(AssertionError):
            assert_no_shuffle_join(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
