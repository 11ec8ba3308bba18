from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafi_spark.functions import helpers as h
from tests.conftest import rows


def test_explode_normalize_nested(spark):
    data = [
        (1, [{"name": "a", "tags": ["x", "y"]}, {"name": "b", "tags": ["z"]}]),
    ]
    df = spark.createDataFrame(
        data, "id long, items array<struct<name string, tags array<string>>>"
    )
    out = h.explode_normalize(df)
    assert set(out.columns) == {"id", "items.name", "items.tags"}
    got = sorted((r["items.name"], r["items.tags"]) for r in out.collect())
    assert got == [("a", "x"), ("a", "y"), ("b", "z")]


def test_explode_normalize_flat_passthrough(spark):
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    assert rows(h.explode_normalize(df)) == [(1, "a")]


def test_get_set_path(spark):
    df = spark.createDataFrame(
        [((("x",),),)], "a struct<b struct<c string>>"
    )
    assert rows(df.select(h.get_path("a", ["b", "c"]).alias("v"))) == [("x",)]
    out = df.select(h.set_path(F.col("a"), ["b", "c"], F.lit("y")).alias("a"))
    assert rows(out.select(h.get_path("a", ["b", "c"]).alias("v"))) == [("y",)]


def test_base64_roundtrip(spark):
    df = spark.createDataFrame([(b"hello",)], "v binary")
    out = df.select(h.from_base64(h.to_base64(F.col("v"))).alias("v"))
    assert bytes(out.collect()[0].v) == b"hello"


def test_millis_roundtrip(spark):
    df = spark.createDataFrame([("2021-01-01 00:00:00",)], "iso string")
    ms = df.select(h.to_millis(F.col("iso")).alias("ms"))
    assert ms.collect()[0].ms == 1609459200000
    back = ms.select(h.from_millis(F.col("ms")).alias("ts"))
    assert str(back.collect()[0].ts) == "2021-01-01 00:00:00"


def test_hash_struct_deterministic(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], "x long, y string")
    out = df.select(h.hash_struct(F.struct("x", "y")).alias("h"))
    vals = [r.h for r in out.collect()]
    assert vals[0] == vals[1] != vals[2]


def test_default_partition_stable_and_in_range(spark):
    df = spark.createDataFrame([(f"k{i}".encode(),) for i in range(100)], "key binary")
    out = df.select(h.default_partition(F.col("key"), 8).alias("p"))
    ps = [r.p for r in out.collect()]
    assert all(0 <= p < 8 for p in ps)
    assert len(set(ps)) > 1  # spreads


def test_pattern_match():
    names = ["orders", "orders_raw", "_internal", "customers"]
    assert h.pattern_match(names, "orders*") == ["orders", "orders_raw"]
    assert h.pattern_match(names, None) == sorted(names)
    assert h.pattern_match(names, ["c*", "_*"]) == ["_internal", "customers"]
    assert h.is_internal("_schemas") and not h.is_internal("orders")


def test_get_path_accepts_dotted_string(spark):
    df = spark.createDataFrame(
        [((("x",),),)], "a struct<b: struct<c: string>>")
    assert rows(df.select(h.get_path("a", "b.c").alias("v"))) == [("x",)]


def test_default_partition_null_key_is_null(spark):
    """Round-6 review: xxhash64(null) silently returned the seed,
    piling every keyless record into one constant partition; the caller
    round-robin coalesce needs to SEE the null."""
    df = spark.createDataFrame([(b"k",), (None,)], "key binary")
    ps = [r.p for r in df.select(
        h.default_partition(F.col("key"), 8).alias("p")).collect()]
    assert ps[0] is not None and ps[1] is None


def test_set_path_null_intermediate_raises_not_silently_drops(spark):
    """Round-8 review: withField on a null struct returns null, so a
    nested write through a null intermediate silently VANISHED for that
    row; it now raises with the path named."""
    from kafi_spark.functions.helpers import set_path

    df = spark.createDataFrame(
        [(1, ("x", ("en", 5))), (2, ("y", None))],
        "id int, doc struct<name:string, meta:struct<lang:string, n:int>>")
    ok = df.filter("id = 1").select(
        set_path(F.col("doc"), "meta.lang", F.lit("de")).alias("d")).first()
    assert ok["d"]["meta"]["lang"] == "de"
    assert ok["d"]["meta"]["n"] == 5      # siblings untouched
    assert ok["d"]["name"] == "x"
    with pytest.raises(Exception, match="set_path"):
        df.filter("id = 2").select(
            set_path(F.col("doc"), "meta.lang", F.lit("de"))).collect()
