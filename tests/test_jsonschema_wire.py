"""JSONSchema wire type: validate-on-read/write semantics
(reference: kafi/deserializer.py:71-80, kafi/serializer.py:90-105)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafi_spark.sources.jsonschema_wire import validate_json_df
from kafi_spark.sources.schema import decode_col

SCHEMA = {
    "type": "object",
    "properties": {
        "name": {"type": "string"},
        "calories": {"type": "number", "minimum": 0},
    },
    "required": ["name"],
    "additionalProperties": True,
}


def _df(spark):
    rows = [
        (b'{"name": "timtam", "calories": 80}',),
        (b'{"name": "oreo"}',),
        (b'{"calories": 53}',),          # missing required name
        (b'{"name": "x", "calories": -1}',),  # minimum violated
        (b'not json',),
    ]
    return spark.createDataFrame(rows, "value binary")


def test_flag_mode(spark):
    out = validate_json_df(_df(spark), "value", SCHEMA, mode="flag")
    flags = [r.value_valid for r in out.collect()]
    assert flags == [True, True, False, False, False]


def test_filter_mode_then_decode(spark):
    out = validate_json_df(_df(spark), "value", SCHEMA, mode="filter")
    typed = out.select(
        decode_col(F.col("value"), "json", "name string, calories long").alias("v")
    )
    got = sorted((r.v.name, r.v.calories) for r in typed.collect())
    assert got == [("oreo", None), ("timtam", 80)]


def test_error_mode(spark):
    ok = _df(spark).limit(2)
    assert validate_json_df(ok, "value", SCHEMA, mode="error").count() == 2
    with pytest.raises(Exception, match="jsonschema validation failed"):
        validate_json_df(_df(spark), "value", SCHEMA, mode="error").collect()


def test_bad_schema_rejected(spark):
    with pytest.raises(Exception):
        validate_json_df(_df(spark), "value", {"type": 12}, mode="flag")


def test_null_payloads_are_tombstones_not_failures(spark):
    """Round-6 review: a compacted topic's tombstones (null values) used
    to fail mode='error' and silently vanish under mode='filter'."""
    from kafi_spark.sources.jsonschema_wire import validate_json_df

    sch = {"type": "object", "properties": {"x": {"type": "integer"}},
           "required": ["x"]}
    df = spark.createDataFrame(
        [(b'{"x": 1}',), (None,), (b'{"nope": true}',)], "value binary")
    flagged = validate_json_df(df, "value", sch, mode="flag")
    got = {None if r["value"] is None else bytes(r["value"]): r["value_valid"]
           for r in flagged.collect()}
    assert got[b'{"x": 1}'] is True
    assert got[None] is None
    assert got[b'{"nope": true}'] is False
    kept = validate_json_df(df, "value", sch, mode="filter").collect()
    assert len(kept) == 2 and any(r["value"] is None for r in kept)
    ok = validate_json_df(
        df.filter("value IS NULL"), "value", sch, mode="error").collect()
    assert len(ok) == 1  # tombstone passes error mode untouched


def test_error_mode_fires_even_when_payload_never_projected(spark):
    """Round-8 review: the payload-column gate was PRUNED by Catalyst
    for queries that never consumed the payload (count(), key-only
    selects), silently skipping validation; the filter-predicate form
    is evaluated per row regardless of projection."""
    df = spark.createDataFrame(
        [("k1", b'{"n": 1}'), ("k2", b'{"n": "bad"}')],
        "key string, value binary")
    sch = {"type": "object", "properties": {"n": {"type": "integer"}},
           "required": ["n"]}
    out = validate_json_df(df, "value", sch, mode="error")
    with pytest.raises(Exception, match="jsonschema validation failed"):
        out.count()
    with pytest.raises(Exception, match="jsonschema validation failed"):
        out.select("key").collect()
    ok = validate_json_df(
        df.filter("key = 'k1'"), "value", sch, mode="error")
    assert ok.count() == 1
