"""Protobuf wire codec conformance + Spark bridge tests.

Golden byte vectors come from the protobuf encoding documentation
(developers.google.com/protocol-buffers/docs/encoding): the `08 96 01`
varint example, the "testing" string example, the nested-message example,
and the canonical packed-repeated example.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafi_spark.sources import protobuf_wire as pw


# ---------------------------------------------------------------------------
# Spec golden vectors
# ---------------------------------------------------------------------------

def test_varint_150_golden():
    m = pw.parse_proto("syntax = \"proto3\"; message Test1 { int32 a = 1; }")
    assert pw.encode({"a": 150}, m) == bytes.fromhex("089601")
    assert pw.decode(bytes.fromhex("089601"), m)["a"] == 150


def test_string_testing_golden():
    m = pw.parse_proto("message Test2 { string b = 2; }")
    want = bytes.fromhex("120774657374696e67")
    assert pw.encode({"b": "testing"}, m) == want
    assert pw.decode(want, m)["b"] == "testing"


def test_nested_message_golden():
    src = """
    message Test1 { int32 a = 1; }
    message Test3 { Test1 c = 3; }
    """
    m = pw.parse_proto(src, message="Test3")
    want = bytes.fromhex("1a03089601")
    assert pw.encode({"c": {"a": 150}}, m) == want
    assert pw.decode(want, m)["c"] == {"a": 150}


def test_packed_repeated_golden():
    m = pw.parse_proto("message Test4 { repeated int32 d = 4; }")
    want = bytes.fromhex("2206038e029ea705")
    assert pw.encode({"d": [3, 270, 86942]}, m) == want
    assert pw.decode(want, m)["d"] == [3, 270, 86942]


def test_unpacked_repeated_decodes_too():
    # pre-proto3 writers emit one tag per element; readers must accept both
    m = pw.parse_proto("message T { repeated int32 d = 1; }")
    unpacked = bytes.fromhex("0803" "08" "8e02")
    assert pw.decode(unpacked, m)["d"] == [3, 270]


def test_zigzag_spec_table():
    assert [pw._zigzag(v) for v in (0, -1, 1, -2, 2147483647, -2147483648)] == \
        [0, 1, 2, 3, 4294967294, 4294967295]
    for v in (0, -1, 1, -2, 63, -64, 2**62, -(2**62)):
        assert pw._unzigzag(pw._zigzag(v)) == v


def test_negative_int32_is_ten_byte_varint():
    m = pw.parse_proto("message T { int32 a = 1; }")
    b = pw.encode({"a": -2}, m)
    assert b == bytes.fromhex("08feffffffffffffffff01")
    assert pw.decode(b, m)["a"] == -2


# ---------------------------------------------------------------------------
# Codec semantics
# ---------------------------------------------------------------------------

_KITCHEN = """
syntax = "proto3";
package demo;

message Inner { sint64 delta = 1; bytes blob = 2; }

enum Color { COLOR_UNSET = 0; RED = 1; BLUE = 2; }

message Sink {
  string name = 1;
  int64 count = 2;
  double ratio = 3;
  bool on = 4;
  Color color = 5;
  Inner inner = 6;
  repeated string tags = 7;
  repeated Inner items = 8;
  map<string, int32> hits = 9;
  fixed64 f64 = 10;
  sfixed32 s32 = 11;
  float f = 12;
  oneof choice { string s_choice = 13; int32 i_choice = 14; }
  uint32 u32 = 15;
}
"""


@pytest.fixture(scope="module")
def sink():
    return pw.parse_proto(_KITCHEN, message="Sink")


def test_kitchen_sink_roundtrip(sink):
    v = {
        "name": "alpha", "count": -77, "ratio": 2.5, "on": True,
        "color": "BLUE", "inner": {"delta": -3, "blob": b"\x00\xff"},
        "tags": ["x", "y"], "items": [{"delta": 1, "blob": b""}, {"delta": -9, "blob": b"q"}],
        "hits": {"a": 1, "b": -2}, "f64": 2**63 + 5, "s32": -12,
        "f": 0.5, "s_choice": "pick-me", "u32": 4000000000,
    }
    got = pw.decode(pw.encode(v, sink), sink)
    assert got["name"] == "alpha" and got["count"] == -77 and got["on"] is True
    assert got["color"] == "BLUE"
    assert got["inner"] == {"delta": -3, "blob": b"\x00\xff"}
    assert got["tags"] == ["x", "y"]
    assert got["items"][1] == {"delta": -9, "blob": b"q"}
    assert got["hits"] == {"a": 1, "b": -2}
    assert got["f64"] == 2**63 + 5  # uint64 round-trips at full range in dicts
    assert got["s32"] == -12 and math.isclose(got["f"], 0.5)
    assert got["s_choice"] == "pick-me" and got["u32"] == 4000000000


def test_proto3_defaults_omitted_and_refilled(sink):
    assert pw.encode({"name": "", "count": 0, "on": False, "tags": []}, sink) == b""
    got = pw.decode(b"", sink)
    assert got["name"] == "" and got["count"] == 0 and got["on"] is False
    assert got["ratio"] == 0.0 and got["color"] == "COLOR_UNSET"
    assert got["tags"] == [] and got["hits"] == {}
    assert got["inner"] is None  # message presence is meaningful


def test_unknown_fields_skipped():
    writer = pw.parse_proto("message W { int32 a = 1; string extra = 9; double d = 8; }")
    reader = pw.parse_proto("message R { int32 a = 1; }")
    data = pw.encode({"a": 7, "extra": "ignored", "d": 1.5}, writer)
    assert pw.decode(data, reader) == {"a": 7}


def test_unknown_enum_number_surfaces_as_decimal_string(sink):
    """Round-8 review: the Spark bridge types enum fields as string, so
    a raw int for an unknown number mixed types in the pandas column
    and killed the whole Arrow batch — the schema-evolution case
    (producer adds a value) enums must survive. Unknown numbers now
    surface as their decimal string, protobuf-JSON style."""
    raw = pw.encode({"color": 42}, sink)
    assert pw.decode(raw, sink)["color"] == "42"


def test_multiple_top_level_needs_message_kwarg():
    with pytest.raises(ValueError, match="multiple top-level"):
        pw._as_mdef("message A { int32 a = 1; } message B { int32 b = 1; }")


# ---------------------------------------------------------------------------
# Confluent framing
# ---------------------------------------------------------------------------

def test_message_indexes_default_is_single_zero():
    assert pw.message_indexes_bytes(None) == b"\x00"
    assert pw.message_indexes_bytes([0]) == b"\x00"
    assert pw.read_message_indexes(b"\x00rest") == ([0], 1)


def test_message_indexes_zigzag_roundtrip():
    b = pw.message_indexes_bytes([1, 2])
    idx, used = pw.read_message_indexes(b + b"payload")
    assert idx == [1, 2] and used == len(b)


# ---------------------------------------------------------------------------
# Spark bridge
# ---------------------------------------------------------------------------

_EVENT = """
message Event {
  int64 event_id = 1;
  string event_type = 2;
  double value = 3;
  repeated string tags = 4;
}
"""


def test_spark_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "click", 0.5, ["a"]), (2, "view", -1.25, [])],
        "event_id long, event_type string, value double, tags array<string>",
    )
    enc = pw.to_protobuf_df(
        df.select(F.struct("event_id", "event_type", "value", "tags").alias("v")),
        "v", _EVENT)
    assert dict(enc.dtypes)["v"] == "binary"
    dec = pw.from_protobuf_df(enc, "v", _EVENT)
    got = sorted((r.v.event_id, r.v.event_type, r.v.value, list(r.v.tags))
                 for r in dec.collect())
    assert got == [(1, "click", 0.5, ["a"]), (2, "view", -1.25, [])]


def test_spark_confluent_framing_roundtrip(spark):
    df = spark.createDataFrame([(7, "x", 1.0, [])],
                               "event_id long, event_type string, value double, tags array<string>")
    enc = pw.to_protobuf_df(
        df.select(F.struct("event_id", "event_type", "value", "tags").alias("v")),
        "v", _EVENT, confluent_id=123)
    raw = bytes(enc.first()["v"])
    assert raw[0] == 0 and int.from_bytes(raw[1:5], "big") == 123 and raw[5] == 0
    dec = pw.from_protobuf_df(enc, "v", _EVENT, confluent=True)
    assert dec.first()["v"].event_id == 7


def test_proto_to_spark_types(sink):
    t = pw.proto_to_spark(sink)
    s = {f.name: f.dataType.simpleString() for f in t.fields}
    assert s["name"] == "string" and s["count"] == "bigint"
    assert s["color"] == "string" and s["u32"] == "bigint"
    assert s["inner"] == "struct<delta:bigint,blob:binary>"
    assert s["tags"] == "array<string>"
    assert s["hits"] == "map<string,int>"
    assert s["s32"] == "int" and s["f"] == "float"


# ---------------------------------------------------------------- round 6


def test_parse_proto_with_options():
    """Round-6 review: '[' was never tokenized, so any .proto carrying
    field/enum/map options failed to parse."""
    src = """
    syntax = "proto3";
    message M {
      repeated int32 a = 1 [packed = true];
      map<string, int64> m = 2 [(custom.opt) = "x"];
      E e = 3 [deprecated = true];
    }
    enum E { E_UNSPECIFIED = 0 [(custom.ev) = 1]; E_ONE = 1; }
    """
    mdef = pw.parse_proto(src, "M")
    data = {"a": [1, 2, 3], "m": {"k": 9}, "e": "E_ONE"}
    assert pw.decode(pw.encode(data, mdef), mdef) == data


def test_uint64_above_signed_range_wraps_in_spark_bridge(spark):
    """Round-6 review: codec-level decode keeps uint64 unsigned, but the
    Spark bridge maps it to LongType — values past 2^63-1 used to blow
    up the Arrow conversion; the documented contract wraps them."""
    mdef = pw.parse_proto("message U { uint64 v = 1; }")
    big = (1 << 64) - 5
    raw = pw.encode({"v": big}, mdef)
    assert pw.decode(raw, mdef) == {"v": big}  # codec stays unsigned
    df = spark.createDataFrame([(bytearray(raw),)], "p binary")
    out = pw.from_protobuf_df(df, "p", mdef).collect()
    assert out[0]["p"]["v"] == big - (1 << 64)  # signed wrap, no crash


def test_oneof_field_options_are_skipped():
    """Round-8 review: a [json_name=...] option inside a oneof derailed
    the parser (the '[' was consumed as the next field's type)."""
    m = pw._as_mdef('message K { oneof kind { string a = 1 '
                    '[json_name = "x"]; int32 b = 2; } }')
    raw = pw.encode({"a": "hi"}, m)
    assert pw.decode(raw, m)["a"] == "hi"


def test_uint64_map_keys_wrap_to_signed():
    """Round-8 review: map<uint64,...> VALUES wrapped into signed-long
    range for the Spark bridge but KEYS did not — a key >= 2^63
    overflowed Spark's LongType map key in the Arrow conversion."""
    wrapped = pw._wrap_uint64({2**63: "v", 1: "w"})
    assert set(wrapped) == {-(2**63), 1}
