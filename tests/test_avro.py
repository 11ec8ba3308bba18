"""Avro codec + Schema Registry client tests.

Conformance oracle: the Apache Avro Java library that ships in Spark's
classpath (avro-1.12.1.jar), reached over py4j — Java must round-trip our
bytes to identical bytes, and our decoder must read Java-written bytes.
Registry tests run against an in-process fake implementing the Confluent
REST subset the client speaks (mirrors the reference's test strategy of
hitting a live registry, test/test_single_storage_base.py SR tests).
"""

from __future__ import annotations

import json
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from kafi_spark.sources import avro
from kafi_spark.sources.schemaregistry import SchemaRegistryClient, SchemaRegistryError

SNACK = json.dumps({
    "type": "record", "name": "snack", "namespace": "test",
    "fields": [
        {"name": "name", "type": "string"},
        {"name": "calories", "type": "float"},
        {"name": "colour", "type": ["null", "string"], "default": None},
    ],
})

NESTED = json.dumps({
    "type": "record", "name": "order",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {"name": "customer", "type": {
            "type": "record", "name": "cust",
            "fields": [{"name": "cid", "type": "int"},
                       {"name": "vip", "type": "boolean"}]}},
        {"name": "pad", "type": {"type": "fixed", "name": "p4", "size": 4}},
        {"name": "state", "type": {"type": "enum", "name": "st",
                                   "symbols": ["NEW", "PAID", "SHIPPED"]}},
        {"name": "score", "type": ["null", "double"]},
        {"name": "blob", "type": "bytes"},
    ],
})


LOGICAL = json.dumps({
    "type": "record", "name": "lt",
    "fields": [
        {"name": "amount", "type": {"type": "bytes", "logicalType": "decimal",
                                    "precision": 10, "scale": 2}},
        {"name": "amt_fixed", "type": {"type": "fixed", "name": "d8", "size": 8,
                                       "logicalType": "decimal",
                                       "precision": 16, "scale": 4}},
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {"name": "tm", "type": {"type": "int", "logicalType": "time-millis"}},
        {"name": "tu", "type": {"type": "long", "logicalType": "time-micros"}},
        {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-millis"}},
        {"name": "tsu", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        {"name": "lts", "type": {"type": "long",
                                 "logicalType": "local-timestamp-micros"}},
        {"name": "u", "type": {"type": "string", "logicalType": "uuid"}},
        {"name": "maybe_ts", "type": ["null", {"type": "long",
                                               "logicalType": "timestamp-millis"}]},
    ],
})


def _logical_value(ts_none=False):
    import datetime as dt
    from decimal import Decimal

    utc = dt.timezone.utc
    return {
        "amount": Decimal("-12345.67"),
        "amt_fixed": Decimal("99.0001"),
        "d": dt.date(2024, 2, 29),
        "tm": dt.time(23, 59, 58, 123000),
        "tu": dt.time(0, 0, 0, 1),
        "ts": dt.datetime(2024, 6, 1, 12, 30, 0, 250000, tzinfo=utc),
        "tsu": dt.datetime(1969, 12, 31, 23, 59, 59, 999999, tzinfo=utc),
        "lts": dt.datetime(2024, 6, 1, 9, 0, 0, 5),
        "u": "f47ac10b-58cc-4372-a567-0e02b2c3d479",
        "maybe_ts": None if ts_none
        else dt.datetime(2030, 1, 1, 0, 0, tzinfo=utc),
    }


# ---------------------------------------------------------------------------
# codec units (no Spark)
# ---------------------------------------------------------------------------

def test_roundtrip_snack():
    v = {"name": "timtam", "calories": 80.0, "colour": None}
    buf = avro.encode(v, SNACK)
    assert avro.decode(buf, SNACK) == v


def test_roundtrip_nested():
    v = {"id": -42, "tags": ["a", "b"], "attrs": {"x": 1, "y": -9},
         "customer": {"cid": 7, "vip": True}, "pad": b"\x00\x01\x02\x03",
         "state": "PAID", "score": 1.5, "blob": b"\xff\x00"}
    buf = avro.encode(v, NESTED)
    assert avro.decode(buf, NESTED) == v


def test_roundtrip_extremes():
    sch = json.dumps({"type": "record", "name": "r",
                      "fields": [{"name": "a", "type": "long"},
                                 {"name": "b", "type": "string"},
                                 {"name": "c", "type": {"type": "array", "items": "long"}}]})
    for a in (0, 1, -1, 63, 64, -64, -65, 2**62, -(2**62), 2**63 - 1, -(2**63)):
        v = {"a": a, "b": "é漢\U0001f600", "c": []}
        assert avro.decode(avro.encode(v, sch), sch) == v


def test_union_branch_selection():
    sch = '["null", "long", "string"]'
    for v in (None, 5, "five"):
        assert avro.decode(avro.encode(v, sch), sch) == v
    with pytest.raises(TypeError):
        avro.encode(1.5, sch)


def test_reader_schema_evolution():
    writer = json.dumps({"type": "record", "name": "r",
                         "fields": [{"name": "a", "type": "int"},
                                    {"name": "gone", "type": "string"}]})
    reader = json.dumps({"type": "record", "name": "r",
                         "fields": [{"name": "a", "type": "long"},
                                    {"name": "added", "type": "string",
                                     "default": "dflt"}]})
    buf = avro.encode({"a": 3, "gone": "x"}, writer)
    assert avro.decode(buf, writer, reader) == {"a": 3, "added": "dflt"}


@pytest.mark.parametrize("ts_none", [False, True])
def test_roundtrip_logical_types(ts_none):
    v = _logical_value(ts_none)
    buf = avro.encode(v, LOGICAL)
    assert avro.decode(buf, LOGICAL) == v


def test_decimal_encoding_details():
    """Unscaled two's-complement bytes: minimal length for bytes-backed,
    sign-extended padding for fixed-backed; scale overflow rejected."""
    from decimal import Decimal

    bsch = json.dumps({"type": "bytes", "logicalType": "decimal",
                       "precision": 10, "scale": 2})
    for s, raw in [("1.27", b"\x7f"), ("1.28", b"\x00\x80"),
                   ("-1.28", b"\x80"), ("0.00", b"\x00"),
                   ("-0.01", b"\xff")]:
        # length prefix is a zigzag varint: small n encodes as 2n
        assert avro.encode(Decimal(s), bsch) == bytes((2 * len(raw),)) + raw
    assert avro.decode(avro.encode(Decimal("-0.01"), bsch), bsch) == Decimal("-0.01")
    with pytest.raises(ValueError):
        avro.encode(Decimal("0.001"), bsch)  # needs scale 3

    fsch = json.dumps({"type": "fixed", "name": "f4", "size": 4,
                       "logicalType": "decimal", "precision": 9, "scale": 0})
    assert avro.encode(Decimal(-2), fsch) == b"\xff\xff\xff\xfe"
    assert avro.encode(Decimal(2), fsch) == b"\x00\x00\x00\x02"
    with pytest.raises(ValueError):
        avro.encode(Decimal(2**40), fsch)  # overflows 4 bytes


def test_invalid_logical_annotation_falls_back_to_raw():
    # date on a long is not spec-valid -> raw long both directions
    sch = json.dumps({"type": "long", "logicalType": "date"})
    assert avro.decode(avro.encode(42, sch), sch) == 42
    # decimal without precision -> raw bytes
    sch2 = json.dumps({"type": "bytes", "logicalType": "decimal"})
    assert avro.decode(avro.encode(b"\x01", sch2), sch2) == b"\x01"


def test_logical_reader_controls_view():
    """A reader schema without the annotation sees the raw base value."""
    w = json.dumps({"type": "int", "logicalType": "date"})
    import datetime as dt

    buf = avro.encode(dt.date(1970, 1, 11), w)
    assert avro.decode(buf, w) == dt.date(1970, 1, 11)
    assert avro.decode(buf, w, '"int"') == 10


def test_avro_to_spark_logical_mapping():
    t = avro.avro_to_spark(LOGICAL)
    assert t.simpleString() == (
        "struct<amount:decimal(10,2),amt_fixed:decimal(16,4),d:date,"
        "tm:time(6),tu:time(6),ts:timestamp,tsu:timestamp,"
        "lts:timestamp_ntz,u:string,maybe_ts:timestamp>"
    )


def test_avro_to_spark_mapping():
    t = avro.avro_to_spark(NESTED)
    assert t.simpleString() == (
        "struct<id:bigint,tags:array<string>,attrs:map<string,bigint>,"
        "customer:struct<cid:int,vip:boolean>,pad:binary,state:string,"
        "score:double,blob:binary>"
    )


# ---------------------------------------------------------------------------
# Java conformance (avro-1.12.1.jar in Spark's classpath)
# ---------------------------------------------------------------------------

def _java_rewrite(spark, schema_json: str, payload: bytes) -> bytes:
    """Java decodes our bytes, re-encodes them: byte-identical means our
    writer follows the spec; our reader is then checked on Java's bytes."""
    jvm = spark._jvm
    sch = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    reader = jvm.org.apache.avro.generic.GenericDatumReader(sch)
    dec = jvm.org.apache.avro.io.DecoderFactory.get().binaryDecoder(
        bytearray(payload), None)
    rec = reader.read(None, dec)
    bos = jvm.java.io.ByteArrayOutputStream()
    enc = jvm.org.apache.avro.io.EncoderFactory.get().directBinaryEncoder(bos, None)
    jvm.org.apache.avro.generic.GenericDatumWriter(sch).write(rec, enc)
    enc.flush()
    return bytes(bos.toByteArray())


@pytest.mark.parametrize("schema,value", [
    (SNACK, {"name": "rocky", "calories": 12.5, "colour": "brown"}),
    (SNACK, {"name": "x", "calories": 0.0, "colour": None}),
    (NESTED, {"id": 2**40, "tags": [], "attrs": {}, "customer": {"cid": -1, "vip": False},
              "pad": b"abcd", "state": "NEW", "score": None, "blob": b""}),
    (LOGICAL, _logical_value()),
    (LOGICAL, _logical_value(ts_none=True)),
])
def test_java_conformance(spark, schema, value):
    mine = avro.encode(value, schema)
    theirs = _java_rewrite(spark, schema, mine)
    assert theirs == mine
    assert avro.decode(theirs, schema) == value


# ---------------------------------------------------------------------------
# fake Schema Registry (Confluent REST subset)
# ---------------------------------------------------------------------------

class _FakeSR:
    def __init__(self):
        self.by_id: dict[int, str] = {}
        self.by_guid: dict[str, int] = {}  # guid -> schema id
        self.subjects: dict[str, list[int]] = {}  # subject -> [schema ids]
        self.config: dict[str, str] = {"": "BACKWARD"}
        self._next = 1

    def register(self, subject: str, schema: str) -> int:
        ids = self.subjects.setdefault(subject, [])
        for i in ids:
            if json.loads(self.by_id[i]) == json.loads(schema):
                return i
        sid = self._next
        self._next += 1
        self.by_id[sid] = schema
        # real registries assign every schema an immutable GUID next to
        # the integer id (the id-in-headers wire resolves by it); a
        # name-based uuid5 keeps the fake deterministic
        self.by_guid[str(uuid.uuid5(uuid.NAMESPACE_URL, schema))] = sid
        ids.append(sid)
        return sid


def _make_server(state: _FakeSR):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # noqa: D102 - silence
            pass

        def _send(self, obj, status=200):
            body = json.dumps(obj).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            p = self.path.split("?")[0].strip("/").split("/")
            if p == ["subjects"]:
                return self._send(sorted(state.subjects))
            if len(p) == 3 and p[0] == "subjects" and p[2] == "versions":
                ids = state.subjects.get(p[1])
                if ids is None:
                    return self._send({"error_code": 40401, "message": "subject"}, 404)
                return self._send(list(range(1, len(ids) + 1)))
            if len(p) == 4 and p[0] == "subjects" and p[2] == "versions":
                ids = state.subjects.get(p[1])
                if ids is None:
                    return self._send({"error_code": 40401, "message": "subject"}, 404)
                v = len(ids) if p[3] == "latest" else int(p[3])
                if not 1 <= v <= len(ids):
                    return self._send({"error_code": 40402, "message": "version"}, 404)
                return self._send({"subject": p[1], "version": v, "id": ids[v - 1],
                                   "schema": state.by_id[ids[v - 1]]})
            if len(p) == 3 and p[:2] == ["schemas", "ids"]:
                sid = int(p[2])
                if sid not in state.by_id:
                    return self._send({"error_code": 40403, "message": "schema"}, 404)
                return self._send({"schema": state.by_id[sid]})
            if len(p) == 3 and p[:2] == ["schemas", "guids"]:
                sid = state.by_guid.get(p[2])
                if sid is None:
                    return self._send({"error_code": 40403, "message": "schema"}, 404)
                return self._send({"schema": state.by_id[sid], "guid": p[2]})
            if p[0] == "config":
                key = p[1] if len(p) > 1 else ""
                level = state.config.get(key, state.config[""])
                return self._send({"compatibilityLevel": level})
            return self._send({"error_code": 404, "message": "nope"}, 404)

        def _body(self):
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n)) if n else {}

        def do_POST(self):
            p = self.path.strip("/").split("/")
            if len(p) == 3 and p[0] == "subjects" and p[2] == "versions":
                sid = state.register(p[1], self._body()["schema"])
                return self._send({"id": sid})
            if len(p) == 2 and p[0] == "subjects":
                schema = self._body()["schema"]
                ids = state.subjects.get(p[1], [])
                for v, i in enumerate(ids, 1):
                    if json.loads(state.by_id[i]) == json.loads(schema):
                        return self._send({"subject": p[1], "version": v, "id": i,
                                           "schema": schema})
                return self._send({"error_code": 40403, "message": "not found"}, 404)
            if p[0] == "compatibility":
                # toy rule: compatible iff same record name
                subject = p[2]
                ids = state.subjects.get(subject, [])
                new = json.loads(self._body()["schema"])
                old = json.loads(state.by_id[ids[-1]]) if ids else new
                ok = old.get("name") == new.get("name")
                return self._send({"is_compatible": ok})
            return self._send({"error_code": 404, "message": "nope"}, 404)

        def do_PUT(self):
            p = self.path.strip("/").split("/")
            if p[0] == "config":
                level = self._body()["compatibility"]
                state.config[p[1] if len(p) > 1 else ""] = level
                return self._send({"compatibility": level})
            return self._send({"error_code": 404, "message": "nope"}, 404)

        def do_DELETE(self):
            p = self.path.split("?")[0].strip("/").split("/")
            if len(p) == 2 and p[0] == "subjects":
                ids = state.subjects.pop(p[1], [])
                return self._send(list(range(1, len(ids) + 1)))
            return self._send({"error_code": 404, "message": "nope"}, 404)

    return ThreadingHTTPServer(("127.0.0.1", 0), Handler)


@pytest.fixture()
def sr():
    state = _FakeSR()
    server = _make_server(state)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        yield SchemaRegistryClient(f"http://127.0.0.1:{server.server_address[1]}")
    finally:
        server.shutdown()


def test_sr_register_versions_lookup(sr):
    sid1 = sr.register("snack-value", SNACK)
    assert sr.register("snack-value", SNACK) == sid1  # idempotent
    sid2 = sr.register("snack-value", NESTED)
    assert sid2 != sid1
    assert sr.subjects() == ["snack-value"]
    assert sr.subjects("other*") == []
    assert sr.versions("snack-value") == [1, 2]
    latest = sr.get_version("snack-value")
    assert latest["version"] == 2 and latest["id"] == sid2
    assert json.loads(sr.get_by_id(sid1)) == json.loads(SNACK)
    assert sr.lookup("snack-value", SNACK)["version"] == 1
    assert sr.delete_subject("snack-value") == [1, 2]
    assert sr.subjects() == []


def test_sr_errors_and_config(sr):
    with pytest.raises(SchemaRegistryError) as ei:
        sr.versions("missing")
    assert ei.value.status == 404
    assert sr.compatibility_get() == "BACKWARD"
    assert sr.compatibility_set("FULL", "s1") == "FULL"
    assert sr.compatibility_get("s1") == "FULL"
    sr.register("s1", SNACK)
    assert sr.test_compatibility("s1", SNACK) is True


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

def test_from_to_avro_df(spark):
    rows = [("timtam", 80.0, "brown"), ("oreo", 53.0, None)]
    df = spark.createDataFrame(rows, "name string, calories float, colour string")
    from pyspark.sql import functions as F

    packed = avro.to_avro_df(
        df.select(F.struct("name", "calories", "colour").alias("v")), "v", SNACK)
    assert dict(packed.dtypes)["v"] == "binary"
    back = avro.from_avro_df(packed, "v", SNACK).select("v.*")
    assert sorted(back.collect()) == sorted(df.collect())


def test_from_to_avro_df_logical_types(spark):
    """Typed Spark columns (decimal/date/timestamp/timestamp_ntz/time)
    survive encode -> Avro binary -> decode unchanged."""
    import datetime as dt
    from decimal import Decimal

    from pyspark.sql import functions as F

    sch = json.dumps({
        "type": "record", "name": "lt2",
        "fields": [
            {"name": "amount", "type": {"type": "bytes", "logicalType": "decimal",
                                        "precision": 10, "scale": 2}},
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {"name": "ts", "type": ["null", {"type": "long",
                                             "logicalType": "timestamp-micros"}]},
            {"name": "lts", "type": {"type": "long",
                                     "logicalType": "local-timestamp-micros"}},
        ],
    })
    rows = [
        (Decimal("12.34"), dt.date(2024, 2, 29),
         dt.datetime(2024, 6, 1, 12, 30, 0, 250000), dt.datetime(2024, 6, 1, 9, 0)),
        (Decimal("-0.01"), dt.date(1969, 12, 31), None, dt.datetime(1970, 1, 1)),
    ]
    df = spark.createDataFrame(
        rows, "amount decimal(10,2), d date, ts timestamp, lts timestamp_ntz")
    packed = avro.to_avro_df(
        df.select(F.struct("amount", "d", "ts", "lts").alias("v")), "v", sch)
    assert dict(packed.dtypes)["v"] == "binary"
    back = avro.from_avro_df(packed, "v", sch).select("v.*")
    assert back.schema == df.schema
    key = lambda r: r[0]  # noqa: E731 - amount is unique per row
    assert sorted(back.collect(), key=key) == sorted(df.collect(), key=key)


def test_confluent_roundtrip_with_registry(spark, sr):
    sid = sr.register("snack-value", SNACK)
    rows = [("timtam", 80.0, "brown"), ("oreo", 53.0, None)]
    df = spark.createDataFrame(rows, "name string, calories float, colour string")
    from pyspark.sql import functions as F

    framed = avro.to_avro_df(
        df.select(F.struct("name", "calories", "colour").alias("v")), "v", SNACK,
        confluent_id=sid)
    first = bytes(framed.first()["v"])
    assert first[0] == 0 and int.from_bytes(first[1:5], "big") == sid
    back = avro.from_avro_df(framed, "v", confluent=True, registry=sr).select("v.*")
    assert sorted(back.collect()) == sorted(df.collect())


def test_confluent_guid_header_resolution(spark, sr):
    """The id-in-headers wire variant (kafi/deserializer.py:104-123):
    rows whose schema-id header is present resolve the writer by
    registry GUID and carry RAW Avro payloads; rows without the header
    fall back to the 5-byte frame — one frame can mix both."""
    from pyspark.sql import functions as F

    from kafi_spark.sources.schema import header_value

    sid = sr.register("snack-value", SNACK)
    guid = str(uuid.uuid5(uuid.NAMESPACE_URL, SNACK))
    assert json.loads(sr.get_by_guid(guid)) == json.loads(SNACK)
    header = b"\x01" + uuid.UUID(guid).bytes

    raw_payload = avro.encode({"name": "timtam", "calories": 80.0,
                               "colour": "brown"}, SNACK)
    framed_payload = avro.confluent_frame(
        avro.encode({"name": "oreo", "calories": 53.0, "colour": None},
                    SNACK), sid)
    frame = spark.createDataFrame(
        [(raw_payload, [("__value_schema_id", bytearray(header))]),
         (framed_payload, []),
         (None, [("__value_schema_id", bytearray(header))])],
        "value binary, headers array<struct<key:string,value:binary>>",
    )
    decoded = avro.from_avro_df(
        frame.withColumn("__sid", header_value(F.col("headers"),
                                               "__value_schema_id")),
        "value", confluent=True, registry=sr, guid_col="__sid",
        out="v",
    ).select("v.*")
    got = {r["name"]: (r["calories"], r["colour"])
           for r in decoded.collect()}
    assert got == {"timtam": (80.0, "brown"), "oreo": (53.0, None),
                   None: (None, None)}
    # reader inference also follows the header when the FIRST row has one
    inferred = avro.from_avro_df(
        frame.withColumn("__sid", header_value(F.col("headers"),
                                               "__value_schema_id")),
        "value", confluent=True, registry=sr, guid_col="__sid", out="v")
    assert "name" in inferred.schema["v"].dataType.fieldNames()
    with pytest.raises(ValueError, match="guid_col requires confluent"):
        avro.from_avro_df(frame, "value", SNACK, guid_col="__sid")
    with pytest.raises(SchemaRegistryError):
        sr.get_by_guid(str(uuid.uuid4()))  # unknown GUID -> 404


# ---------------------------------------------------------------------------
# logical-type property tests (hypothesis): encode/decode is identity
# ---------------------------------------------------------------------------

from datetime import date, datetime, time, timedelta, timezone  # noqa: E402

from hypothesis import given, settings, strategies as st  # noqa: E402

_DEC_SCHEMA = json.dumps({"type": "bytes", "logicalType": "decimal",
                          "precision": 20, "scale": 4})
_FIX_SCHEMA = json.dumps({"type": "fixed", "name": "d16", "size": 16,
                          "logicalType": "decimal", "precision": 30, "scale": 6})


@given(unscaled=st.integers(min_value=-(10**16), max_value=10**16))
@settings(max_examples=200, deadline=None)
def test_decimal_roundtrip_property(unscaled):
    import decimal

    v = decimal.Decimal(unscaled).scaleb(-4)
    assert avro.decode(avro.encode(v, _DEC_SCHEMA), _DEC_SCHEMA) == v
    w = decimal.Decimal(unscaled).scaleb(-6)
    assert avro.decode(avro.encode(w, _FIX_SCHEMA), _FIX_SCHEMA) == w


@given(days=st.integers(min_value=-700_000, max_value=2_900_000))
@settings(max_examples=200, deadline=None)
def test_date_roundtrip_property(days):
    sch = json.dumps({"type": "int", "logicalType": "date"})
    v = date(1970, 1, 1) + timedelta(days=days)
    assert avro.decode(avro.encode(v, sch), sch) == v


@given(us=st.integers(min_value=0, max_value=86_399_999_999))
@settings(max_examples=200, deadline=None)
def test_time_roundtrip_property(us):
    micro = json.dumps({"type": "long", "logicalType": "time-micros"})
    v = (datetime(1970, 1, 1) + timedelta(microseconds=us)).time()
    assert avro.decode(avro.encode(v, micro), micro) == v
    milli = json.dumps({"type": "int", "logicalType": "time-millis"})
    v_ms = v.replace(microsecond=(us % 1_000_000) // 1000 * 1000)
    assert avro.decode(avro.encode(v_ms, milli), milli) == v_ms


@given(us=st.integers(min_value=-(10**15), max_value=10**15))
@settings(max_examples=200, deadline=None)
def test_timestamp_roundtrip_property(us):
    micros = json.dumps({"type": "long", "logicalType": "timestamp-micros"})
    v = datetime(1970, 1, 1, tzinfo=timezone.utc) + timedelta(microseconds=us)
    assert avro.decode(avro.encode(v, micros), micros) == v
    ntz = json.dumps({"type": "long", "logicalType": "local-timestamp-micros"})
    w = datetime(1970, 1, 1) + timedelta(microseconds=us)
    assert avro.decode(avro.encode(w, ntz), ntz) == w


def test_confluent_framing_with_logical_types(spark, sr):
    """Registry-framed payloads whose schema carries logical types decode
    to the typed Spark columns (decimal/date), same as plain framing."""
    import datetime as dt
    from decimal import Decimal

    from pyspark.sql import functions as F

    sch = json.dumps({
        "type": "record", "name": "lt3",
        "fields": [
            {"name": "amount", "type": {"type": "bytes", "logicalType": "decimal",
                                        "precision": 10, "scale": 2}},
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        ],
    })
    sid = sr.register("lt3-value", sch)
    rows = [(Decimal("1.23"), dt.date(2024, 1, 2)),
            (Decimal("-99.99"), dt.date(1969, 7, 20))]
    df = spark.createDataFrame(rows, "amount decimal(10,2), d date")
    framed = avro.to_avro_df(
        df.select(F.struct("amount", "d").alias("v")), "v", sch, confluent_id=sid
    )
    back = avro.from_avro_df(framed, "v", confluent=True, registry=sr).select("v.*")
    assert back.schema.simpleString() == "struct<amount:decimal(10,2),d:date>"
    assert sorted(back.collect()) == sorted(df.collect())


# ---------------------------------------------------------------- round 6


def test_encode_none_for_non_null_schema_raises():
    """Round-6 review: str(None).encode() silently serialized a null
    string field as the literal "None" — now a loud TypeError."""
    sch = json.dumps({"type": "record", "name": "R",
                      "fields": [{"name": "s", "type": "string"}]})
    with pytest.raises(TypeError, match="None"):
        avro.encode({"s": None}, sch)


def test_multi_record_union_by_shape_and_name():
    """Round-6 review: first-record-wins branch selection encoded
    multi-record unions against the wrong schema; named types must
    resolve by name on the reader side."""
    sch = json.dumps({"type": "record", "name": "R", "fields": [{"name": "u", "type": [
        "null",
        {"type": "record", "name": "A", "fields": [{"name": "x", "type": "int"}]},
        {"type": "record", "name": "B", "fields": [{"name": "y", "type": "string"}]},
    ]}]})
    raw = avro.encode({"u": {"y": "hi"}}, sch)
    assert avro.decode(raw, sch) == {"u": {"y": "hi"}}
    # reader lists the records in the OPPOSITE order: name-based
    # resolution still finds B
    reader = json.dumps({"type": "record", "name": "R", "fields": [{"name": "u", "type": [
        "null",
        {"type": "record", "name": "B", "fields": [{"name": "y", "type": "string"}]},
        {"type": "record", "name": "A", "fields": [{"name": "x", "type": "int"}]},
    ]}]})
    assert avro.decode(raw, sch, reader) == {"u": {"y": "hi"}}


def test_union_record_branch_tolerates_superset_dicts():
    """Round-7 (driver advice): requiring set(v) <= branch field names
    made encode() raise for dicts carrying extra keys — a strictness
    regression vs _enc, which ignores unknown keys. Extra keys must not
    disqualify a record branch; overlap breaks multi-record ties; a map
    branch still wins a dict with no record-name overlap."""
    sch = json.dumps({"type": "record", "name": "R", "fields": [{"name": "u", "type": [
        "null",
        {"type": "record", "name": "A", "fields": [{"name": "x", "type": "int"}]},
        {"type": "record", "name": "B", "fields": [{"name": "y", "type": "string"}]},
    ]}]})
    # superset dict: extra key ignored, branch picked by overlap
    raw = avro.encode({"u": {"y": "hi", "stray": 9}}, sch)
    assert avro.decode(raw, sch) == {"u": {"y": "hi"}}
    raw = avro.encode({"u": {"x": 2, "_meta": "z"}}, sch)
    assert avro.decode(raw, sch) == {"u": {"x": 2}}
    # overlap tie-break: both branches' required fields present -> the
    # one covering MORE of the dict's keys wins
    sch2 = json.dumps({"type": "record", "name": "R2", "fields": [{"name": "u", "type": [
        {"type": "record", "name": "Small", "fields": [{"name": "x", "type": "int"}]},
        {"type": "record", "name": "Big", "fields": [
            {"name": "x", "type": "int"},
            {"name": "y", "type": "string", "default": "d"}]},
    ]}]})
    raw = avro.encode({"u": {"x": 1, "y": "v"}}, sch2)
    assert avro.decode(raw, sch2) == {"u": {"x": 1, "y": "v"}}
    # map branch beside an all-defaulted record: a dict with zero name
    # overlap keeps its keys via the map, not record defaults
    sch3 = json.dumps({"type": "record", "name": "R3", "fields": [{"name": "u", "type": [
        {"type": "record", "name": "Dflt", "fields": [
            {"name": "x", "type": "int", "default": 0}]},
        {"type": "map", "values": "int"},
    ]}]})
    raw = avro.encode({"u": {"k1": 7}}, sch3)
    assert avro.decode(raw, sch3) == {"u": {"k1": 7}}
    # review pass: WITHOUT a map branch, a zero-overlap dict must still
    # not be swallowed by an all-defaulted record (silent data loss —
    # the old upper-bound check raised here, and so must the new code);
    # the empty dict legitimately selects the all-default record
    sch4 = json.dumps({"type": "record", "name": "R4", "fields": [{"name": "u", "type": [
        "null",
        {"type": "record", "name": "Dflt2", "fields": [
            {"name": "x", "type": "int", "default": 0}]},
    ]}]})
    with pytest.raises(TypeError, match="no union branch"):
        avro.encode({"u": {"foo": 1}}, sch4)
    assert avro.decode(avro.encode({"u": {}}, sch4), sch4) == {"u": {"x": 0}}


def test_defaults_convert_bytes_and_logicals():
    """Round-6 review: raw JSON defaults crashed bytes encoding and
    leaked base ints where decode() surfaces logical objects."""
    import datetime as dt

    writer = json.dumps({"type": "record", "name": "R",
                         "fields": [{"name": "a", "type": "int"}]})
    reader = json.dumps({"type": "record", "name": "R", "fields": [
        {"name": "a", "type": "int"},
        {"name": "b", "type": "bytes", "default": "\u00ff\u0000"},
        {"name": "d", "type": {"type": "int", "logicalType": "date"},
         "default": 3},
    ]})
    out = avro.decode(avro.encode({"a": 1}, writer), writer, reader)
    assert out["b"] == b"\xff\x00"
    assert out["d"] == dt.date(1970, 1, 4)
    # writer-side: encoding a record that RELIES on a bytes default
    wsch = json.dumps({"type": "record", "name": "W", "fields": [
        {"name": "p", "type": "bytes", "default": "\u0001"}]})
    assert avro.decode(avro.encode({}, wsch), wsch) == {"p": b"\x01"}


def test_high_precision_decimal_is_exact():
    """Round-8 review: scaleb under the default 28-digit context
    silently ROUNDED >28-digit decimals before the integrality check —
    38-digit values (legal for Spark DecimalType(38)) corrupted on
    encode with no error."""
    import decimal

    sch = avro.parse_schema(json.dumps({
        "type": "bytes", "logicalType": "decimal",
        "precision": 38, "scale": 0}))
    v = decimal.Decimal("12345678901234567890123456789012345678")
    assert avro.decode(avro.encode(v, sch), sch) == v
    with pytest.raises(ValueError, match="rounding"):
        avro.encode(decimal.Decimal("1.5"), sch)  # scale 0 can't hold it


def test_enum_union_branch_requires_symbol_membership():
    """Round-8 review: in union [enum, string] a non-symbol string
    picked the enum branch and crashed at symbols.index despite being
    encodable via the string branch."""
    sch = avro.parse_schema(json.dumps([
        {"type": "enum", "name": "E", "symbols": ["A", "B"]}, "string"]))
    for v in ("A", "hello"):
        assert avro.decode(avro.encode(v, sch), sch) == v


def test_raw_json_loads_dict_is_parsed_not_trusted():
    """Round-8 review: any dict with a 'type' key skipped normalization
    and crashed deep in the codec; raw json.loads dicts now re-parse."""
    raw = json.loads('{"type":"record","name":"R","fields":'
                     '[{"name":"x","type":"string"}]}')
    assert avro.decode(avro.encode({"x": "hi"}, raw), raw) == {"x": "hi"}


def test_long_past_2_53_arriving_as_float_refused():
    """Round-8 review: a nullable long column reaches pandas as
    float64; past 2^53 the value has already lost exactness — encoding
    it would write a silently-wrong number."""
    sch = avro.parse_schema('"long"')
    assert avro.decode(avro.encode(float(2**50), sch), sch) == 2**50
    with pytest.raises(ValueError, match="2\\^53"):
        avro.encode(float(2**53 + 100), sch)


def test_guid_header_validation_names_the_defect(spark, sr):
    """Review r10: a wrong VERSION byte must be reported as such (not as
    a length problem), and the driver-side reader inference validates
    the header shape the same way the executor loop does."""
    from kafi_spark.sources.avro import _parse_guid_header

    good = b"\x01" + uuid.uuid4().bytes
    assert _parse_guid_header(good) == str(uuid.UUID(bytes=good[1:]))
    with pytest.raises(ValueError, match="version byte 0x02"):
        _parse_guid_header(b"\x02" + uuid.uuid4().bytes)
    with pytest.raises(ValueError, match="got 16 bytes"):
        _parse_guid_header(uuid.uuid4().bytes)

    # inference path: first row's malformed header fails loudly with the
    # wire-format message, not a cryptic uuid.UUID error
    payload = avro.encode(
        {"name": "timtam", "calories": 80.0, "colour": None}, SNACK)
    frame = spark.createDataFrame(
        [(payload, b"\x02" + uuid.uuid4().bytes)],
        "value binary, __sid binary")
    with pytest.raises(ValueError, match="version byte"):
        avro.from_avro_df(frame, "value", confluent=True, registry=sr,
                          guid_col="__sid")
