"""Avro binary codec + Spark column bridge, dependency-free.

The reference's flagship serialization path is Avro with the Confluent
Schema Registry (kafi/deserializer.py:60-69,104-123; kafi/serializer.py:
63-87) via fastavro. This environment bundles neither spark-avro (the SQL
connector) nor any Python avro library, so the codec is implemented here
against the public Avro 1.12 binary spec (zigzag-varint longs, length-
prefixed bytes/strings, block-encoded arrays/maps, index-prefixed unions,
field-ordered records). Conformance is pytest-checked both directions
against the Apache Avro *Java* library that ships inside Spark's own
classpath (avro-1.12.1.jar, reached over the session's py4j gateway).

Spark integration: ``from_avro_df`` / ``to_avro_df`` cross into Python
once per Arrow batch (pandas UDF), decode/encode each message, and hand
Spark a typed struct / binary column. That is the same per-message cost
profile as the reference's fastavro loop, but distributed: the UDF runs
on executors, schemas travel in the closure, nothing touches the driver.

Schema resolution (reader != writer) implements the useful subset of the
spec's rules: records match fields by name (missing -> reader default,
extra writer fields decoded and discarded), unions resolve per value, and
numeric promotions int->long->float->double plus string<->bytes apply.

Logical types (spec §Logical Types) convert both directions like the
reference's fastavro path (kafi/deserializer.py:60-69): decimal (bytes or
fixed) <-> decimal.Decimal, date <-> datetime.date, time-millis/micros <->
datetime.time, timestamp-millis/micros <-> aware-UTC datetime,
local-timestamp-* <-> naive datetime. Deviation: uuid stays a plain
string (it is a string on the wire and Spark's natural mapping is
StringType). Invalid annotations fall back to the raw type, per spec.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import json
import struct
import uuid as _uuid
from io import BytesIO

import pandas as pd

PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}

# logicalType -> base types it may annotate (Avro 1.12 spec §Logical Types).
# An annotation on any other base type is ignored per spec ("treat as the
# underlying type"), which is also what fastavro/the Java lib do.
LOGICAL_BASES = {
    "decimal": ("bytes", "fixed"),
    "date": ("int",),
    "time-millis": ("int",),
    "time-micros": ("long",),
    "timestamp-millis": ("long",),
    "timestamp-micros": ("long",),
    "local-timestamp-millis": ("long",),
    "local-timestamp-micros": ("long",),
    "uuid": ("string",),
}

_EPOCH_UTC = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
_EPOCH_NAIVE = _dt.datetime(1970, 1, 1)
_EPOCH_DATE = _dt.date(1970, 1, 1)


# ---------------------------------------------------------------------------
# Schema parsing: JSON -> dicts with named-type references resolved
# ---------------------------------------------------------------------------

def parse_schema(schema, _names: dict | None = None):
    """Normalize a schema (JSON string or already-parsed) so every node is a
    dict (primitives -> {"type": name}) and named-type references point at
    the defining dict. Recursive schemas stay recursive (shared dicts)."""
    if isinstance(schema, (str, bytes)) and not isinstance(schema, dict):
        s = schema.decode() if isinstance(schema, bytes) else schema
        stripped = s.strip()
        if stripped.startswith(("{", "[", '"')):
            schema = json.loads(stripped)
        else:
            schema = stripped  # bare primitive or type name
    names = {} if _names is None else _names
    out = _norm(schema, names, namespace=None)
    # marker lets decode()/encode()/read_ocf() distinguish OUR
    # normalized form from a raw json.loads dict (round-8 review: any
    # dict with a 'type' key skipped normalization and crashed deep in
    # the codec); _norm is also union-dict idempotent so re-parsing a
    # normalized schema is safe
    out["__kafi_normalized__"] = True
    return out


def _fullname(name: str, namespace: str | None) -> str:
    return name if "." in name or not namespace else f"{namespace}.{name}"


def _norm(node, names: dict, namespace: str | None):
    if isinstance(node, str):
        if node in PRIMITIVES:
            return {"type": node}
        full = _fullname(node, namespace)
        if full in names:
            return names[full]
        if node in names:
            return names[node]
        raise ValueError(f"unknown type name: {node}")
    if isinstance(node, list):  # union
        return {"type": "union", "branches": [_norm(b, names, namespace) for b in node]}
    if isinstance(node, dict) and node.get("type") == "union" and "branches" in node:
        # already-normalized union (idempotent re-parse)
        return {"type": "union",
                "branches": [_norm(b, names, namespace) for b in node["branches"]]}
    if not isinstance(node, dict):
        raise ValueError(f"bad schema node: {node!r}")
    t = node.get("type")
    if isinstance(t, (list, dict)):  # {"type": [...]} wrapper or inline complex
        return _norm(t, names, namespace)
    if t in ("record", "error"):
        ns = node.get("namespace", namespace)
        out = {"type": "record", "name": _fullname(node["name"], ns), "fields": []}
        names[out["name"]] = out
        for f in node["fields"]:
            fd = {"name": f["name"], "type": _norm(f["type"], names, ns)}
            if "default" in f:
                fd["default"] = f["default"]
            out["fields"].append(fd)
        return out
    if t == "enum":
        ns = node.get("namespace", namespace)
        out = {"type": "enum", "name": _fullname(node["name"], ns),
               "symbols": list(node["symbols"])}
        if "default" in node:
            out["default"] = node["default"]
        names[out["name"]] = out
        return out
    if t == "fixed":
        ns = node.get("namespace", namespace)
        out = {"type": "fixed", "name": _fullname(node["name"], ns),
               "size": int(node["size"]), **_logical_attrs(node, "fixed")}
        names[out["name"]] = out
        return out
    if t == "array":
        return {"type": "array", "items": _norm(node["items"], names, namespace)}
    if t == "map":
        return {"type": "map", "values": _norm(node["values"], names, namespace)}
    if t in PRIMITIVES:
        return {"type": t, **_logical_attrs(node, t)}
    if isinstance(t, str):
        return _norm(t, names, namespace)
    raise ValueError(f"bad schema node: {node!r}")


def _logical_attrs(node: dict, base: str) -> dict:
    """Extract a spec-valid logicalType annotation (plus decimal
    precision/scale) from a schema node; annotations on a base type the
    spec doesn't allow are dropped (spec: fall back to the raw type)."""
    lt = node.get("logicalType")
    if lt is None or base not in LOGICAL_BASES.get(lt, ()):
        return {}
    out = {"logicalType": lt}
    if lt == "decimal":
        if "precision" not in node:
            return {}  # invalid decimal annotation -> raw type, per spec
        out["precision"] = int(node["precision"])
        out["scale"] = int(node.get("scale", 0))
    return out


# ---------------------------------------------------------------------------
# Binary primitives (Avro spec: zigzag varint, little-endian IEEE floats)
# ---------------------------------------------------------------------------

def _write_long(out: BytesIO, v: int) -> None:
    n = (v << 1) ^ (v >> 63) if v >= 0 else ((-v - 1) << 1) | 1
    # equivalently zigzag; loop emits 7-bit groups LSB-first
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, data: bytes):
        self.buf = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos: self.pos + n]
        if len(b) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def read_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # un-zigzag


# ---------------------------------------------------------------------------
# Logical type conversions (Avro 1.12 spec; behavior matches fastavro, the
# reference's codec — kafi/deserializer.py:60-69 — except uuid, which stays
# a plain string here: it IS a string on the wire and maps to Spark string)
# ---------------------------------------------------------------------------

def _decimal_to_unscaled(v: _decimal.Decimal, scale: int) -> int:
    # scaleb under the DEFAULT 28-digit context silently ROUNDS values
    # with more significant digits before the integrality check ran —
    # 38-digit decimals (legal for Spark DecimalType(38)) corrupted on
    # encode with no error (round-8 review, reproduced). A widened
    # local context makes the shift exact for any Avro/Spark decimal.
    with _decimal.localcontext() as ctx:
        ctx.prec = max(len(v.as_tuple().digits) + abs(scale) + 2, 40)
        q = v.scaleb(scale)
        unscaled = int(q)
        if q != unscaled:
            raise ValueError(
                f"decimal {v} does not fit scale {scale} without rounding"
            )
    return unscaled


def _unscaled_bytes(unscaled: int) -> bytes:
    """Minimal two's-complement big-endian encoding — byte-identical to
    Java BigInteger.toByteArray(), which is what the Avro Java lib and
    fastavro write for bytes-backed decimals."""
    n = ((unscaled.bit_length() if unscaled >= 0 else (~unscaled).bit_length()) // 8) + 1
    return unscaled.to_bytes(n, "big", signed=True)


def _logical_to_base(v, s: dict):
    """Logical Python value -> Avro base value. Base-typed values
    (int/str/bytes) pass through so callers holding raw values still work."""
    lt = s["logicalType"]
    if v is None:
        return v
    if lt == "decimal":
        if not isinstance(v, _decimal.Decimal):
            return v  # pre-encoded bytes
        unscaled = _decimal_to_unscaled(v, s["scale"])
        b = _unscaled_bytes(unscaled)
        if s["type"] == "fixed":
            size = s["size"]
            if len(b) > size:
                raise ValueError(f"decimal {v} overflows fixed({size})")
            pad = b"\xff" if unscaled < 0 else b"\x00"
            b = pad * (size - len(b)) + b
        return b
    if lt == "date":
        if isinstance(v, _dt.datetime):
            v = v.date()
        if isinstance(v, _dt.date):
            return (v - _EPOCH_DATE).days
        return v
    if lt in ("time-millis", "time-micros"):
        if isinstance(v, _dt.time):
            us = ((v.hour * 60 + v.minute) * 60 + v.second) * 1_000_000 + v.microsecond
            return us if lt == "time-micros" else us // 1000
        return v
    if lt in ("timestamp-millis", "timestamp-micros"):
        if isinstance(v, _dt.datetime):
            if v.tzinfo is None:
                v = v.replace(tzinfo=_dt.timezone.utc)  # naive == UTC convention
            delta = v - _EPOCH_UTC
            us = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
            return us if lt == "timestamp-micros" else us // 1000
        return v
    if lt in ("local-timestamp-millis", "local-timestamp-micros"):
        if isinstance(v, _dt.datetime):
            if v.tzinfo is not None:
                v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            delta = v - _EPOCH_NAIVE
            us = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
            return us if lt == "local-timestamp-micros" else us // 1000
        return v
    if lt == "uuid":
        return str(v) if isinstance(v, _uuid.UUID) else v
    return v


def _base_to_logical(v, s: dict):
    """Avro base value -> logical Python value, per the effective schema."""
    lt = s.get("logicalType")
    if lt is None or v is None:
        return v
    if lt == "decimal":
        unscaled = int.from_bytes(v, "big", signed=True)
        # widened context: the decode side of the round-8 precision fix
        # (default 28-digit context rounded >28-digit unscaled values)
        with _decimal.localcontext() as ctx:
            ctx.prec = max(len(str(abs(unscaled))) + 2, 40)
            return _decimal.Decimal(unscaled).scaleb(-s["scale"])
    if lt == "date":
        return _EPOCH_DATE + _dt.timedelta(days=v)
    if lt in ("time-millis", "time-micros"):
        us = v * 1000 if lt == "time-millis" else v
        return (_EPOCH_NAIVE + _dt.timedelta(microseconds=us)).time()
    if lt in ("timestamp-millis", "timestamp-micros"):
        us = v * 1000 if lt == "timestamp-millis" else v
        return _EPOCH_UTC + _dt.timedelta(microseconds=us)
    if lt in ("local-timestamp-millis", "local-timestamp-micros"):
        us = v * 1000 if lt == "local-timestamp-millis" else v
        return _EPOCH_NAIVE + _dt.timedelta(microseconds=us)
    return v  # uuid: stays str


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------

def encode(value, schema) -> bytes:
    """Serialize ``value`` per ``schema`` (parsed or JSON) to Avro binary."""
    sch = schema if isinstance(schema, dict) \
        and "__kafi_normalized__" in schema else parse_schema(schema)
    out = BytesIO()
    _enc(out, value, sch)
    return out.getvalue()


def _enc(out: BytesIO, v, s: dict) -> None:
    t = s["type"]
    if v is None and t not in ("null", "union"):
        # fail loudly: str(None).encode() used to serialize a null string
        # field as the literal "None" — silent corruption; a null against
        # a non-nullable schema is the caller's bug
        raise TypeError(f"cannot encode None as non-null Avro {t!r}")
    if "logicalType" in s:
        v = _logical_to_base(v, s)
    if t == "null":
        if v is not None:
            raise TypeError(f"null schema, got {v!r}")
    elif t == "boolean":
        out.write(b"\x01" if v else b"\x00")
    elif t in ("int", "long"):
        if isinstance(v, float) and abs(v) >= 2.0 ** 53:
            # a long column with ANY null reaches pandas as float64;
            # values past 2^53 have already lost exactness there, so
            # int(v) would encode a silently-wrong number (round-8
            # review). Loud beats corrupted: avoid nulls in >2^53 long
            # columns, or pre-cast them to string.
            raise ValueError(
                f"long value {v!r} arrived as float64 (a nullable long "
                "column converts that way) and magnitudes >= 2^53 are "
                "no longer exact — refusing to encode a corrupted value"
            )
        _write_long(out, int(v))
    elif t == "float":
        out.write(struct.pack("<f", float(v)))
    elif t == "double":
        out.write(struct.pack("<d", float(v)))
    elif t == "bytes":
        b = bytes(v)
        _write_long(out, len(b))
        out.write(b)
    elif t == "string":
        b = str(v).encode("utf-8")
        _write_long(out, len(b))
        out.write(b)
    elif t == "fixed":
        b = bytes(v)
        if len(b) != s["size"]:
            raise ValueError(f"fixed {s['name']} wants {s['size']} bytes, got {len(b)}")
        out.write(b)
    elif t == "enum":
        _write_long(out, s["symbols"].index(v))
    elif t == "array":
        items = list(v)
        if items:
            _write_long(out, len(items))
            for it in items:
                _enc(out, it, s["items"])
        _write_long(out, 0)
    elif t == "map":
        entries = dict(v)
        if entries:
            _write_long(out, len(entries))
            for k, val in entries.items():
                _enc(out, k, {"type": "string"})
                _enc(out, val, s["values"])
        _write_long(out, 0)
    elif t == "union":
        idx = _branch_index(v, s["branches"])
        _write_long(out, idx)
        _enc(out, v, s["branches"][idx])
    elif t == "record":
        rec = v if isinstance(v, dict) else v.__dict__
        for f in s["fields"]:
            if f["name"] in rec:
                _enc(out, rec[f["name"]], f["type"])
            elif "default" in f:
                _enc(out, _default_value(f["type"], f["default"]), f["type"])
            else:
                raise ValueError(f"record field {f['name']} missing and has no default")
    else:
        raise ValueError(f"unknown schema type {t!r}")


def _default_value(s, d):
    """Avro JSON default -> the runtime value the codec works with.

    Spec §Schemas: defaults are JSON-encoded — bytes/fixed as latin-1
    strings, union defaults typed by the FIRST branch; logical types
    annotate base defaults. Raw JSON defaults previously crashed bytes
    encoding (bytes(str)) and leaked base ints where decode() surfaces
    date/timestamp/Decimal objects."""
    if not isinstance(s, dict):
        s = {"type": s}
    t = s["type"]
    if t == "union":
        return _default_value(s["branches"][0], d)
    if d is None:
        return None
    if t in ("bytes", "fixed"):
        d = d.encode("latin-1") if isinstance(d, str) else bytes(d)
    if "logicalType" in s:
        return _base_to_logical(d, s)
    if t == "array":
        return [_default_value(s["items"], x) for x in d]
    if t == "map":
        return {k: _default_value(s["values"], x) for k, x in d.items()}
    if t == "record":
        return {
            f["name"]: _default_value(
                f["type"], d.get(f["name"], f.get("default"))
            )
            for f in s["fields"]
        }
    return d


def _branch_index(v, branches: list[dict]) -> int:
    """Pick the union branch for a Python value, spec-typed."""
    def matches(s):
        t = s["type"]
        if v is None:
            return t == "null"
        if isinstance(v, bool):
            return t == "boolean"
        if isinstance(v, _decimal.Decimal):
            return s.get("logicalType") == "decimal"
        if isinstance(v, _dt.datetime):  # before date: datetime is a date
            return s.get("logicalType", "").endswith(("timestamp-millis",
                                                      "timestamp-micros"))
        if isinstance(v, _dt.date):
            return s.get("logicalType") == "date"
        if isinstance(v, _dt.time):
            return s.get("logicalType") in ("time-millis", "time-micros")
        if isinstance(v, _uuid.UUID):
            return t == "string"
        if isinstance(v, int):
            return t in ("int", "long")
        if isinstance(v, float):
            return t in ("float", "double")
        if isinstance(v, str):
            # enum branches match only MEMBER strings (round-8 review:
            # in union [enum, string] a non-symbol string picked the
            # enum branch and crashed at symbols.index despite being
            # encodable via the string branch)
            if t == "enum":
                return v in s["symbols"]
            return t == "string"
        if isinstance(v, (bytes, bytearray)):
            return t in ("bytes", "fixed")
        if isinstance(v, (list, tuple)):
            return t == "array"
        if isinstance(v, dict):
            # record branches must match by FIELD SHAPE, not kind: the
            # first-record-wins rule encoded multi-record unions against
            # the wrong schema (spec resolves named types by name; a
            # plain dict carries no name, so shape is the proxy). A
            # branch matches when every non-defaulted field is present;
            # extra keys do NOT disqualify it (_enc ignores unknown keys,
            # matching the reference's dict-in/dict-out tolerance) — ties
            # between record branches break on name overlap below.
            if t == "record":
                required = {f["name"] for f in s["fields"] if "default" not in f}
                return required <= set(v)
            return t == "map"
        return False

    if isinstance(v, dict) and not isinstance(v, bool):
        # prefer the record branch whose field names overlap v the most
        # (then fewest stray keys, then union order); a lone map branch
        # still wins when no record's required fields are all present
        best, best_score = None, None
        for i, b in enumerate(branches):
            if b["type"] == "record" and matches(b):
                names = {f["name"] for f in b["fields"]}
                overlap = len(names & set(v))
                if v and overlap == 0:
                    # an all-defaulted record (required = ∅) matches ANY
                    # dict; claiming one with zero name overlap would
                    # silently drop every caller key and write defaults
                    # (or shadow a map branch) — require actual overlap
                    # for non-empty dicts
                    continue
                score = (overlap, -len(set(v) - names), -i)
                if best_score is None or score > best_score:
                    best, best_score = i, score
        if best is not None:
            return best
        for i, b in enumerate(branches):
            # records were exhaustively considered above; a rejected one
            # (zero-overlap beside a map) must not re-match here
            if b["type"] != "record" and matches(b):
                return i
        raise TypeError(f"no union branch for dict: {v!r}")

    for i, b in enumerate(branches):
        if matches(b):
            return i
    raise TypeError(f"no union branch for {type(v).__name__}: {v!r}")


# ---------------------------------------------------------------------------
# Decode (with reader-schema resolution)
# ---------------------------------------------------------------------------

def decode(data: bytes, writer_schema, reader_schema=None):
    """Deserialize Avro binary written with ``writer_schema``; when
    ``reader_schema`` differs, apply the spec's resolution rules."""
    w = writer_schema if isinstance(writer_schema, dict) \
        and "__kafi_normalized__" in writer_schema else parse_schema(writer_schema)
    r = None
    if reader_schema is not None:
        r = reader_schema if isinstance(reader_schema, dict) \
            and "__kafi_normalized__" in reader_schema \
            else parse_schema(reader_schema)
    rd = _Reader(bytes(data))
    return _dec(rd, w, r)


def _dec(rd: _Reader, w: dict, r: dict | None):
    t = w["type"]
    if r is not None and r["type"] == "union" and t != "union":
        # writer non-union read by union reader: value as-is
        return _dec(rd, w, _resolve_branch(w, r["branches"]))
    if t == "null":
        return None
    if t == "boolean":
        return rd.read(1) != b"\x00"
    if t in ("int", "long"):
        v = _promote(rd.read_long(), t, r)
        return _base_to_logical(v, r or w) if isinstance(v, int) else v
    if t == "float":
        v = struct.unpack("<f", rd.read(4))[0]
        return v
    if t == "double":
        return struct.unpack("<d", rd.read(8))[0]
    if t == "bytes":
        v = rd.read(rd.read_long())
        eff = r or w
        if eff.get("logicalType") == "decimal":
            return _base_to_logical(v, eff)
        return v.decode("utf-8") if r is not None and r["type"] == "string" else v
    if t == "string":
        v = rd.read(rd.read_long()).decode("utf-8")
        return v.encode("utf-8") if r is not None and r["type"] == "bytes" else v
    if t == "fixed":
        v = rd.read(w["size"])
        eff = r if r is not None and r["type"] == "fixed" else w
        return _base_to_logical(v, eff)
    if t == "enum":
        sym = w["symbols"][rd.read_long()]
        if r is not None and r["type"] == "enum" and sym not in r["symbols"]:
            return r.get("default", sym)
        return sym
    if t == "array":
        ri = r["items"] if r is not None and r["type"] == "array" else None
        out = []
        while True:
            n = rd.read_long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                rd.read_long()  # block byte size, unused
            for _ in range(n):
                out.append(_dec(rd, w["items"], ri))
    if t == "map":
        rv = r["values"] if r is not None and r["type"] == "map" else None
        out = {}
        while True:
            n = rd.read_long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                rd.read_long()
            for _ in range(n):
                k = rd.read(rd.read_long()).decode("utf-8")
                out[k] = _dec(rd, w["values"], rv)
    if t == "union":
        branch = w["branches"][rd.read_long()]
        rb = _resolve_branch(branch, r["branches"]) if r is not None and r["type"] == "union" \
            else r
        return _dec(rd, branch, rb)
    if t == "record":
        rfields = {f["name"]: f for f in r["fields"]} if r is not None and r["type"] == "record" \
            else None
        out = {}
        for f in w["fields"]:
            v = _dec(rd, f["type"], rfields[f["name"]]["type"]
                     if rfields and f["name"] in rfields else None)
            if rfields is None or f["name"] in rfields:
                out[f["name"]] = v  # extra writer fields: decoded, discarded
        if rfields:
            for name, f in rfields.items():
                if name not in out:
                    if "default" not in f:
                        raise ValueError(f"reader field {name} absent and has no default")
                    out[name] = _default_value(f["type"], f["default"])
        return out
    raise ValueError(f"unknown schema type {t!r}")


def _promote(v: int, t: str, r: dict | None):
    if r is None:
        return v
    rt = r["type"]
    if rt in ("float", "double"):
        return float(v)
    if rt in ("int", "long"):
        return v
    if rt == "union":
        return v
    raise ValueError(f"cannot promote {t} to {rt}")


def _resolve_branch(writer_branch: dict, reader_branches: list[dict]):
    wt = writer_branch["type"]
    if wt in ("record", "enum", "fixed"):
        # spec: named types resolve by (full)name, never by position —
        # kind-only matching resolved multi-record unions to whichever
        # record came first in the reader union
        wname = writer_branch.get("name")
        for rb in reader_branches:
            if rb["type"] == wt and rb.get("name") == wname:
                return rb
        same_kind = [rb for rb in reader_branches if rb["type"] == wt]
        # a single same-kind branch is unambiguous even under renaming
        return same_kind[0] if len(same_kind) == 1 else None
    for rb in reader_branches:
        if rb["type"] == wt:
            return rb
    promos = {"int": ("long", "float", "double"), "long": ("float", "double"),
              "float": ("double",), "string": ("bytes",), "bytes": ("string",)}
    for rb in reader_branches:
        if rb["type"] in promos.get(wt, ()):
            return rb
    return None  # no matching branch: decode with writer view


# ---------------------------------------------------------------------------
# Avro schema -> Spark type
# ---------------------------------------------------------------------------

def avro_to_spark(schema):
    """Map an Avro schema to a Spark DataType (same mapping spark-avro
    uses): unions with null -> nullable member; other multi-branch unions
    are rejected (no Spark analogue)."""
    from pyspark.sql import types as T

    sch = schema if isinstance(schema, dict) \
        and "__kafi_normalized__" in schema else parse_schema(schema)

    def go(s, seen):
        t = s["type"]
        lt = s.get("logicalType")
        if lt == "decimal":
            return T.DecimalType(s["precision"], s["scale"])
        if lt == "date":
            return T.DateType()
        if lt in ("timestamp-millis", "timestamp-micros"):
            return T.TimestampType()
        if lt in ("local-timestamp-millis", "local-timestamp-micros"):
            return T.TimestampNTZType()
        if lt in ("time-millis", "time-micros"):
            return T.TimeType()
        prim = {"boolean": T.BooleanType(), "int": T.IntegerType(),
                "long": T.LongType(), "float": T.FloatType(),
                "double": T.DoubleType(), "bytes": T.BinaryType(),
                "string": T.StringType(), "null": T.NullType()}
        if t in prim:
            return prim[t]
        if t == "fixed":
            return T.BinaryType()
        if t == "enum":
            return T.StringType()
        if t == "array":
            return T.ArrayType(go(s["items"], seen))
        if t == "map":
            return T.MapType(T.StringType(), go(s["values"], seen))
        if t == "union":
            non_null = [b for b in s["branches"] if b["type"] != "null"]
            if len(non_null) != 1:
                raise ValueError("only unions of null with one type map to Spark")
            return go(non_null[0], seen)
        if t == "record":
            if s["name"] in seen:
                raise ValueError(f"recursive record {s['name']} has no Spark analogue")
            fields = [T.StructField(f["name"], go(f["type"], seen | {s["name"]}), True)
                      for f in s["fields"]]
            return T.StructType(fields)
        raise ValueError(f"unknown schema type {t!r}")

    return go(sch, frozenset())


# ---------------------------------------------------------------------------
# DataFrame bridge (Arrow-batched pandas UDFs)
# ---------------------------------------------------------------------------

CONFLUENT_MAGIC = 0


def confluent_frame(payload: bytes, schema_id: int) -> bytes:
    """Wrap an Avro payload in the Confluent wire format: magic byte 0 +
    4-byte big-endian schema id (kafi/helpers.py:306-312)."""
    return bytes((CONFLUENT_MAGIC,)) + schema_id.to_bytes(4, "big") + payload


def _parse_guid_header(g) -> str:
    """Validate and parse a Confluent schema-id message-header value
    (1 version byte ``\\x01`` + 16 UUID bytes) into the GUID string —
    ONE definition for the driver-side reader inference and the
    executor decode loop, each error naming the actual defect."""
    import uuid as _uuid

    g = bytes(g)
    if len(g) != 17:
        raise ValueError(
            "schema-id header must be 17 bytes (1 version byte \\x01 + "
            f"16 GUID bytes), got {len(g)} bytes")
    if g[0] != 1:
        raise ValueError(
            "schema-id header has unsupported version byte "
            f"0x{g[0]:02x} (only \\x01 is defined)")
    return str(_uuid.UUID(bytes=g[1:]))


def from_avro_df(df, col: str, schema=None, out: str | None = None,
                 confluent: bool = False, registry=None, reader_schema=None,
                 guid_col: str | None = None):
    """Decode a binary Avro column into a typed struct column.

    * plain framing: ``schema`` (writer) required;
    * ``confluent=True``: per-row 5-byte header carries the writer schema
      id, resolved through ``registry`` (SchemaRegistryClient or anything
      with ``get_by_id``); ``schema``/``reader_schema`` then acts as the
      reader schema (defaults to the first id seen).
    * ``guid_col`` (with ``confluent=True``): a binary column holding the
      Confluent schema-id MESSAGE HEADER (1 version byte ``\\x01`` +
      16 UUID bytes — ``schema.header_value(headers,
      "__value_schema_id")`` extracts it from a message frame). Rows
      where it is non-null resolve the writer by registry GUID and the
      payload is RAW Avro (no 5-byte frame); null rows fall back to the
      framed path — exactly the reference's header-first resolution
      (kafi/deserializer.py:104-123).

    One Arrow crossing; schemas are parsed once per executor task, then
    cached by id/guid inside the batch loop.
    """
    from pyspark.sql import functions as F

    out = out or col
    if guid_col is not None and not confluent:
        raise ValueError("guid_col requires confluent=True (it is the "
                         "id-in-headers variant of the Confluent wire)")
    if confluent:
        if registry is None:
            raise ValueError("confluent=True needs a registry")
        reader = reader_schema or schema
        if reader is None:
            if df.isStreaming:
                raise ValueError(
                    "confluent=True on a streaming frame needs an explicit "
                    "reader schema (schema=/reader_schema=): inferring one "
                    "from the first row is a batch action streams forbid")
            # default reader = writer of the first frame, fetched driver-side
            sel = [F.col(col)] + ([F.col(guid_col)] if guid_col else [])
            first = df.select(*sel).filter(F.col(col).isNotNull()).first()
            if first is None:
                raise ValueError("cannot infer reader schema from an empty column")
            if guid_col and first[1] is not None:
                reader = registry.get_by_guid(_parse_guid_header(first[1]))
            else:
                rid = int.from_bytes(bytes(first[0])[1:5], "big")
                reader = registry.get_by_id(rid)
        reader_parsed = parse_schema(reader)
        spark_t = avro_to_spark(reader_parsed)
        # writer schemas resolve INSIDE the executor UDF, memoized per
        # worker — standard Confluent-deserializer behavior. The old
        # driver-side distinct-id prefetch (a) ran batch actions that made
        # streaming frames undecodable, (b) re-scanned the source before
        # the real job, and (c) KeyError'd on schema ids first appearing
        # at action time. The registry client is a tiny picklable closure
        # member (url + auth), so executors can fetch each id once.
        writers: dict[int, dict] = {}
        by_guid: dict[bytes, dict] = {}

        def one(b):
            if b is None:
                return None
            b = bytes(b)
            if not b or b[0] != CONFLUENT_MAGIC:
                raise ValueError("not Confluent-framed avro")
            wid = int.from_bytes(b[1:5], "big")
            w = writers.get(wid)
            if w is None:
                w = writers[wid] = parse_schema(registry.get_by_id(wid))
            return decode(b[5:], w, reader_parsed)

        if guid_col is None:
            return df.withColumn(out, _decode_udf(one, spark_t)(F.col(col)))

        def one_with_header(b, g):
            # header present → writer by GUID, payload is RAW Avro (the
            # id travels in the header, not a 5-byte frame); header
            # value = 1 version byte + 16 UUID bytes. Header absent →
            # classic framed path. kafi/deserializer.py:104-123.
            if g is None:
                return one(b)
            if b is None:
                return None
            g = bytes(g)
            w = by_guid.get(g)
            if w is None:
                w = by_guid[g] = parse_schema(
                    registry.get_by_guid(_parse_guid_header(g)))
            return decode(bytes(b), w, reader_parsed)

        return df.withColumn(
            out,
            _decode_udf2(one_with_header, spark_t)(F.col(col), F.col(guid_col)),
        )

    if schema is None:
        raise ValueError("schema required without confluent framing")
    parsed = parse_schema(schema)
    reader_parsed = parse_schema(reader_schema) if reader_schema is not None else None
    spark_t = avro_to_spark(reader_parsed if reader_parsed is not None else parsed)

    def one(b):
        return None if b is None else decode(bytes(b), parsed, reader_parsed)

    return df.withColumn(out, _decode_udf(one, spark_t)(F.col(col)))


def _decode_udf(one, spark_t):
    """Build the Arrow-batched decode UDF. Struct returns must be a
    pandas DataFrame (one column per top-level field); scalars a Series.
    Null payloads surface as all-null fields (pandas has no null struct)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    if isinstance(spark_t, StructType):
        cols = [f.name for f in spark_t.fields]

        @F.pandas_udf(spark_t)
        def _udf(s: pd.Series) -> pd.DataFrame:
            rows = [(one(b) or dict.fromkeys(cols)) for b in s]
            return pd.DataFrame(rows, columns=cols)

        return _udf

    @F.pandas_udf(spark_t)
    def _udf(s: pd.Series) -> pd.Series:
        return pd.Series([one(b) for b in s], dtype="object")

    return _udf


def _decode_udf2(one, spark_t):
    """Two-argument sibling of :func:`_decode_udf` for decoders that
    consult a per-row companion column (the Confluent schema-id message
    header next to the payload). Deliberately NOT unified with the
    one-arg builder: pandas_udf reads arity from the wrapped function's
    signature (no varargs), and the struct-column adapter alternative
    hands the UDF a pd.DataFrame whose iteration yields column LABELS —
    measured broken. Any change to the null-struct convention or the
    pandas plumbing here must be mirrored in :func:`_decode_udf`."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    if isinstance(spark_t, StructType):
        cols = [f.name for f in spark_t.fields]

        @F.pandas_udf(spark_t)
        def _udf(s: pd.Series, g: pd.Series) -> pd.DataFrame:
            rows = [(one(b, h) or dict.fromkeys(cols))
                    for b, h in zip(s, g)]
            return pd.DataFrame(rows, columns=cols)

        return _udf

    @F.pandas_udf(spark_t)
    def _udf(s: pd.Series, g: pd.Series) -> pd.Series:
        return pd.Series([one(b, h) for b, h in zip(s, g)], dtype="object")

    return _udf


def to_avro_df(df, col: str, schema, out: str | None = None,
               confluent_id: int | None = None):
    """Encode a struct (or scalar) column to Avro binary; with
    ``confluent_id``, frame it in the Confluent wire format."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType

    parsed = parse_schema(schema)
    out = out or col
    prefix = b"" if confluent_id is None else \
        bytes((CONFLUENT_MAGIC,)) + int(confluent_id).to_bytes(4, "big")


    @F.pandas_udf(BinaryType())
    def _enc_udf(s: pd.Series) -> pd.Series:
        if isinstance(s, pd.DataFrame):  # older struct-as-frame convention
            # Arrow->pandas turns nulls in numeric fields into NaN; map them
            # back to None so null-union branches resolve (int fields that
            # became float survive the int() cast in the encoder).
            vals = s.astype(object).where(pd.notna(s), None).to_dict("records")
        else:
            vals = list(s)
        return pd.Series([None if v is None else prefix + encode(v, parsed) for v in vals])

    return df.withColumn(out, _enc_udf(F.col(col)))


def confluent_schema_id_col(col: str):
    """Column expr: 4-byte big-endian schema id from the Confluent prefix."""
    from kafi_spark.sources.schema import confluent_schema_id
    from pyspark.sql import functions as F

    return confluent_schema_id(F.col(col))
