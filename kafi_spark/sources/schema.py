"""The canonical message row.

The reference normalizes every message to a 7-field dict — value, key,
headers, timestamp (type, millis), partition, offset, topic
(kafi/storage_consumer.py:132-138, SURVEY §1.1). That is exactly the schema
of Spark's Kafka source, which we adopt verbatim so Kafka topics and FS
topics are interchangeable DataFrames.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Spark Kafka-source schema, the engine's canonical message row.
MESSAGE_SCHEMA = StructType(
    [
        StructField("key", BinaryType(), True),
        StructField("value", BinaryType(), True),
        StructField("topic", StringType(), True),
        StructField("partition", IntegerType(), True),
        StructField("offset", LongType(), True),
        StructField("timestamp", TimestampType(), True),
        StructField("timestampType", IntegerType(), True),
        StructField(
            "headers",
            ArrayType(
                StructType(
                    [
                        StructField("key", StringType(), True),
                        StructField("value", BinaryType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)


def message_schema() -> StructType:
    return MESSAGE_SCHEMA


# ---------------------------------------------------------------------------
# Typed key/value views — the reference's six wire types
# (kafi/deserializer.py:27-43: bytes, str, json, avro, jsonschema, protobuf)
# ---------------------------------------------------------------------------

def decode_col(col: Column, wire_type: str, schema: str | None = None) -> Column:
    """Deserialize a binary column per wire type.

    * ``bytes`` — passthrough (kafi/deserializer.py:45-48)
    * ``str``   — UTF-8 decode (kafi/deserializer.py:49-52)
    * ``json``  — decode + ``from_json`` when a schema is given, else the
      JSON string (schema-on-read happens at query time;
      kafi/deserializer.py:54-58)
    * ``avro`` / ``protobuf`` — need spark-avro / spark-protobuf jars; the
      Confluent wire format additionally carries a 5-byte header (magic +
      schema id, kafi/helpers.py:306-312) stripped here.
    """
    if wire_type == "bytes":
        return col
    if wire_type == "str":
        return col.cast("string")
    if wire_type == "json":
        s = col.cast("string")
        return F.from_json(s, schema) if schema else s
    if wire_type == "avro":
        raise NotImplementedError(
            "avro decode is DataFrame-level (Arrow-batched pandas UDF), not "
            "a Column expr — use kafi_spark.sources.avro.from_avro_df / "
            "to_avro_df (plain or Confluent-framed via SchemaRegistryClient)"
        )
    if wire_type in ("jsonschema", "json_sr"):
        raise NotImplementedError(
            "jsonschema decode validates DataFrame-level — use "
            "kafi_spark.sources.jsonschema_wire.validate_json_df"
        )
    if wire_type in ("protobuf", "pb"):
        raise NotImplementedError(
            "protobuf decode is DataFrame-level (Arrow-batched pandas UDF), "
            "not a Column expr — use kafi_spark.sources.protobuf_wire."
            "from_protobuf_df / to_protobuf_df (plain or Confluent-framed; "
            "ref kafi/deserializer.py:133-148)"
        )
    raise ValueError(f"unknown wire type: {wire_type}")


def encode_col(col: Column, wire_type: str) -> Column:
    """Serialize a column to binary per wire type (kafi/serializer.py:63-87)."""
    if wire_type == "bytes":
        return col
    if wire_type == "str":
        return F.encode(col.cast("string"), "utf-8")
    if wire_type == "json":
        encoded = col if isinstance(col, Column) else F.col(col)
        return F.encode(F.to_json(encoded), "utf-8")
    raise NotImplementedError(f"wire type {wire_type!r} not available here")


def confluent_strip_header(value: Column) -> Column:
    """Drop the 5-byte Confluent wire-format prefix (magic byte + 4-byte
    schema id, kafi/helpers.py:306-312)."""
    return F.substring(value, 6, (1 << 31) - 1)


def confluent_schema_id(value: Column) -> Column:
    """Extract the 4-byte big-endian schema id from the Confluent prefix."""
    b = lambda i: F.conv(F.hex(F.substring(value, i, 1)), 16, 10).cast("long")  # noqa: E731
    return (b(2) * 16777216 + b(3) * 65536 + b(4) * 256 + b(5)).cast("long")


def header_value(headers: Column, key: str) -> Column:
    """First header value for ``key`` from a message frame's ``headers``
    array (null when absent) — e.g. the Confluent schema-id header
    ``__value_schema_id`` the GUID wire variant resolves writers from
    (kafi/deserializer.py:104-112)."""
    # try_element_at: a missing key means an EMPTY filtered array, and
    # ANSI mode (Spark 4 default) makes plain element_at throw on it
    return F.try_element_at(
        F.filter(headers, lambda h: h["key"] == F.lit(key)), F.lit(1)
    )["value"]
