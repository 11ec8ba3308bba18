"""Kafka connector option translation — pure, broker-free.

The data plane itself needs a broker (absent here); what IS testable is
the reference-knob → connector-option mapping
(kafi/storage_consumer.py:16-66 resolution order), now gated by
``kafka_optspec``'s re-statement of the public spark-sql-kafka option
contract: every map ``scan_options`` emits is connector-valid, and the
suite fails if the translation drifts out of that contract (round-3
VERDICT item 3 — the strongest handshake available without a broker).
"""

from __future__ import annotations

import json

import pytest

from kafi_spark.sources.kafka import read_kafka, scan_options
from kafi_spark.sources.kafka_optspec import (
    KafkaOptionError,
    validate_sink_options,
    validate_source_options,
)


def test_defaults_earliest_to_latest():
    o = scan_options("b:9092", "t")
    assert o["kafka.bootstrap.servers"] == "b:9092"
    assert o["subscribe"] == "t"
    assert o["startingOffsets"] == "earliest"
    assert o["endingOffsets"] == "latest"


def test_offset_bounds_per_partition():
    o = scan_options("b:9092", "t", offsets={0: 5, 2: -2},
                     end_offsets={0: 100})
    assert json.loads(o["startingOffsets"]) == {"t": {"0": 5, "2": -2}}
    assert json.loads(o["endingOffsets"]) == {"t": {"0": 100}}
    # streaming allows a -1 (latest) per-partition start; batch forbids
    # it (checked in the contract tests below)
    s = scan_options("b:9092", "t", offsets={0: 5, 2: -1}, streaming=True)
    assert json.loads(s["startingOffsets"]) == {"t": {"0": 5, "2": -1}}


def test_timestamp_bounds_take_precedence():
    o = scan_options("b:9092", "t", offsets={0: 5}, ts_start_ms=1000,
                     ts_end_ms=2000)
    assert o["startingTimestamp"] == "1000"
    assert o["endingTimestamp"] == "2000"
    assert "startingOffsets" not in o and "endingOffsets" not in o


def test_streaming_with_ending_bound_raises():
    """Round-8 review: the ending bound used to be DROPPED silently —
    the caller asked for a bounded scan and got an unbounded stream.
    The connector rejects ending* options on streams, so the intent
    cannot be honored; fail at build time."""
    for kw in ({"end_offsets": {0: 9}}, {"ts_end_ms": 99}):
        with pytest.raises(KafkaOptionError, match="ending"):
            scan_options("b:9092", "t", streaming=True, **kw)
    o = scan_options("b:9092", "t", streaming=True)
    assert "endingOffsets" not in o and "endingTimestamp" not in o
    assert o["startingOffsets"] == "earliest"


def test_extra_options_override():
    o = scan_options("b:9092", "t", streaming=True,
                     options={"maxOffsetsPerTrigger": "1000",
                              "startingOffsets": "latest"})
    assert o["maxOffsetsPerTrigger"] == "1000"
    assert o["startingOffsets"] == "latest"  # caller wins


# ---------------------------------------------------------------------------
# connector-contract gate (kafka_optspec): every translated map is valid,
# and invalid knob combinations fail at BUILD time


def test_every_translation_is_connector_valid():
    """Sweep the reference-knob space; each emitted map must pass the
    contract (scan_options validates internally — this documents it and
    catches a future validate=False default regression)."""
    cases = [
        dict(),
        dict(offsets={0: 5}),
        dict(offsets={0: 5, 1: -2}, end_offsets={0: 100, 1: -1}),
        dict(ts_start_ms=1000),
        dict(ts_start_ms=1000, ts_end_ms=2000),
        dict(streaming=True),
        dict(streaming=True, offsets={0: -1}),
        dict(streaming=True, ts_start_ms=5,
             options={"maxOffsetsPerTrigger": "100",
                      "failOnDataLoss": "false",
                      "kafka.group.id": "g1"}),
    ]
    for kw in cases:
        o = scan_options("h1:9092,h2:9092", "topic-a", **kw)
        validate_source_options(o, streaming=kw.get("streaming", False))


def test_batch_start_at_latest_rejected():
    with pytest.raises(KafkaOptionError, match="latest"):
        scan_options("b:9092", "t", offsets={0: -1})
    with pytest.raises(KafkaOptionError, match="not allowed"):
        scan_options("b:9092", "t",
                     options={"startingOffsets": "latest"})


def test_ending_at_earliest_rejected():
    with pytest.raises(KafkaOptionError, match="-2"):
        scan_options("b:9092", "t", end_offsets={0: -2})


def test_forbidden_kafka_passthrough_rejected():
    with pytest.raises(KafkaOptionError, match="auto.offset.reset"):
        scan_options("b:9092", "t",
                     options={"kafka.auto.offset.reset": "earliest"})
    with pytest.raises(KafkaOptionError, match="deserializer"):
        scan_options("b:9092", "t",
                     options={"kafka.value.deserializer": "X"})


def test_contract_subscription_exclusivity():
    with pytest.raises(KafkaOptionError, match="exactly one"):
        validate_source_options(
            {"kafka.bootstrap.servers": "b:9092"}, streaming=False)
    with pytest.raises(KafkaOptionError, match="exactly one"):
        validate_source_options(
            {"kafka.bootstrap.servers": "b:9092", "subscribe": "t",
             "assign": '{"t": [0]}'}, streaming=False)


def test_contract_assign_offsets_must_match_assignment():
    base = {"kafka.bootstrap.servers": "b:9092",
            "assign": '{"t": [0, 1]}'}
    validate_source_options(
        base | {"startingOffsets": '{"t": {"0": 3}}'}, streaming=False)
    with pytest.raises(KafkaOptionError, match="not in the assign"):
        validate_source_options(
            base | {"startingOffsets": '{"other": {"0": 3}}'},
            streaming=False)


def test_contract_malformed_values_rejected():
    base = {"kafka.bootstrap.servers": "b:9092", "subscribe": "t"}
    for bad in [
        {"startingOffsets": "{not json"},
        {"startingOffsets": '{"t": {"x": 1}}'},
        {"startingOffsets": '{"t": {"0": "five"}}'},
        {"startingOffsets": '{"t": {"0": -3}}'},
        {"maxOffsetsPerTrigger": "lots"},
        {"failOnDataLoss": "maybe"},
        {"subscribePattern": "("},
    ]:
        opts = dict(base) | bad
        if "subscribePattern" in bad:
            opts.pop("subscribe")
        with pytest.raises(KafkaOptionError):
            validate_source_options(opts, streaming=False)
    with pytest.raises(KafkaOptionError, match="bootstrap"):
        validate_source_options({"subscribe": "t"}, streaming=False)
    with pytest.raises(KafkaOptionError, match="host:port"):
        validate_source_options(
            {"kafka.bootstrap.servers": "no-port", "subscribe": "t"},
            streaming=False)


def test_contract_streaming_rejects_ending_bounds():
    base = {"kafka.bootstrap.servers": "b:9092", "subscribe": "t"}
    for bad in ["endingOffsets", "endingTimestamp",
                "endingOffsetsByTimestamp"]:
        with pytest.raises(KafkaOptionError, match="streaming"):
            validate_source_options(
                base | {bad: "latest" if bad == "endingOffsets"
                        else '{"t": {"0": 1}}' if "By" in bad else "9"},
                streaming=True)


def test_sink_contract():
    validate_sink_options(
        {"kafka.bootstrap.servers": "b:9092", "topic": "t"})
    validate_sink_options(  # per-row topic column mode
        {"kafka.bootstrap.servers": "b:9092"})
    with pytest.raises(KafkaOptionError, match="serializer"):
        validate_sink_options(
            {"kafka.bootstrap.servers": "b:9092", "topic": "t",
             "kafka.key.serializer": "X"})
    with pytest.raises(KafkaOptionError, match="non-empty"):
        validate_sink_options(
            {"kafka.bootstrap.servers": "b:9092", "topic": " "})


def test_read_kafka_wires_exact_options(spark, monkeypatch):
    """read_kafka must pass scan_options' map verbatim into the reader —
    recorded through a fake DataFrameReader (no jar, no broker)."""
    recorded = {}

    class FakeReader:
        def format(self, fmt):
            recorded["format"] = fmt
            return self

        def option(self, k, v):
            recorded[k] = v
            return self

        def load(self):
            recorded["loaded"] = True
            return "sentinel-df"

    monkeypatch.setattr(type(spark), "read",
                        property(lambda self: FakeReader()))
    out = read_kafka(spark, "b:9092", "t", offsets={0: 7})
    assert out == "sentinel-df"
    assert recorded["format"] == "kafka" and recorded["loaded"]
    expect = scan_options("b:9092", "t", offsets={0: 7})
    assert {k: v for k, v in recorded.items()
            if k not in ("format", "loaded")} == expect


def test_duration_and_ipv6_options_accepted():
    """Round-8 review: maxTriggerDelay is a DURATION the connector
    parses ('15m' is its documented default) — the integer check
    rejected valid configs; and bracketed IPv6 bootstrap addresses are
    legal Kafka client syntax the host regex forbade."""
    o = scan_options("b:9092", "t", streaming=True,
                     options={"minOffsetsPerTrigger": "100",
                              "maxTriggerDelay": "15m"})
    assert o["maxTriggerDelay"] == "15m"
    scan_options("[::1]:9092", "t")
    scan_options("[2001:db8::1]:9092,plain-host:9093", "t")
    with pytest.raises(KafkaOptionError, match="maxtriggerdelay"):
        scan_options("b:9092", "t", streaming=True,
                     options={"maxTriggerDelay": "soon"})
    with pytest.raises(KafkaOptionError):
        scan_options("::1:9092", "t")  # unbracketed ipv6 stays rejected
