"""Kafka connector option translation — pure, broker-free.

The data plane itself needs a broker (absent here); what IS testable is
the reference-knob → connector-option mapping
(kafi/storage_consumer.py:16-66 resolution order)."""

from __future__ import annotations

import json

from kafi_spark.sources.kafka import scan_options


def test_defaults_earliest_to_latest():
    o = scan_options("b:9092", "t")
    assert o["kafka.bootstrap.servers"] == "b:9092"
    assert o["subscribe"] == "t"
    assert o["startingOffsets"] == "earliest"
    assert o["endingOffsets"] == "latest"


def test_offset_bounds_per_partition():
    o = scan_options("b", "t", offsets={0: 5, 2: -1}, end_offsets={0: 100})
    assert json.loads(o["startingOffsets"]) == {"t": {"0": 5, "2": -1}}
    assert json.loads(o["endingOffsets"]) == {"t": {"0": 100}}


def test_timestamp_bounds_take_precedence():
    o = scan_options("b", "t", offsets={0: 5}, ts_start_ms=1000, ts_end_ms=2000)
    assert o["startingTimestamp"] == "1000"
    assert o["endingTimestamp"] == "2000"
    assert "startingOffsets" not in o and "endingOffsets" not in o


def test_streaming_has_no_ending_bound():
    o = scan_options("b", "t", end_offsets={0: 9}, ts_end_ms=99, streaming=True)
    assert "endingOffsets" not in o and "endingTimestamp" not in o
    assert o["startingOffsets"] == "earliest"


def test_extra_options_override():
    o = scan_options("b", "t", options={"maxOffsetsPerTrigger": "1000",
                                        "startingOffsets": "latest"})
    assert o["maxOffsetsPerTrigger"] == "1000"
    assert o["startingOffsets"] == "latest"  # caller wins
