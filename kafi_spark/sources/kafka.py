"""Kafka source/sink wrappers — the reference's consumer/producer knobs
mapped onto Spark's built-in Kafka connector.

Reference: batched pull with start/end offsets, start/end timestamps,
partition filter, consumer group (kafi/storage_consumer.py:16-66); batched
produce (kafi/storage_producer.py:42-90). Spark's connector implements all
of it as data-source options; these helpers translate the reference's
calling convention. Untestable in this environment (no broker) — the logic
is option construction only.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def _offsets_json(topic: str, offsets: dict[int, int] | None, default: str) -> str:
    if offsets is None:
        return default
    return json.dumps({topic: {str(p): o for p, o in offsets.items()}})


def scan_options(
    bootstrap_servers: str,
    topic: str,
    offsets: dict[int, int] | None = None,
    end_offsets: dict[int, int] | None = None,
    ts_start_ms: int | None = None,
    ts_end_ms: int | None = None,
    streaming: bool = False,
    options: dict[str, str] | None = None,
    validate: bool = True,
) -> dict[str, str]:
    """The connector option map for a scan — pure translation of the
    reference's consumer knobs (unit-testable without a broker).

    Timestamp bounds take precedence over offset bounds on each end
    (matching kafi/storage_consumer.py:16-66 resolution order); streaming
    scans get no ending bound (the connector rejects them). The result
    is checked against :mod:`kafi_spark.sources.kafka_optspec`'s
    re-statement of the connector's option contract (``validate=False``
    opts out) so an invalid combination — e.g. a batch start at -1 /
    latest, which the connector forbids — fails HERE at build time, not
    at executor launch on a real cluster."""
    out = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
    }
    if validate and streaming and (
        ts_end_ms is not None or end_offsets is not None
    ):
        # fail at build time instead of SILENTLY streaming past the
        # requested bound (round-8 review: the ending bound was dropped
        # without a signal; the connector itself rejects ending* options
        # on streams, so the caller's intent cannot be honored). Part of
        # the validate= contract, so validate=False opts out like every
        # other check (round-8 self-review).
        from kafi_spark.sources.kafka_optspec import KafkaOptionError

        raise KafkaOptionError(
            "streaming scans cannot take an ending bound "
            "(ts_end_ms/end_offsets): the Kafka connector rejects "
            "ending* options for streams — drop the bound or use a "
            "batch scan (streaming=False)"
        )
    if ts_start_ms is not None:
        out["startingTimestamp"] = str(ts_start_ms)
    else:
        out["startingOffsets"] = _offsets_json(topic, offsets, "earliest")
    if not streaming:
        if ts_end_ms is not None:
            out["endingTimestamp"] = str(ts_end_ms)
        else:
            out["endingOffsets"] = _offsets_json(topic, end_offsets, "latest")
    out.update(options or {})
    if validate:
        from kafi_spark.sources.kafka_optspec import validate_source_options

        validate_source_options(out, streaming=streaming)
    return out


def read_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    offsets: dict[int, int] | None = None,
    end_offsets: dict[int, int] | None = None,
    ts_start_ms: int | None = None,
    ts_end_ms: int | None = None,
    streaming: bool = False,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Batch or streaming Kafka scan with the reference's bounds.

    Negative offsets follow Kafka semantics via startingOffsets=earliest
    resolution; timestamp bounds use startingTimestamp/endingTimestamp
    (per-partition maps also supported by the connector).
    """
    reader = (spark.readStream if streaming else spark.read).format("kafka")
    opts = scan_options(
        bootstrap_servers, topic, offsets, end_offsets,
        ts_start_ms, ts_end_ms, streaming, options,
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def write_kafka(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    options: dict[str, str] | None = None,
    checkpoint: str | None = None,
):
    """Batch or streaming Kafka sink. ``df`` needs ``value`` (binary/str),
    optional ``key``/``headers``/``partition`` — the connector's contract,
    which matches MESSAGE_SCHEMA. The assembled option map is checked
    against the connector contract before any writer is built."""
    from kafi_spark.sources.kafka_optspec import validate_sink_options

    validate_sink_options({
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        **(options or {}),
    })
    if df.isStreaming:
        w = df.writeStream.format("kafka").option(
            "kafka.bootstrap.servers", bootstrap_servers
        ).option("topic", topic)
        if checkpoint:
            w = w.option("checkpointLocation", checkpoint)
        for k, v in (options or {}).items():
            w = w.option(k, v)
        return w.start()
    w = df.write.format("kafka").option(
        "kafka.bootstrap.servers", bootstrap_servers
    ).option("topic", topic)
    for k, v in (options or {}).items():
        w = w.option(k, v)
    w.save()
    return None
