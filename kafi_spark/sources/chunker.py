"""Oversized-message chunking (reference: kafi/chunker.py:25-63,
kafi/dechunker.py:15-75).

Values larger than ``chunk_size`` split into N messages linked by headers
``kafi_chunked_message_id`` / ``kafi_number_of_chunks`` /
``kafi_chunk_number`` and a ``_NNNNNN`` key suffix (kafi/helpers.py:356-376).
Here the link columns are first-class; converting them to Kafka headers is a
projection. Both directions are single JVM-side plans: chunk = sequence +
explode + substring; dechunk = groupBy + sort + concat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk(df: DataFrame, value_col: str = "value", id_col: str = "key",
          chunk_size: int = 1000) -> DataFrame:
    """Split oversized binary values into numbered chunks.

    Output: (chunk_key, chunked_message_id, chunk_number, number_of_chunks,
    value). Single-chunk messages pass through with n_chunks=1 (the
    reference only chunks when needed, kafi/chunker.py:29-34).
    """
    # F.length: BYTES for binary values, CHARS for strings — the same
    # unit substring slices in (review r7: octet_length counted bytes
    # while substring sliced characters, so multibyte strings produced
    # an oversized first chunk and empty tails). chunk_size is therefore
    # bytes for binary payloads (the Kafka case) and characters for
    # strings.
    size = F.length(F.col(value_col))
    n_chunks = F.greatest(F.ceil(size / chunk_size), F.lit(1)).cast("int")
    # the _NNNNNN key suffix holds 6 digits; lpad TRUNCATES past
    # 999999, colliding/corrupting chunk keys and breaking dechunk's
    # fixed-width suffix strip — fail loudly instead (round-8 ADVICE).
    # Row-level guard (the count is data-dependent): raise_error fires
    # during the projection, before any truncated key is emitted.
    n_chunks = F.when(
        n_chunks > 999_999,
        F.raise_error(
            F.concat(
                F.lit("chunk(): value needs "),
                n_chunks.cast("string"),
                F.lit(
                    " chunks, past the 999999 the 6-digit key suffix "
                    "can number — increase chunk_size"
                ),
            )
        ).cast("int"),
    ).otherwise(n_chunks)
    # Per-row unique id, like the reference's uuid4 (kafi/chunker.py:37).
    # A content hash would alias identical (key, value) rows: dechunk's
    # completeness filter then sees 2n chunks vs n expected and drops both.
    # uuid() is nondeterministic, so Catalyst won't push it through the
    # Generate below — one id per source row, shared by its chunks.
    msg_id = F.expr("uuid()")
    return (
        df.withColumn("__n", n_chunks)
        .withColumn("chunked_message_id", msg_id)
        .withColumn("chunk_number", F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .select(
            # key suffix _NNNNNN (kafi/helpers.py:356-376)
            F.concat(
                F.coalesce(F.col(id_col).cast("string"), F.lit("")),
                F.lit("_"),
                F.lpad(F.col("chunk_number").cast("string"), 6, "0"),
            ).alias("chunk_key"),
            "chunked_message_id",
            "chunk_number",
            F.col("__n").alias("number_of_chunks"),
            F.substring(
                F.col(value_col), F.col("chunk_number") * chunk_size + 1, chunk_size
            ).alias(value_col),
        )
    )


def dechunk(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Reassemble chunked messages (kafi/dechunker.py:15-75): group by
    message id, order chunks, concatenate; incomplete groups are dropped
    (the reference buffers until all chunks arrive)."""
    # at-least-once tolerant (review r7): completeness counts DISTINCT
    # chunk numbers and the parts array is deduped — a redelivered
    # duplicate chunk used to fail the count check and silently DROP a
    # fully-delivered message (and would have been concatenated twice
    # had the count passed). A group with conflicting payloads for one
    # chunk number (size(parts) != expect after dedup) is dropped as
    # incomplete rather than reassembled corrupt.
    key_part = []
    if "chunk_key" in df.columns:
        # recover the original key: chunk_key = "<key>_NNNNNN"
        # (kafi/helpers.py:356-376); originally-null keys come back ''
        # (chunk() coalesced them — the suffix scheme can't tell them
        # apart, same as the reference's dechunker)
        key_part = [
            F.any_value(
                F.expr("substring(chunk_key, 1, length(chunk_key) - 7)")
            ).alias("key")
        ]
    return (
        df.groupBy("chunked_message_id")
        .agg(
            F.max("number_of_chunks").alias("__expect"),
            F.count_distinct("chunk_number").alias("__got"),
            F.min("chunk_number").alias("__lo"),
            F.max("chunk_number").alias("__hi"),
            F.array_sort(F.array_distinct(
                F.collect_list(F.struct("chunk_number", F.col(value_col).alias("v")))
            )).alias("__parts"),
            *key_part,
        )
        .filter(
            (F.col("__got") == F.col("__expect"))
            & (F.size("__parts") == F.col("__expect"))
            # distinct-COUNT alone accepts any n distinct numbers —
            # corrupt/forged numbering ({0,2} with nof=2) must drop as
            # incomplete, not reassemble a wrong payload: require the
            # exact 0..n-1 span (r10 ADVICE; numbering is 0-based by
            # chunk()'s sequence(0, n-1))
            & (F.col("__lo") == 0)
            & (F.col("__hi") == F.col("__expect") - 1)
        )
        .select(
            "chunked_message_id",
            *(["key"] if key_part else []),
            F.aggregate(
                "__parts",
                F.lit(b""),
                lambda acc, p: F.concat(acc, p["v"]),
            ).alias(value_col),
        )
    )
