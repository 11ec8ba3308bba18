"""Debezium CDC codecs — envelope <-> Z-set deltas.

Reference: ``from_debezium`` maps ``{"op": c/u/d, "before": ..,
"after": ..}`` to weighted records (+1 create/after, -1 delete/before;
update = -1 before +1 after) at kafi/streams/topologynode.py:1090-1103;
``to_debezium`` maps +w -> 'c', -w -> 'd' envelopes at
topologynode.py:1148-1167.

Here the envelope is a struct column (or JSON string via ``from_json``);
decode emits up to two weighted rows per envelope with one JVM-side
explode — no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from kafi_spark.streams.zset import WEIGHT


def from_debezium(df: DataFrame, op_col: str = "op", before_col: str = "before",
                  after_col: str = "after") -> DataFrame:
    """Envelope -> weighted change rows.

    op 'c'/'r' -> (+1, after); 'd' -> (-1, before);
    'u' -> (-1, before) and (+1, after).
    Output: the payload struct exploded to ``value`` + ``weight``.
    """
    pairs = (
        F.when(F.col(op_col) == "d",
               F.array(F.struct(F.col(before_col).alias("v"), F.lit(-1).cast("long").alias("w"))))
        .when(F.col(op_col) == "u",
              F.array(
                  F.struct(F.col(before_col).alias("v"), F.lit(-1).cast("long").alias("w")),
                  F.struct(F.col(after_col).alias("v"), F.lit(1).cast("long").alias("w")),
              ))
        .otherwise(
            F.array(F.struct(F.col(after_col).alias("v"), F.lit(1).cast("long").alias("w"))))
    )
    other = [c for c in df.columns if c not in (op_col, before_col, after_col)]
    return (
        df.select(*other, F.explode(pairs).alias("__d"))
        .select(*other, F.col("__d.v").alias("value"), F.col("__d.w").alias(WEIGHT))
        .filter(F.col("value").isNotNull())
    )


def to_debezium(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Weighted rows -> c/d envelopes, |w| copies each
    (topologynode.py:1148-1167). ``explode(sequence)`` for the repeat."""
    op = F.when(F.col(WEIGHT) > 0, F.lit("c")).otherwise(F.lit("d"))
    before = F.when(F.col(WEIGHT) < 0, F.col(value_col))
    after = F.when(F.col(WEIGHT) > 0, F.col(value_col))
    return (
        df.filter(F.col(WEIGHT) != 0)
        .withColumn("__i", F.explode(F.sequence(F.lit(1), F.abs(F.col(WEIGHT)))))
        .select(
            before.alias("before"),
            after.alias("after"),
            op.alias("op"),
        )
    )


def apply_cdc(
    deltas: DataFrame, key_cols: list[str], order_col: str | None = None
) -> DataFrame:
    """Apply a decoded CDC delta stream to produce the current table
    state.

    WELL-FORMED streams — every update/delete carries its before image
    (Debezium with REPLICA IDENTITY FULL through :func:`from_debezium`)
    — net out by full-record consolidation: rows with positive net
    weight ARE the live state, one per ``key_cols`` by the stream's own
    algebra, and no per-key resolution is needed.

    UPSERT streams (updates WITHOUT before images — e.g. REPLICA
    IDENTITY DEFAULT, whose null ``before`` rows :func:`from_debezium`
    drops) leave every historical value of a key net-positive, so the
    caller must say what "latest" means: pass ``order_col`` (a column
    riding through the decode, e.g. the envelope's ``source.ts_ms`` or
    LSN) and only each key's highest-ordered live row survives (weight
    normalized to 1). Without ``order_col`` no resolution is applied —
    a plain DataFrame has no row order to infer "latest" from, and
    silently picking one value would hide the malformed stream.
    """
    from pyspark.sql import Window as W

    from kafi_spark.streams.zset import consolidate

    live = consolidate(deltas).filter(F.col(WEIGHT) > 0)
    if order_col is None:
        return live
    w = W.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
    return (
        live.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumn(WEIGHT, F.lit(1).cast("long"))
    )
