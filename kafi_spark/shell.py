"""Shell verbs — kafi's batch query surface, as DataFrame transforms.

Reference semantics: ``kafi/shell.py`` (cat/head/tail/cp/wc/grep/stat,
lines 14-104). The reference evaluates these eagerly as folds over a
consumer; here every verb is a lazy DataFrame transform so Catalyst gets
predicate pushdown / column pruning / limit pushdown for free, and the same
verb works unchanged on a 100 TB table.

Ordering note: Kafka topics have a total order only per partition; kafi's
``head``/``tail`` rely on consume order. A distributed engine needs an
explicit order, so these verbs take ``order_by`` columns (offset-like).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def cat(df: DataFrame, map_fun=None, n: int | None = None) -> DataFrame:
    """Materialize a topic/table, optionally mapped (kafi/shell.py:14-16).

    ``map_fun`` is a Column-list producer ``df -> list[Column]`` (the
    Spark-first replacement for kafi's per-dict lambda); plain Python
    row lambdas belong in :func:`kafi_spark.functional.fmap`.
    """
    out = df.select(*map_fun(df)) if map_fun is not None else df
    return out.limit(n) if n is not None else out


def head(df: DataFrame, order_by: Sequence[str | Column], n: int = 10) -> DataFrame:
    """First ``n`` in ``order_by`` order (kafi/shell.py:18).

    Spark turns sort+limit into TakeOrderedAndProject — a per-partition
    top-n plus a driver-side merge of n*partitions rows; no full sort, no
    full shuffle, scales to any table size.
    """
    return df.orderBy(*order_by).limit(n)


def tail(df: DataFrame, order_by: Sequence[str], n: int = 10) -> DataFrame:
    """Last ``n`` per the total order (kafi/shell.py:21-34).

    The reference resolves negative start offsets against per-partition high
    watermarks (kafi/storage_consumer.py:199-231); the scalable equivalent is
    a descending TakeOrderedAndProject.
    """
    return df.orderBy(*[F.col(c).desc() for c in order_by]).limit(n)


def _match_cond(df: DataFrame, pattern: str, cols: Sequence[str] | None):
    """THE grep matching semantics — unanchored rlike over the string
    form of the columns — defined once so :func:`grep` output and
    :func:`grep_stats` counts can never silently desynchronize."""
    cond = None
    for c in cols or df.columns:
        this = F.col(c).cast("string").rlike(pattern)
        cond = this if cond is None else (cond | this)
    return cond


def grep(
    df: DataFrame,
    pattern: str,
    cols: Sequence[str] | None = None,
    n: int | None = None,
) -> DataFrame:
    """Regex match over the string form of the given columns
    (kafi/shell.py:71-101: matches str(key) or str(value)).

    ``rlike`` is unanchored (find-anywhere), matching Python ``re.search``
    which the reference uses. The filter is a codegen'd JVM regex — no
    Python round-trip.
    """
    out = df.filter(_match_cond(df, pattern, cols))
    return out.limit(n) if n is not None else out


def grep_stats(df: DataFrame, pattern: str, cols: Sequence[str] | None = None) -> DataFrame:
    """(n_matches, n_scanned) companion to :func:`grep`
    (kafi/shell.py:95-100 returns both counts). One pass: conditional agg."""
    cond = _match_cond(df, pattern, cols)
    return df.agg(
        F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))
        .alias("n_matches"),
        F.count(F.lit(1)).alias("n_scanned"),
    )


def wc(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(#messages, #words, #bytes) over the string form of ``cols``
    (kafi/shell.py:46-67 counts whitespace-split words and UTF-8 bytes of
    key+value). Single aggregate pass, all JVM-side."""
    # count \S+ runs in ONE regex scan via the canonical ws_tokens
    # framing (review r7, runtime-confirmed: F.trim strips ASCII spaces
    # only, so 'hello world\n' counted 3 words and a '\n'-only value
    # counted 2 — the reference's str.split() yields no empty tokens;
    # review r8: the strip+guard+split form scanned each value three
    # times). Oracle SQL mirrors regexp_extract_all in lockstep. Null
    # values count 0 words.
    from kafi_spark.functions.text import ws_tokens

    # null guard via when(), NOT coalesce(size(...), 0): with ANSI off
    # and legacy sizeOfNull, size(null) returns -1 rather than null, so
    # coalesce never fired and each null key/value COUNTED -1 words
    # (round-8 review, reproduced) — Kafka keys are routinely null
    word_counts = [
        F.when(F.col(c).isNull(), F.lit(0)).otherwise(
            F.size(ws_tokens(F.col(c).cast("string")))
        )
        for c in cols
    ]
    byte_counts = [
        F.coalesce(F.octet_length(F.col(c).cast("string")), F.lit(0)) for c in cols
    ]
    words = word_counts[0]
    for x in word_counts[1:]:
        words = words + x
    nbytes = byte_counts[0]
    for x in byte_counts[1:]:
        nbytes = nbytes + x
    # coalesce: sum() over an EMPTY topic is null, the reference returns 0
    return df.agg(
        F.count(F.lit(1)).alias("n_messages"),
        F.coalesce(F.sum(words), F.lit(0)).cast("long").alias("n_words"),
        F.coalesce(F.sum(nbytes), F.lit(0)).cast("long").alias("n_bytes"),
    )


def stat(df: DataFrame) -> DataFrame:
    """Message count (kafi/shell.py:103-104) — as an aggregate, not a
    driver-side ``len(cat(...))``."""
    return df.agg(F.count(F.lit(1)).alias("n_messages"))
