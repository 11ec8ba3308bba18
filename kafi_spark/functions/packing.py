"""Sequence packing — greedy token-budget bin packing for LLM training.

Training pipelines concatenate documents into fixed-size context windows
("sequence packing") to avoid padding waste. The operator assigns every
document to a pack such that each pack's token total stays within
``budget`` (oversized single documents get a pack of their own — the
caller decides whether to truncate or drop them).

Distribution strategy: packing is inherently sequential WITHIN a pack,
so the corpus is hash-bucketed (``n_buckets`` ≈ cluster parallelism ×
a small factor) and packed per bucket with first-fit-decreasing inside
an ``applyInPandas`` group — each bucket is an independent greedy
instance, the shuffle carries only (id, n_tokens), and pack ids are
globally unique as (bucket, local_seq). FFD waste is bounded (≤ 11/9
OPT + 6/9 bins classically), and bucket-local packing costs at most one
underfull pack per bucket versus a global pass — negligible when
buckets hold thousands of documents, which is the 100 TB case.

Determinism: bucket assignment is a hash of the id; FFD sorts by
(-n_tokens, id). Same input ⇒ same packs, any cluster size.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def pack_documents(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    n_buckets: int | None = None,
) -> DataFrame:
    """Assign each document to a pack with total tokens ≤ ``budget``.

    Output: (id_col, tokens_col, pack_id STRING, pack_tokens LONG) —
    ``pack_id`` is ``"<bucket>-<seq>"``, ``pack_tokens`` the pack's
    total. Documents with ``n_tokens > budget`` are emitted alone in
    their own pack (pack_tokens > budget flags them for the caller).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if n_buckets is None:
        n_buckets = df.sparkSession.sparkContext.defaultParallelism * 4

    slim = df.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias(tokens_col),
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_buckets))
        .cast("int")
        .alias("__bucket"),
    )

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, {tokens_col} long, "
        "pack_id string, pack_tokens long"
    )

    def pack_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["__bucket"].iloc[0])
        pdf = pdf.sort_values(
            [tokens_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        # first-fit-decreasing over open packs
        pack_totals: list[int] = []
        assign: list[int] = []
        for n in pdf[tokens_col]:
            n = int(n)
            placed = -1
            for i, tot in enumerate(pack_totals):
                if tot + n <= budget:
                    placed = i
                    break
            if placed < 0:
                pack_totals.append(n)
                placed = len(pack_totals) - 1
            else:
                pack_totals[placed] += n
            assign.append(placed)
        pdf["pack_id"] = [f"{bucket}-{a}" for a in assign]
        pdf["pack_tokens"] = [pack_totals[a] for a in assign]
        return pdf[[id_col, tokens_col, "pack_id", "pack_tokens"]]

    return slim.groupBy("__bucket").applyInPandas(pack_bucket, out_schema)
