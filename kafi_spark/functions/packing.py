"""Sequence packing — greedy token-budget bin packing for LLM training.

Training pipelines concatenate documents into fixed-size context windows
("sequence packing") to avoid padding waste. The operator assigns every
document to a pack such that each pack's token total stays within
``budget`` (oversized single documents get a pack of their own — the
caller decides whether to truncate or drop them).

Distribution strategy: packing is inherently sequential WITHIN a pack,
so the corpus is hash-bucketed (``n_buckets`` ≈ cluster parallelism ×
a small factor) and packed per bucket with BEST-fit-decreasing inside
an ``applyInPandas`` group (bisect over open-pack residuals — the
kernel's in-function comments describe it) — each bucket is an
independent greedy instance, the shuffle carries only (id, n_tokens),
and pack ids are globally unique as (bucket, local_seq). BFD shares
FFD's classic waste bound (≤ 11/9 OPT + 6/9 bins) while picking the
tightest open pack instead of the first, and bucket-local packing
costs at most one underfull pack per bucket versus a global pass —
negligible when buckets hold thousands of documents, the 100 TB case.

Determinism: bucket assignment is a hash of the id; BFD sorts by
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
    Rows with a NULL token count are dropped (nothing of unknown length
    can be packed; a null used to surface as a NaN crash inside the
    pandas kernel).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if n_buckets is None:
        # FIXED default, not defaultParallelism: the docstring guarantees
        # "same input => same packs, any cluster size", and a
        # cluster-sized bucket count broke exactly that. 1024 buckets
        # parallelize any realistic cluster; raise it explicitly when a
        # single bucket's documents stop fitting in one task's memory.
        n_buckets = 1024

    slim = df.filter(F.col(tokens_col).isNotNull()).select(
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
        # best-fit-decreasing via a bisect index on remaining capacity:
        # the earlier linear first-fit scan over open packs was
        # O(docs x packs) per bucket — quadratic Python time once a
        # bucket holds ~10^5 documents. Here each placement is a
        # binary search for the TIGHTEST pack that still fits (list
        # insert/delete is a C memmove — fine to ~10^6 open packs), and
        # BFD packs no worse than FFD on sorted input.
        import bisect

        pack_totals: list[int] = []
        rem: list[tuple[int, int]] = []  # sorted (remaining, pack_idx)
        assign: list[int] = []
        for n in pdf[tokens_col]:
            n = int(n)
            j = bisect.bisect_left(rem, (n, -1))
            if j < len(rem):
                remaining, placed = rem.pop(j)
                pack_totals[placed] += n
                if remaining - n > 0:
                    bisect.insort(rem, (remaining - n, placed))
            else:
                pack_totals.append(n)
                placed = len(pack_totals) - 1
                if budget - n > 0:
                    bisect.insort(rem, (budget - n, placed))
            assign.append(placed)
        pdf["pack_id"] = [f"{bucket}-{a}" for a in assign]
        pdf["pack_tokens"] = [pack_totals[a] for a in assign]
        return pdf[[id_col, tokens_col, "pack_id", "pack_tokens"]]

    return slim.groupBy("__bucket").applyInPandas(pack_bucket, out_schema)
