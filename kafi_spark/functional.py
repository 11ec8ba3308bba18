"""Functional query layer (reference: ``kafi/functional.py``).

The reference's universal evaluator is a sequential fold over a consumer
(``foldl``, kafi/functional.py:12-39); map/filter/flatmap derive from it.
A sequential fold does not distribute, so the Spark-first design splits the
surface in two:

* **Column path** (default, fast): map/filter/flatmap take Column
  expressions and compile to select/filter/explode — whole-stage codegen,
  no Python in the loop.
* **Lambda path** (parity escape hatch): ``*_py`` variants take plain
  Python callables over row-dicts, executed via Arrow-vectorized
  ``mapInPandas`` — the moral equivalent of kafi's per-message lambdas at
  ~100x the throughput, still fully distributed.

``foldl`` itself is intentionally *not* reproduced as a sequential loop:
every use of it in the reference is either an aggregate (→ ``agg``) or a
collection (→ ``collect``). A truly order-dependent fold is available via
``toLocalIterator`` but documented as the anti-pattern it is.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


# ---------- Column path ----------------------------------------------------

def fmap(df: DataFrame, *cols: Column | str) -> DataFrame:
    """1:1 transform (kafi/functional.py:51) — a projection."""
    return df.select(*cols)


def ffilter(df: DataFrame, predicate: Column) -> DataFrame:
    """Predicate keep (kafi/functional.py:57)."""
    return df.filter(predicate)


def fflatmap(df: DataFrame, array_col: Column, alias: str, keep: Sequence[str] = ()) -> DataFrame:
    """1:N expansion (kafi/functional.py:43): explode an array expression,
    keeping ``keep`` passthrough columns."""
    return df.select(*keep, F.explode(array_col).alias(alias))


def foldl(df: DataFrame, *aggs: Column) -> DataFrame:
    """Aggregate fold (kafi/functional.py:12-39). The reference returns
    (acc, message_count); here any number of aggregate expressions runs in
    one partial-final pass."""
    return df.agg(*aggs)


def foreach(df: DataFrame, f: Callable) -> None:
    """Side-effect per row (kafi/functional.py:63)."""
    df.foreach(f)


# ---------- Lambda path (pandas-vectorized Python) -------------------------

def _map_partitions(f: Callable[[pd.DataFrame], pd.DataFrame], schema):
    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = f(pdf)
            if len(out):
                yield out
    return op, schema


def fmap_py(df: DataFrame, f: Callable[[dict], dict], schema: str) -> DataFrame:
    """Arbitrary Python 1:1 transform — kafi's ``map_fun`` parity
    (kafi/functional.py:51). Arrow-batched; ``f`` sees a plain dict per row.
    """
    def batch(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([f(r) for r in pdf.to_dict("records")])

    op, s = _map_partitions(batch, schema)
    return df.mapInPandas(op, s)


def ffilter_py(df: DataFrame, f: Callable[[dict], bool]) -> DataFrame:
    """Arbitrary Python predicate — ``filter_fun`` parity."""
    def batch(pdf: pd.DataFrame) -> pd.DataFrame:
        mask = [bool(f(r)) for r in pdf.to_dict("records")]
        return pdf[pd.Series(mask, index=pdf.index)]

    op, s = _map_partitions(batch, df.schema)
    return df.mapInPandas(op, s)


def fflatmap_py(df: DataFrame, f: Callable[[dict], list], schema: str) -> DataFrame:
    """Arbitrary Python 1:N transform — ``flatmap_fun`` parity
    (kafi/functional.py:43)."""
    def batch(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in pdf.to_dict("records"):
            rows.extend(f(r))
        return pd.DataFrame(rows)

    op, s = _map_partitions(batch, schema)
    return df.mapInPandas(op, s)


def foldl_sequential(
    df: DataFrame,
    f: Callable,
    acc0,
    order_by: Sequence[str] = (),
    n: int | None = None,
    break_fun: Callable | None = None,
):
    """True order-dependent sequential fold — the only faithful rendering of
    kafi's foldl contract (kafi/functional.py:12: sequential accumulate,
    with ``n`` row cap and ``break_fun`` early exit checked BEFORE the
    fold, kafi/storage_consumer.py:88,140-154).

    ANTI-PATTERN at scale: streams every row through the driver
    (``toLocalIterator``) — though with a cap the stream stops after
    ``n`` rows (Spark fetches partitions incrementally). Exists for
    parity with genuinely sequential accumulators; every
    aggregate-shaped use belongs in :func:`foldl`.
    """
    it = (df.orderBy(*order_by) if order_by else df).toLocalIterator()
    acc = acc0
    seen = 0
    for row in it:
        d = row.asDict(recursive=True)
        if break_fun is not None and break_fun(d):
            break
        acc = f(acc, d)
        seen += 1
        if n is not None and seen >= n:
            break
    return acc
