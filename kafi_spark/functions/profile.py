"""Table profiling — one-pass per-column data-quality statistics.

The pipeline-operator complement to ``DESCRIBE``/``ANALYZE``: null
counts, distinct cardinality, min/max, per column, computed in a single
aggregate pass (every statistic is an agg expression over the same scan
— map-side partial everywhere, one exchange total). Values are emitted
as strings in a long (column, metric, value) table so one schema covers
every column type.

``exact_distinct=False`` (default) uses HyperLogLog++
(``approx_count_distinct``) — the only sane choice at 100 TB;
``True`` switches to exact ``count_distinct`` for oracle-checkable
profiles at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


#: column types with no meaningful ordering for min/max in a profile
_UNORDERED_PREFIXES = ("array", "map", "struct", "binary")


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Long-format profile: (column, metric, value STRING).

    Metrics per column: ``count`` (non-null), ``nulls``, ``distinct``
    (approximate unless ``exact_distinct``), and for orderable types
    ``min``/``max``. One aggregate pass; the row count rides along once
    as ``(*, rows)``.
    """
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"unknown columns {missing}")

    aggs = [F.count(F.lit(1)).alias("__rows")]
    per_col: list[tuple[str, str, str]] = []  # (column, metric, agg alias)
    # positional alias index, NOT a name transform: sanitizing "a.b" to
    # "a_b" collides with a literal "a_b" column and breaks the aggregate
    for i, c in enumerate(cols):
        # backtick-escape so a literal dotted NAME is not read as a
        # struct-field path
        col = F.col("`" + c.replace("`", "``") + "`")
        aggs.append(F.count(col).alias(f"__cnt_{i}"))
        per_col.append((c, "count", f"__cnt_{i}"))
        aggs.append(
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nul_{i}")
        )
        per_col.append((c, "nulls", f"__nul_{i}"))
        distinct = (
            F.count_distinct(col) if exact_distinct
            else F.approx_count_distinct(col)
        )
        aggs.append(distinct.alias(f"__dis_{i}"))
        per_col.append((c, "distinct", f"__dis_{i}"))
        if not dtypes[c].startswith(_UNORDERED_PREFIXES):
            aggs.append(F.min(col).alias(f"__min_{i}"))
            per_col.append((c, "min", f"__min_{i}"))
            aggs.append(F.max(col).alias(f"__max_{i}"))
            per_col.append((c, "max", f"__max_{i}"))

    wide = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit("*").alias("column"),
            F.lit("rows").alias("metric"),
            F.col("__rows").cast("string").alias("value"),
        )
    ] + [
        F.struct(
            F.lit(c).alias("column"),
            F.lit(m).alias("metric"),
            F.col(a).cast("string").alias("value"),
        )
        for c, m, a in per_col
    ]
    return wide.select(F.explode(F.array(*entries)).alias("p")).select(
        "p.column", "p.metric", "p.value"
    )
