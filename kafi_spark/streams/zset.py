"""Z-set (weighted multiset) algebra on DataFrames.

The reference's streaming data model is pydbsp's ZSet: a mapping
``record -> weight`` where +w means w insertions and -w retractions
(kafi/streams/topologynode.py:23, SURVEY §1.4). The distributed encoding is
a plain ``weight BIGINT`` column; every operator below is a declarative
DataFrame plan, so the same algebra runs in batch, in ``foreachBatch``
micro-batches, and (where Spark's streaming planner allows) directly on
streaming DataFrames.

Scale notes: ``consolidate`` is one hash aggregation on the record columns
(map-side partial aggregation collapses most weight pairs before the
shuffle); the set ops are consolidations of unions — no joins, no windows.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, functions as F

#: canonical weight column name
WEIGHT = "weight"


def _record_cols(df: DataFrame) -> list[str]:
    return [c for c in df.columns if c != WEIGHT]


def from_records(df: DataFrame) -> DataFrame:
    """Records -> Z-set with weight 1 each (topologynode.py:1084-1088)."""
    if WEIGHT in df.columns:
        return df
    return df.withColumn(WEIGHT, F.lit(1).cast("long"))


def to_records(df: DataFrame) -> DataFrame:
    """Z-set -> bag of records: keep positive weights, repeat w times
    (topologynode.py:1138-1146). ``explode(sequence)`` keeps the expansion
    JVM-side and distributed."""
    pos = df.filter(F.col(WEIGHT) > 0)
    return (
        pos.withColumn("__i", F.explode(F.sequence(F.lit(1), F.col(WEIGHT))))
        .drop("__i", WEIGHT)
    )


def neg(df: DataFrame) -> DataFrame:
    """Negate weights (topologynode.py:197-204)."""
    return df.withColumn(WEIGHT, -F.col(WEIGHT))


def consolidate(df: DataFrame, keep_zero: bool = False) -> DataFrame:
    """Sum weights per distinct record, dropping zeros — pydbsp's
    consolidation, applied by the reference after flatmap and inside
    distinct/set ops (topologynode.py:208-229).
    """
    cols = _record_cols(df)
    out = df.groupBy(*cols).agg(F.sum(WEIGHT).alias(WEIGHT))
    if not keep_zero:
        out = out.filter(F.col(WEIGHT) != 0)
    return out


def zset_distinct(df: DataFrame) -> DataFrame:
    """Set-ify: any record with net positive weight gets weight 1
    (topologynode.py:278-294 via DeltaLiftedDeltaLiftedDistinct)."""
    cols = _record_cols(df)
    return (
        df.groupBy(*cols)
        .agg(F.sum(WEIGHT).alias("__w"))
        .filter(F.col("__w") > 0)
        .drop("__w")
        .withColumn(WEIGHT, F.lit(1).cast("long"))
    )


def zset_union(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set union = add + distinct (topologynode.py:298-318)."""
    return zset_distinct(a.unionByName(b))


def _null_safe_on(ta: DataFrame, tb: DataFrame, cols: list[str]):
    """Null-safe equi-join condition over the record columns. Z-set
    identity treats two NULL field values as THE SAME record — groupBy
    already does (so :func:`consolidate` and :func:`zset_minus` net
    them), and SQL's INTERSECT/EXCEPT treat NULLs as duplicates too.
    A plain ``on=cols`` join uses ``=`` (null never matches null), so a
    record with any NULL field could never intersect and always
    survived EXCEPT — silently diverging from the sibling aggregate
    forms on the same input (round-8 session review).

    Refuses an empty record-column list (round-9 ADVICE): returning
    None would make ``DataFrame.join(on=None)`` an unconditional
    cross-style join for a weight-only zset — degenerate input, but it
    must fail loudly, not silently explode."""
    if not cols:
        raise ValueError(
            "zset has no record columns (weight-only frame) — "
            "intersect/except are undefined without a record identity")
    cond = None
    for c in cols:
        e = ta[c].eqNullSafe(tb[c])
        cond = e if cond is None else cond & e
    return cond


def zset_intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set intersection (topologynode.py:322-326 implements it as an
    equality theta-join; the aggregate form below is one shuffle instead of
    a join): records present with positive net weight on BOTH sides."""
    cols = _record_cols(a)
    ta = a.groupBy(*cols).agg(F.sum(WEIGHT).alias("__wa"))
    tb = b.groupBy(*cols).agg(F.sum(WEIGHT).alias("__wb"))
    return (
        ta.join(tb, on=_null_safe_on(ta, tb, cols), how="inner")
        .filter((F.col("__wa") > 0) & (F.col("__wb") > 0))
        .select(*[ta[c] for c in cols])
        .withColumn(WEIGHT, F.lit(1).cast("long"))
    )


def zset_minus(a: DataFrame, b: DataFrame) -> DataFrame:
    """Reference minus = distinct(a + neg(b)) (topologynode.py:330-350):
    a record survives iff its NET weight across both sides is positive,
    so weight 2 in ``a`` vs 1 in ``b`` survives (net +1). This is bag
    arithmetic, not SQL ``EXCEPT`` — for presence-based difference use
    :func:`zset_except`. One union + one hash aggregation (map-side
    partial), no join."""
    return zset_distinct(a.unionByName(neg(b)))


def zset_side_weights(a: DataFrame, b: DataFrame) -> DataFrame:
    """Per-record net weights of BOTH sides from ONE aggregation:
    ``(record_cols..., __wa, __wb)`` where ``__wa``/``__wb`` are the
    summed weights of ``a``/``b`` (0 where a side lacks the record).

    The r12 shared-plan base for running several set ops over the same
    pair: every binary op below is a filter over these two sums —
    union ⇔ ``__wa + __wb > 0``, minus (bag arithmetic)
    ⇔ ``__wa - __wb > 0``, intersect ⇔ ``__wa > 0 AND __wb > 0``,
    except ⇔ ``__wa > 0 AND __wb <= 0`` — so a tag-union of N ops costs
    ONE shuffle (this aggregation, reused by every leg) instead of one
    or two per op. Implemented as a side-tagged union aggregated once
    (no join, hence no null-matching caveat: groupBy already treats
    NULL fields as one record, exactly the Z-set identity
    :func:`_null_safe_on` documents)."""
    cols = _record_cols(a)
    if not cols:
        raise ValueError(
            "zset has no record columns (weight-only frame) — "
            "set ops are undefined without a record identity")
    zero = F.lit(0).cast("long")
    ta = a.select(
        *cols, F.col(WEIGHT).alias("__wa"), zero.alias("__wb"))
    tb = b.select(*cols, zero.alias("__wa"), F.col(WEIGHT).alias("__wb"))
    return (
        ta.unionByName(tb)
        .groupBy(*cols)
        .agg(F.sum("__wa").alias("__wa"), F.sum("__wb").alias("__wb"))
    )


def zset_except(a: DataFrame, b: DataFrame) -> DataFrame:
    """SQL ``EXCEPT`` semantics: records net-present in ``a`` and not
    net-present in ``b`` — a record 2x in ``a`` and 1x in ``b`` does NOT
    survive. Deviates from the reference's minus (see :func:`zset_minus`);
    kept because it is the difference most SQL users expect."""
    cols = _record_cols(a)
    ta = a.groupBy(*cols).agg(F.sum(WEIGHT).alias("__wa"))
    tb = b.groupBy(*cols).agg(F.sum(WEIGHT).alias("__wb"))
    return (
        ta.join(tb, on=_null_safe_on(ta, tb, cols), how="left")
        .filter((F.col("__wa") > 0) & (F.coalesce(F.col("__wb"), F.lit(0)) <= 0))
        .select(*[ta[c] for c in cols])
        .withColumn(WEIGHT, F.lit(1).cast("long"))
    )
