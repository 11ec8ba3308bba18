"""Z-set algebra vs hand-computed weighted-multiset semantics
(reference behavior: kafi/streams/topologynode.py, pydbsp ZSet)."""

from __future__ import annotations

import pytest

from kafi_spark.streams import zset
from tests.conftest import rows


def zs(spark, *pairs):
    return spark.createDataFrame(list(pairs), "v string, weight long")


def test_from_to_records(spark):
    recs = spark.createDataFrame([("a",), ("a",), ("b",)], "v string")
    z = zset.from_records(recs)
    assert rows(z) == [("a", 1), ("a", 1), ("b", 1)]
    back = zset.to_records(zset.consolidate(z))
    assert rows(back) == [("a",), ("a",), ("b",)]


def test_to_records_drops_retractions(spark):
    z = zs(spark, ("a", 2), ("b", -1), ("c", 0))
    assert rows(zset.to_records(z)) == [("a",), ("a",)]


def test_neg_and_consolidate(spark):
    z = zs(spark, ("a", 1), ("a", 1), ("a", -2), ("b", 3))
    assert rows(zset.consolidate(z)) == [("b", 3)]
    assert rows(zset.consolidate(zset.neg(z))) == [("b", -3)]
    assert rows(zset.consolidate(z, keep_zero=True)) == [("a", 0), ("b", 3)]


def test_distinct(spark):
    z = zs(spark, ("a", 5), ("b", 1), ("c", -1), ("d", 1), ("d", -1))
    assert rows(zset.zset_distinct(z)) == [("a", 1), ("b", 1)]


def test_union(spark):
    a = zs(spark, ("x", 2), ("y", 1))
    b = zs(spark, ("y", 1), ("z", 1), ("w", -1))
    assert rows(zset.zset_union(a, b)) == [("x", 1), ("y", 1), ("z", 1)]


def test_intersect(spark):
    a = zs(spark, ("x", 2), ("y", 1), ("z", -1))
    b = zs(spark, ("y", 3), ("z", 1), ("w", 1))
    assert rows(zset.zset_intersect(a, b)) == [("y", 1)]


def test_minus_reference_net_semantics(spark):
    # reference minus = distinct(a + neg(b)) (topologynode.py:330-350):
    # 'a' twice in left, once in right -> net +1 -> SURVIVES
    a = zs(spark, ("a", 2), ("b", 1), ("c", 1))
    b = zs(spark, ("a", 1), ("c", -1))
    assert rows(zset.zset_minus(a, b)) == [("a", 1), ("b", 1), ("c", 1)]
    # 'd' equal weight both sides -> net 0 -> gone
    assert rows(zset.zset_minus(zs(spark, ("d", 1)), zs(spark, ("d", 1)))) == []


def test_except_sql_semantics(spark):
    # SQL EXCEPT: presence flags — 'a' present in both sides -> dropped
    a = zs(spark, ("a", 2), ("b", 1), ("c", 1))
    b = zs(spark, ("a", 1), ("c", -1))
    assert rows(zset.zset_except(a, b)) == [("b", 1), ("c", 1)]


def test_set_ops_treat_null_fields_as_equal(spark):
    # Z-set record identity is groupBy identity: NULL == NULL (pydbsp
    # keys records by Python equality, where None == None; SQL
    # INTERSECT/EXCEPT also treat NULLs as duplicates). The join-based
    # ops used plain `=` and silently disagreed with zset_minus on the
    # same input (r8 session review).
    a = zs(spark, (None, 1), ("x", 1))
    b = zs(spark, (None, 1), ("y", 1))
    bag = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert bag(zset.zset_intersect(a, b)) == {(None, 1)}
    assert bag(zset.zset_except(a, b)) == {("x", 1)}
    # sibling aggregate form agrees: net 0 for the NULL record (and
    # net -1 for y, which only b holds)
    assert bag(zset.zset_minus(a, b)) == {("x", 1)}


def test_weight_only_zset_intersect_raises(spark):
    """round-9 ADVICE: a weight-only zset (no record columns) used to
    fall through _null_safe_on as on=None — a silent unconditional
    join; it must refuse instead."""
    import pytest as _pytest

    from kafi_spark.streams import zset as z

    df = spark.createDataFrame([(1,), (1,)], f"{z.WEIGHT} long")
    with _pytest.raises(ValueError, match="record columns"):
        z.zset_intersect(df, df)
    with _pytest.raises(ValueError, match="record columns"):
        z.zset_except(df, df)


def test_side_weights_agree_with_standalone_ops(spark):
    """r12 shared-plan base: every binary set op must equal a filter
    over zset_side_weights' two per-record sums — the algebra q_zset_ops
    relies on to replace 6 exchanges with 1."""
    from pyspark.sql import functions as F

    a = zs(spark, ("a", 2), ("b", 1), ("c", 1), ("d", 1), (None, 1))
    b = zs(spark, ("a", 1), ("c", -1), ("d", 1), ("e", 3), (None, 1))
    w = zset.zset_side_weights(a, b)
    wa, wb = F.col("__wa"), F.col("__wb")
    bag = lambda df: {tuple(r) for r in df.select("v").collect()}  # noqa: E731

    assert bag(w.filter(wa + wb > 0)) == bag(zset.zset_union(a, b))
    assert bag(w.filter((wa > 0) & (wb > 0))) == bag(zset.zset_intersect(a, b))
    assert bag(w.filter(wa - wb > 0)) == bag(zset.zset_minus(a, b))
    assert bag(w.filter((wa > 0) & (wb <= 0))) == bag(zset.zset_except(a, b))
    # sides that lack a record contribute weight 0, not NULL
    e = w.filter(F.col("v") == "e").collect()
    assert [(r["__wa"], r["__wb"]) for r in e] == [(0, 3)]


def test_side_weights_weight_only_raises(spark):
    df = spark.createDataFrame([(1,)], f"{zset.WEIGHT} long")
    with pytest.raises(ValueError, match="record columns"):
        zset.zset_side_weights(df, df)
