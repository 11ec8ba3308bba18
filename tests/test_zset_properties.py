"""Property-based Z-set algebra laws (hypothesis over small weighted bags).

The reference validates streams semantics with hand-built oracles
(test/streams/test_base.py); these properties pin the algebra itself:
consolidation idempotence, distinct set-semantics, union commutativity,
minus/intersect relationships — for arbitrary weights including
retractions and zero-nets.
"""

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

# keys include None: Z-set record identity is groupBy/dict identity,
# where NULL == NULL (pydbsp keys records by Python equality) — the
# join-based set ops must agree with the Counter oracle on None keys
# (round-8 session fix: plain `=` joins silently dropped them)
weighted_bags = st.lists(
    st.tuples(st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
              st.integers(min_value=-3, max_value=3)),
    max_size=12,
)

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, bag):
    if not bag:
        return spark.createDataFrame([], "k int, weight long")
    return spark.createDataFrame([(k, w) for k, w in bag], "k int, weight long")


def _net(bag):
    c = Counter()
    for k, w in bag:
        c[k] += w
    return c


def _key(t):
    # None keys sort first (tuples mixing None and int don't compare)
    return (t[0] is not None, t[0] if t[0] is not None else 0, t[1])


def _collect(df):
    return sorted(((r["k"], r["weight"]) for r in df.collect()), key=_key)


@pytest.mark.slow
@given(bag=weighted_bags)
@_settings
def test_consolidate_matches_counter_and_is_idempotent(spark, bag):
    from kafi_spark.streams.zset import consolidate

    got = _collect(consolidate(_df(spark, bag)))
    want = sorted(((k, w) for k, w in _net(bag).items() if w != 0), key=_key)
    assert got == want
    assert _collect(consolidate(consolidate(_df(spark, bag)))) == want


@pytest.mark.slow
@given(bag=weighted_bags)
@_settings
def test_distinct_keeps_net_positive_at_weight_one(spark, bag):
    from kafi_spark.streams.zset import zset_distinct

    got = _collect(zset_distinct(_df(spark, bag)))
    want = sorted(((k, 1) for k, w in _net(bag).items() if w > 0), key=_key)
    assert got == want


@pytest.mark.slow
@given(a=weighted_bags, b=weighted_bags)
@_settings
def test_union_commutative_and_set_laws(spark, a, b):
    from kafi_spark.streams.zset import zset_intersect, zset_minus, zset_union

    da, db = _df(spark, a), _df(spark, b)
    na, nb = _net(a), _net(b)
    pa = {k for k, w in na.items() if w > 0}
    pb = {k for k, w in nb.items() if w > 0}

    assert _collect(zset_union(da, db)) == _collect(zset_union(db, da))
    # union = distinct over the bag sum: net(a)+net(b) > 0 survives
    assert {k for k, _ in _collect(zset_union(da, db))} == {
        k for k in set(na) | set(nb) if na.get(k, 0) + nb.get(k, 0) > 0
    }
    assert {k for k, _ in _collect(zset_intersect(da, db))} == pa & pb
    # reference minus: net(a) - net(b) > 0 survives (topologynode.py:330-350)
    assert {k for k, _ in _collect(zset_minus(da, db))} == {
        k for k in set(na) | set(nb) if na.get(k, 0) - nb.get(k, 0) > 0
    }


@pytest.mark.slow
@given(a=weighted_bags, b=weighted_bags)
@_settings
def test_except_is_presence_difference(spark, a, b):
    from kafi_spark.streams.zset import zset_except

    da, db = _df(spark, a), _df(spark, b)
    na, nb = _net(a), _net(b)
    pa = {k for k, w in na.items() if w > 0}
    pb = {k for k, w in nb.items() if w > 0}
    # SQL EXCEPT: net-present in a and not net-present in b (NULL keys
    # behave as duplicates of each other, like the Counter oracle)
    assert {k for k, _ in _collect(zset_except(da, db))} == pa - pb
