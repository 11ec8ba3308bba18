"""Property-based temporal-join laws: random inputs vs pandas oracles.

``asof_join`` is checked against ``pandas.merge_asof`` (backward,
allow_exact_matches) — an independent widely-trusted implementation of
the same semantics; ``range_join`` against a brute-force nested loop.
Mirrors the reference's differential-oracle test strategy
(test/streams/test_base.py) with generated rather than fixed data.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

_EPOCH = dt.datetime(2024, 1, 1)

#: (key, seconds-offset) event lists; tight key/time ranges force
#: collisions, ties, and empty sides
events = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2),
              st.integers(min_value=0, max_value=30)),
    max_size=10,
)

_settings = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _ts(sec: int) -> dt.datetime:
    return _EPOCH + dt.timedelta(seconds=sec)


def _left_df(spark, rows):
    data = [(k, _ts(s), i) for i, (k, s) in enumerate(rows)]
    return spark.createDataFrame(data, "k int, ts timestamp, lid long")


def _right_df(spark, rows):
    # de-dup (k, ts): multiple right rows at the same instant make the
    # as-of match ambiguous in ANY engine — not a law worth pinning
    seen, data = set(), []
    for i, (k, s) in enumerate(rows):
        if (k, s) not in seen:
            seen.add((k, s))
            data.append((k, _ts(s), float(i)))
    return spark.createDataFrame(data, "k int, ts timestamp, rv double")


@pytest.mark.slow
@given(left=events, right=events)
@_settings
def test_asof_matches_pandas_merge_asof(spark, left, right):
    from kafi_spark.functions.temporal import asof_join

    l, r = _left_df(spark, left), _right_df(spark, right)
    out = asof_join(l, r, on="k", left_ts="ts", right_ts="ts", how="left")
    got = sorted(
        (row["lid"], row["rv"]) for row in out.collect()
    )

    lp = l.toPandas().sort_values(["ts", "lid"]).reset_index(drop=True)
    rp = r.toPandas().sort_values(["ts", "k"]).reset_index(drop=True)
    if len(lp) == 0:
        assert got == []
        return
    if len(rp) == 0:
        want = sorted((int(i), None) for i in lp["lid"])
    else:
        merged = pd.merge_asof(
            lp, rp, on="ts", by="k", direction="backward",
            allow_exact_matches=True,
        )
        want = sorted(
            (int(row.lid), None if pd.isna(row.rv) else float(row.rv))
            for row in merged.itertuples()
        )
    assert got == want


@pytest.mark.slow
@given(left=events, right=events,
       lo=st.integers(min_value=-10, max_value=5),
       width=st.integers(min_value=0, max_value=15))
@_settings
def test_range_join_matches_bruteforce(spark, left, right, lo, width):
    from kafi_spark.functions.temporal import range_join

    l, r = _left_df(spark, left), _right_df(spark, right)
    hi = lo + width
    out = range_join(
        l, r, on="k", left_ts="ts", right_ts="ts",
        lower_us=lo * 1_000_000, upper_us=hi * 1_000_000,
        bucket_us=3_000_000,  # force multi-bucket explode
    )
    got = sorted((row["lid"], row["rv"]) for row in out.collect())

    lrows = [(k, s, i) for i, (k, s) in enumerate(left)]
    rrows, seen = [], set()
    for i, (k, s) in enumerate(right):
        if (k, s) not in seen:
            seen.add((k, s))
            rrows.append((k, s, float(i)))
    want = sorted(
        (lid, rv)
        for (lk, ls, lid) in lrows
        for (rk, rs, rv) in rrows
        if lk == rk and ls + lo <= rs <= ls + hi
    )
    assert got == want
