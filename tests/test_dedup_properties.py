"""Property-based n-gram Jaccard: the capped prefix-filtered AllPairs
plan (rarest-first prefixes, identical-posting-list collapse with
per-id min prefix ranks, PPJoin length filter, r11 tight two-sided
prefix bound) vs a direct Python oracle over random tiny corpora.

The parametrized equivalence tests in test_dedup.py pin six fixed
thresholds on two constructed corpora plus the real documents table;
this file lets hypothesis hunt the boundary interactions those fixed
points can miss — duplicate-heavy 4-word-vocabulary corpora make the
collapse, the cap, and the tight bound all bite at once, and the
threshold strategy includes the exact boundary values where the
ceil/slack arithmetic in the prefix length, the length filter, and
alpha could disagree with the math."""

from __future__ import annotations

import itertools

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from kafi_spark.functions import dedup

VOCAB = ["aa", "bb", "cc", "dd"]

corpora = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=10),
    min_size=2,
    max_size=8,
)

thresholds = st.one_of(
    st.sampled_from([0.0, 0.25, 1 / 3, 0.5, 2 / 3, 0.75, 1.0]),
    st.floats(min_value=0.05, max_value=0.99, allow_nan=False),
)

max_dfs = st.sampled_from([2, 3, 5, 10_000])

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _brute_capped(docs, k, threshold, max_df):
    """Direct oracle: k-shingle sets, df-capped universe, exact Jaccard."""
    sets = {}
    for did, words in docs:
        grams = [
            " ".join(words[i: i + k])
            for i in range(max(len(words) - k, 0) + 1)
        ]
        sets[did] = set(grams)
    df_count: dict[str, int] = {}
    for s in sets.values():
        for g in s:
            df_count[g] = df_count.get(g, 0) + 1
    capped = {
        did: {g for g in s if df_count[g] <= max_df}
        for did, s in sets.items()
    }
    out = set()
    for (i1, s1), (i2, s2) in itertools.combinations(sorted(capped.items()), 2):
        inter = len(s1 & s2)
        union = len(s1 | s2)
        if inter and union and inter / union >= threshold:
            out.add((i1, i2, round(inter / union, 9)))
    return out


@given(corpus=corpora, threshold=thresholds, max_df=max_dfs)
@_settings
def test_capped_prefix_filter_matches_brute_force(
        spark, corpus, threshold, max_df):
    docs = [(i, " ".join(words)) for i, words in enumerate(corpus)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_1, r.id_2, round(r.jaccard, 9))
        for r in dedup.ngram_jaccard_pairs(
            df, "text", "doc_id", k=2, threshold=threshold,
            max_df=max_df).collect()
    }
    want = _brute_capped(
        [(i, words) for i, words in enumerate(corpus)], 2, threshold, max_df)
    assert got == want


@pytest.mark.parametrize("threshold", [0.5])
def test_property_file_smoke(spark, threshold):
    """One deterministic pin so a hypothesis shrink failure always has a
    plain-pytest reproduction neighbor in the same file."""
    corpus = [["aa", "bb", "cc"], ["aa", "bb", "cc"], ["dd"]]
    docs = [(i, " ".join(w)) for i, w in enumerate(corpus)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.id_1, r.id_2) for r in dedup.ngram_jaccard_pairs(
        df, "text", "doc_id", k=2, threshold=threshold, max_df=3).collect()}
    assert got == {(0, 1)}
