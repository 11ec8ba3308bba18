"""Property-based span dedup: Spark plan vs a direct Python oracle over
random tiny corpora (arbitrary token streams, duplicate-heavy by
construction thanks to a 4-word vocabulary)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from kafi_spark.functions.spans import span_dedup

VOCAB = ["aa", "bb", "cc", "dd"]

corpora = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=9),
    min_size=1,
    max_size=6,
)

_settings = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_span_dedup(docs, W, max_occ, keep):
    """Reference implementation: chunk, count globally, filter, rejoin."""
    spans = []  # (doc_id, span_id, span)
    for did, words in docs:
        chunks = [" ".join(words[i : i + W]) for i in range(0, len(words), W)]
        spans.extend((did, sid, sp) for sid, sp in enumerate(chunks))
    counts = {}
    first = {}
    for did, sid, sp in sorted(spans):
        counts[sp] = counts.get(sp, 0) + 1
        first.setdefault(sp, (did, sid))
    out = {}
    for did, sid, sp in spans:
        survives = counts[sp] <= max_occ or (
            keep == "first" and first[sp] == (did, sid)
        )
        if survives:
            out.setdefault(did, []).append((sid, sp))
    return {
        did: (" ".join(sp for _, sp in sorted(v)), len(v))
        for did, v in out.items()
    }


@pytest.mark.parametrize("keep,max_occ", [("first", 1), ("none", 1), ("none", 2)])
@given(data=corpora)
@_settings
def test_span_dedup_matches_python_oracle(spark, data, keep, max_occ):
    docs = [(i, words) for i, words in enumerate(data)]
    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in docs], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.text, r.n_spans_kept)
        for r in span_dedup(df, span_tokens=3, max_occurrences=max_occ,
                            keep=keep).collect()
    }
    assert got == _py_span_dedup(docs, 3, max_occ, keep)
