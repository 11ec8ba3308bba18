"""Span/line-level exact dedup (kafi_spark.functions.spans)."""

from __future__ import annotations

import duckdb
import pytest

from kafi_spark.functions import spans as sp
from tests.conftest import rows


@pytest.fixture(scope="module")
def docs(spark):
    data = [
        (1, "a b c d e f"),           # spans(3): "a b c", "d e f"
        (2, "a b c x y z"),           # shares "a b c" with doc 1
        (3, "x y z"),                 # shares "x y z" with doc 2
        (4, "unique words only here"),
        (5, "a b c"),                 # entirely boilerplate
    ]
    return spark.createDataFrame(data, "doc_id long, text string")


def test_text_spans_chunking(docs):
    got = rows(sp.text_spans(docs, span_tokens=3).filter("doc_id = 1"))
    assert got == [(1, 0, "a b c"), (1, 1, "d e f")]
    # shorter-than-W document is one span
    got = rows(sp.text_spans(docs, span_tokens=3).filter("doc_id = 3"))
    assert got == [(3, 0, "x y z")]
    # last span may be ragged
    got = rows(sp.text_spans(docs, span_tokens=4).filter("doc_id = 1"))
    assert got == [(1, 0, "a b c d"), (1, 1, "e f")]


def test_span_dedup_keep_first(docs):
    out = {r.doc_id: (r.text, r.n_spans_kept)
           for r in sp.span_dedup(docs, span_tokens=3, keep="first").collect()}
    # "a b c" survives only in doc 1 (first by (doc_id, span_id));
    # "x y z" survives only in doc 2
    assert out[1] == ("a b c d e f", 2)
    assert out[2] == ("x y z", 1)
    assert 3 not in out          # every span removed → doc disappears
    assert out[4] == ("unique words only here", 2)  # 4 tokens → 2 spans
    assert 5 not in out


def test_span_dedup_keep_none(docs):
    out = {r.doc_id: r.text
           for r in sp.span_dedup(docs, span_tokens=3, keep="none").collect()}
    # every copy of the duplicated spans is dropped
    assert out == {1: "d e f", 4: "unique words only here"}


def test_span_dedup_max_occurrences(docs):
    # "x y z" occurs twice → survives everywhere at max_occurrences=2;
    # "a b c" occurs three times → still deduped
    out = {r.doc_id: r.text
           for r in sp.span_dedup(docs, span_tokens=3,
                                  max_occurrences=2, keep="none").collect()}
    assert out == {1: "d e f", 2: "x y z", 3: "x y z",
                   4: "unique words only here"}


def test_line_dedup(spark):
    data = [
        (1, "keep me\nfooter boilerplate\nunique line"),
        (2, "another doc\nfooter boilerplate"),
        (3, "footer boilerplate"),
    ]
    df = spark.createDataFrame(data, "doc_id long, text string")
    out = {r.doc_id: r.text for r in sp.line_dedup(df).collect()}
    assert out == {1: "keep me\nunique line", 2: "another doc"}
    # keep='first' keeps the doc-1 occurrence instead
    out = {r.doc_id: r.text for r in sp.line_dedup(df, keep="first").collect()}
    assert out == {1: "keep me\nfooter boilerplate\nunique line",
                   2: "another doc"}


def test_span_dedup_validation(docs):
    with pytest.raises(ValueError):
        sp.span_dedup(docs, keep="last")
    with pytest.raises(ValueError):
        sp.span_dedup(docs, max_occurrences=0)
    with pytest.raises(ValueError):
        sp.text_spans(docs, span_tokens=0)


def test_span_dedup_matches_duckdb_oracle(spark, sf_dir):
    """Full differential on the real documents table."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {r.doc_id: (r.text, r.n_spans_kept)
           for r in sp.span_dedup(df, span_tokens=8).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    want = {r[0]: (r[1], r[2]) for r in con.sql("""
        WITH ws AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
                    FROM documents),
        spans AS (
          SELECT doc_id, CAST(s.i AS INT) AS span_id,
                 array_to_string(w[s.i*8+1 : s.i*8+8], ' ') AS span
          FROM ws, LATERAL (SELECT unnest(range(0,
                 greatest(CAST(ceil(len(w)/8.0) AS BIGINT), 1))) AS i) s),
        ranked AS (
          SELECT *, COUNT(*) OVER (PARTITION BY span) AS n,
                 ROW_NUMBER() OVER (PARTITION BY span
                                    ORDER BY doc_id, span_id) AS rn
          FROM spans)
        SELECT doc_id, string_agg(span, ' ' ORDER BY span_id),
               COUNT(*) FROM ranked WHERE n <= 1 OR rn = 1 GROUP BY doc_id
    """).fetchall()}
    assert got == want


def test_chunk_text_nonoverlapping(spark):
    df = spark.createDataFrame([(1, "a b c d e f g")], "doc_id long, text string")
    got = sorted(
        (r.chunk_id, r.chunk, r.n_tokens, r.start_token)
        for r in sp.chunk_text(df, max_tokens=3).collect())
    assert got == [(0, "a b c", 3, 0), (1, "d e f", 3, 3), (2, "g", 1, 6)]


def test_chunk_text_overlapping_stride(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    got = sorted(
        (r.chunk_id, r.chunk, r.start_token)
        for r in sp.chunk_text(df, max_tokens=3, stride=2).collect())
    # starts 0,2: windows abc, cde — start 2 already covers the last
    # token, so no ragged third window is emitted
    assert got == [(0, "a b c", 0), (1, "c d e", 2)]
    # short doc → one chunk
    df2 = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    got2 = [(r.chunk, r.n_tokens) for r in
            sp.chunk_text(df2, max_tokens=3, stride=2).collect()]
    assert got2 == [("x y", 2)]


def test_chunk_text_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        sp.chunk_text(df, max_tokens=0)
    with pytest.raises(ValueError):
        sp.chunk_text(df, max_tokens=4, stride=5)


@pytest.mark.parametrize("keep,max_occ", [("first", 1), ("none", 2)])
def test_skew_safe_variant_is_equivalent(spark, sf_dir, keep, max_occ):
    """The aggregate-then-join skew_safe plan must return byte-identical
    results to the window plan on the real documents table."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {r.doc_id: (r.text, r.n_spans_kept)
         for r in sp.span_dedup(df, span_tokens=8, keep=keep,
                                max_occurrences=max_occ).collect()}
    b = {r.doc_id: (r.text, r.n_spans_kept)
         for r in sp.span_dedup(df, span_tokens=8, keep=keep,
                                max_occurrences=max_occ,
                                skew_safe=True).collect()}
    assert a == b
