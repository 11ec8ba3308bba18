"""BM25 lexical search (kafi_spark.functions.search)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kafi_spark.functions import search as srch


def test_bm25_ranks_relevance(spark):
    corpus = spark.createDataFrame(
        [(1, "spark shuffle partition plan"),
         (2, "spark spark spark cooking"),
         (3, "flour butter sugar oven"),
         (4, "partition plan partition plan shuffle")],
        "doc_id long, text string")
    queries = spark.createDataFrame(
        [(10, "spark shuffle")], "query_id long, query string")
    out = srch.bm25_topk(corpus, queries, k=3)
    rows = sorted(out.collect(), key=lambda r: r.rank)
    ids = [r.doc_id for r in rows]
    assert 3 not in ids                # no term overlap → never retrieved
    assert set(ids) == {1, 2, 4}
    # doc 1 matches BOTH terms → must beat doc 2 (only 'spark', saturated
    # tf) and doc 4 (only 'shuffle')
    assert ids[0] == 1
    assert all(rows[i].score >= rows[i + 1].score for i in range(len(rows) - 1))


def test_bm25_query_term_set_semantics(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma")], "doc_id long, text string")
    q_once = spark.createDataFrame([(1, "alpha")], "query_id long, query string")
    q_dup = spark.createDataFrame([(1, "alpha alpha alpha")],
                                  "query_id long, query string")
    s1 = {(r.doc_id, r.score) for r in srch.bm25_topk(corpus, q_once, k=5).collect()}
    s2 = {(r.doc_id, r.score) for r in srch.bm25_topk(corpus, q_dup, k=5).collect()}
    assert s1 == s2


def test_bm25_matches_duckdb_oracle(spark, sf_dir):
    """Full formula differential on the real documents table: 5 queries
    drawn from document texts, every score compared at 1e-9."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    queries = df.filter("doc_id < 5").select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(F.split(F.trim("text"), r"\s+"), 1, 4), " ")
        .alias("query"))
    got = {(r.query_id, r.doc_id): r.score
           for r in srch.bm25_topk(df, queries, k=10).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    want = {(r[0], r[1]): r[2] for r in con.sql("""
        WITH toks AS (
          SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
          FROM documents),
        postings AS (SELECT doc_id, term, COUNT(*)::BIGINT AS tf
                     FROM toks GROUP BY doc_id, term),
        doclen AS (SELECT doc_id, SUM(tf)::BIGINT AS dl FROM postings GROUP BY doc_id),
        dfreq AS (SELECT term, COUNT(*)::BIGINT AS df FROM postings GROUP BY term),
        consts AS (SELECT COUNT(*)::DOUBLE AS n, AVG(dl) AS avgdl FROM doclen),
        qterms AS (
          SELECT doc_id AS query_id, unnest(list_distinct(
                   string_split_regex(lower(trim(array_to_string(
                     (string_split_regex(trim(text), '\\s+'))[1:4], ' '))), '\\s+')))
                 AS term
          FROM documents WHERE doc_id < 5),
        scored AS (
          SELECT q.query_id, p.doc_id,
                 ln(1.0 + (c.n - f.df + 0.5) / (f.df + 0.5))
                 * (p.tf * 2.2)
                 / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / c.avgdl)) AS s
          FROM postings p
          JOIN qterms q USING (term)
          JOIN dfreq f USING (term)
          JOIN doclen l USING (doc_id)
          CROSS JOIN consts c),
        agg AS (SELECT query_id, doc_id, SUM(s) AS score FROM scored
                GROUP BY query_id, doc_id)
        SELECT query_id, doc_id, score FROM agg
        QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id) <= 10
    """).fetchall()}
    assert set(got) == set(want)
    for key in got:
        assert got[key] == pytest.approx(want[key], rel=1e-9), key
