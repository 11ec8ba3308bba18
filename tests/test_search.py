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
    from kafi_spark.functions.text import ws_tokens

    queries = df.filter("doc_id < 5").select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(ws_tokens("text"), 1, 4), " ").alias("query"))
    got = {(r.query_id, r.doc_id): r.score
           for r in srch.bm25_topk(df, queries, k=10).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    want = {(r[0], r[1]): r[2] for r in con.sql("""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS term
          FROM documents),
        postings AS (SELECT doc_id, term, COUNT(*)::BIGINT AS tf
                     FROM toks GROUP BY doc_id, term),
        doclen AS (SELECT d.doc_id, COALESCE(SUM(p.tf), 0)::BIGINT AS dl
                   FROM documents d LEFT JOIN postings p USING (doc_id)
                   GROUP BY d.doc_id),
        dfreq AS (SELECT term, COUNT(*)::BIGINT AS df FROM postings GROUP BY term),
        consts AS (SELECT COUNT(*)::DOUBLE AS n, AVG(dl) AS avgdl FROM doclen),
        qterms AS (
          SELECT doc_id AS query_id, unnest(list_distinct(
                   regexp_extract_all(lower(array_to_string(
                     (regexp_extract_all(text, '\\S+'))[1:4], ' ')), '\\S+')))
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


def test_bm25_no_phantom_empty_term(spark):
    """Review r7: text edged by non-space whitespace used to grow a ""
    token (words_of trims ASCII spaces only) whose posting list was
    corpus-sized — a query ending in \n then scored EVERY such doc.
    Empty tokens are filtered from terms on both sides."""
    from kafi_spark.functions.search import bm25_index, bm25_topk

    corpus = spark.createDataFrame(
        [(1, "alpha beta\n"), (2, "gamma delta\n"), (3, "epsilon zeta\n")],
        "doc_id long, text string",
    )
    postings, doclen, _ = bm25_index(corpus)
    assert postings.filter("term = ''").count() == 0
    assert {r.dl for r in doclen.collect()} == {2}  # no phantom +1
    q = spark.createDataFrame([(0, "alpha\n")], "query_id long, query string")
    hits = bm25_topk(corpus, q, k=10)
    assert [r.doc_id for r in hits.collect()] == [1]  # not the whole corpus


def test_reciprocal_rank_fusion(spark):
    a = spark.createDataFrame(
        [(1, 10, 5.0, 1), (1, 11, 4.0, 2), (1, 12, 3.0, 3)],
        "query_id long, doc_id long, score double, rank int")
    b = spark.createDataFrame(
        [(1, 11, 0.9, 1), (1, 13, 0.8, 2)],
        "query_id long, doc_id long, score double, rank int")
    out = sorted(srch.reciprocal_rank_fusion(a, b, k=4, rrf_k=60).collect(),
                 key=lambda r: r.rank)
    # doc 11 appears in both lists (ranks 2 and 1) → must fuse to #1
    assert out[0].doc_id == 11
    assert out[0].score == pytest.approx(1 / 62 + 1 / 61)
    # single-list docs keep their reciprocal contribution
    by_id = {r.doc_id: r.score for r in out}
    assert by_id[10] == pytest.approx(1 / 61)
    assert by_id[13] == pytest.approx(1 / 62)
    assert set(by_id) == {10, 11, 12, 13}


def test_hybrid_bm25_plus_ann_end_to_end(spark, sf_dir):
    """Lexical + vector retrieval fused: runs on the real tables and
    returns k fused hits per query with both sources represented."""
    from kafi_spark.functions.similarity import cosine_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries_txt = docs.filter("doc_id < 3").select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(F.split(F.trim("text"), r"\s+"), 1, 4), " ")
        .alias("query"))
    lex = srch.bm25_topk(docs, queries_txt, k=10)
    queries_vec = emb.filter("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), "embedding")
    vec = cosine_topk(emb.filter("vec_id >= 3"), queries_vec, k=10).select(
        "query_id", F.col("vec_id").alias("doc_id"), "score", "rank")
    fused = srch.reciprocal_rank_fusion(lex, vec, k=5)
    rows = fused.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert set(per_q) == {0, 1, 2}
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_bm25_counts_empty_docs_in_corpus_stats(spark):
    """N and avgdl are CORPUS statistics: adding token-less documents
    must lower avgdl and raise N (deflating neither silently)."""
    base = [(1, "alpha beta"), (2, "alpha gamma")]
    with_empty = base + [(3, ""), (4, None)]
    q = spark.createDataFrame([(1, "alpha")], "query_id long, query string")
    s_base = {r.doc_id: r.score for r in srch.bm25_topk(
        spark.createDataFrame(base, "doc_id long, text string"), q, k=5).collect()}
    s_full = {r.doc_id: r.score for r in srch.bm25_topk(
        spark.createDataFrame(with_empty, "doc_id long, text string"), q, k=5).collect()}
    # same retrieved docs, but N rose 2→4 with df=2 ⇒ idf strictly larger
    assert set(s_base) == set(s_full) == {1, 2}
    assert all(s_full[d] > s_base[d] for d in s_base)


def test_tfidf_vectors(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha alpha beta"), (2, "alpha gamma")],
        "doc_id long, text string")
    got = {(r.doc_id, r.term): r.weight
           for r in srch.tfidf_vectors(corpus).collect()}
    import math
    # alpha in both docs -> idf ln(2/2)=0; beta/gamma in one -> ln 2
    assert got[(1, "alpha")] == pytest.approx(0.0)
    assert got[(1, "beta")] == pytest.approx(math.log(2))
    assert got[(2, "gamma")] == pytest.approx(math.log(2))


def test_hybrid_search_one_call(spark):
    """hybrid_search composes BM25 + cosine + RRF from one corpus frame
    carrying text and embedding; a document top-ranked by BOTH rankers
    must fuse to rank 1, ahead of single-ranker winners."""
    from kafi_spark.functions.search import hybrid_search

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry", [1.0, 0.0, 0.0]),   # both signals
            (2, "apple banana zebra", [0.0, 1.0, 0.0]),    # lexical only
            (3, "yak zebra quail", [0.9, 0.1, 0.0]),       # vector only
            (4, "unrelated words entirely", [0.0, 0.0, 1.0]),
        ],
        "doc_id long, text string, embedding array<double>")
    queries = spark.createDataFrame(
        [(100, "apple banana cherry", [1.0, 0.0, 0.0])],
        "query_id long, query string, embedding array<double>")
    out = {r.rank: r.doc_id for r in hybrid_search(docs, queries, k=3).collect()}
    assert sorted(out) == [1, 2, 3]
    assert out[1] == 1                      # top of both lists
    assert set(out.values()) == {1, 2, 3}   # each single-list winner fuses in


def test_hybrid_search_real_tables_shape(spark, sf_dir):
    from kafi_spark.functions.embed import hash_embedding_col
    from kafi_spark.functions.search import hybrid_search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text",
        hash_embedding_col(F.col("text"), dim=32).alias("embedding"))
    queries = docs.filter("doc_id < 3").select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(F.split(F.trim("text"), r"\s+"), 1, 6), " ")
        .alias("query"),
        "embedding")
    out = hybrid_search(docs, queries, k=5)
    per_q = {}
    for r in out.collect():
        per_q.setdefault(r.query_id, []).append((r.rank, r.doc_id))
    assert set(per_q) == {0, 1, 2}
    for qid, hits in per_q.items():
        assert sorted(r for r, _ in hits) == [1, 2, 3, 4, 5]
        # the query's source doc has cosine rank 1 (its own embedding);
        # RRF must keep it in the fused top-5 of a 500-doc corpus
        assert qid in {d for _, d in hits}
