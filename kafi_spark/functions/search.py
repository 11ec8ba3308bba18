"""Lexical search over a document corpus — BM25 top-k.

The similarity family (:mod:`similarity`, :mod:`pq`) answers "nearest
by embedding"; this module answers the complementary lexical question
— BM25 (Robertson/Spärck Jones), the bar every retrieval pipeline
benchmarks against and the cheap first stage of hybrid retrieval.

Plan shape (posting-list join, no UDFs anywhere):

* index — one explode builds (doc, term, tf) with a map-side-combined
  aggregate; document lengths and the corpus constants (N, avgdl) are
  one more aggregate, injected declaratively via a 1-row broadcast
  cross join (no driver collect);
* term statistics — df per term: the shuffle is bounded by vocabulary
  size, not corpus size;
* scoring — the query term set (tiny by construction) BROADCASTS onto
  the posting lists keyed by term, so only postings of queried terms
  are touched; per-(query, doc) partial scores sum in one aggregate and
  a window takes top-k. The corpus text itself is never shuffled —
  everything after the index carries (doc, term, tf) triples.

Scores are fixed-order double arithmetic; the pytest suite carries a
DuckDB differential at 1e-9 relative tolerance (sum order across
engines differs at the last ulp, so this is tests-only, not a driver
value-hash query).

Reference scope: beyond-reference LLM-pipeline layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

#: Probe hook (tools/scale_probe.py, same pattern as dedup.DIAG): when
#: set to a dict, bm25_topk deposits its matched-postings frame here
#: ('bm25_matched' — the (query, doc, term) rows entering the score
#: aggregate). Lazy; the probe decides whether to pay the count.
DIAG: dict | None = None


def _terms(text_col, lowercase: bool = True):
    # the ONE tokenizer definition (text.words_of) so BM25 terms can
    # never silently diverge from the quality-feature word semantics —
    # minus phantom empty tokens (review r7): words_of trims only ASCII
    # spaces, so text edged by \n/\t grows a "" token whose posting
    # list is CORPUS-sized; one "" query term would then pull every
    # such doc into scoring and void the touched-postings bound
    from .text import words_of

    return F.filter(
        words_of(text_col, lowercase=lowercase),
        lambda w: F.length(w) > 0,
    )


def bm25_index(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build the three BM25 frames: postings ``(id, term, tf)``,
    doc lengths ``(id, dl)``, and term document-frequencies
    ``(term, df)``. Reusable across query batches — persist the
    postings to parquet for a standing index.

    ``materialize`` checkpoints the postings before deriving the other
    two frames: FOUR consumers hang off the tokenize subtree (scoring,
    dl, df, and the corpus constants) and without the barrier each
    re-executes the corpus explode — six scans in the observed physical
    plan (the repo's standard subtree-re-execution hazard; see
    PLANS.md). Pass False only when writing the postings to storage
    anyway."""
    toks = corpus.select(
        F.col(id_col), F.explode(_terms(F.col(text_col))).alias("term")
    )
    postings = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    if materialize:
        postings = postings.localCheckpoint()
    # doc lengths over the WHOLE corpus, dl=0 for empty/null-text docs:
    # Okapi's N and avgdl are corpus statistics — deriving them from
    # the postings alone silently drops token-less documents and
    # deflates every idf term relative to external BM25 implementations
    token_sums = postings.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("__dl")
    )
    doclen = (
        corpus.select(id_col)
        .join(token_sums, id_col, "left")
        .select(id_col, F.coalesce("__dl", F.lit(0)).cast("long").alias("dl"))
    )
    dfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    return postings, doclen, dfreq


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_text_col: str = "query",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Top-k documents per query by BM25.

    ``score(q,d) = Σ_{t∈q∩d} ln(1 + (N−df+0.5)/(df+0.5)) ·
    tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`` — the classic Okapi
    formulation with the +1 idf floor (never negative). Duplicate terms
    in a query count once (set semantics). Output:
    (query_id, doc_id, score, rank), ties broken by doc id.
    """
    postings, doclen, dfreq = bm25_index(corpus, text_col, id_col)
    # doclen feeds TWO consumers (the consts aggregate and the scoring
    # join); without a barrier each re-runs the corpus-id scan + join
    # (the standard subtree-re-execution hazard — bounded here: one
    # (id, dl) row per doc, same order as the checkpointed postings)
    doclen = doclen.localCheckpoint()
    consts = doclen.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("dl").alias("__avgdl"),
    )
    qterms = queries.select(
        F.col(query_id_col),
        F.explode(F.array_distinct(_terms(F.col(query_text_col)))).alias("term"),
    )
    # idf only for the QUERIED terms: dfreq is vocabulary-sized (the
    # module's millions-of-terms case — tfidf_vectors refuses to
    # broadcast it for exactly that reason), so semi-join it down to the
    # query-term set first; the broadcast is then bounded by the number
    # of distinct query terms, not the vocabulary
    idf = (
        dfreq.join(qterms.select("term").distinct(), "term", "left_semi")
        .crossJoin(F.broadcast(consts))
        .select(
            "term",
            F.log(
                F.lit(1.0)
                + (F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("__idf"),
        )
    )
    scored = (
        postings.join(F.broadcast(qterms), "term")
        .join(F.broadcast(idf), "term")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(consts))
        .select(
            F.col(query_id_col),
            F.col(id_col),
            (
                F.col("__idf")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1
                    * (1.0 - b + b * F.col("dl") / F.col("__avgdl"))
                )
            ).alias("__s"),
        )
    )
    if DIAG is not None:
        DIAG["bm25_matched"] = scored
    per_doc = scored.groupBy(query_id_col, id_col).agg(
        F.sum("__s").alias("score")
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("score").desc(), F.col(id_col))
    return per_doc.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def reciprocal_rank_fusion(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Hybrid-retrieval fusion: combine two ranked candidate frames
    (e.g. :func:`bm25_topk` and an ANN ``cosine_topk`` — both emit
    ``(query_id, id, score, rank)``) by Reciprocal Rank Fusion
    (Cormack et al. 2009): ``score(d) = Σ_lists 1/(rrf_k + rank_d)``,
    missing-from-a-list contributes 0. Scale-free (no score
    calibration between lexical and vector scores needed) and one
    outer-join + window over candidate sets that are tiny by
    construction (≤ Q·k rows each)."""
    a = ranked_a.select(
        query_id_col, id_col,
        (1.0 / (rrf_k + F.col("rank"))).alias("__ra"))
    b = ranked_b.select(
        query_id_col, id_col,
        (1.0 / (rrf_k + F.col("rank"))).alias("__rb"))
    fused = (
        a.join(b, [query_id_col, id_col], "full_outer")
        .select(
            query_id_col,
            id_col,
            (F.coalesce(F.col("__ra"), F.lit(0.0))
             + F.coalesce(F.col("__rb"), F.lit(0.0))).alias("score"),
        )
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("score").desc(), F.col(id_col))
    return fused.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def tfidf_vectors(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sparse TF-IDF document vectors in long format:
    ``(id, term, weight)`` with ``weight = tf · ln(N / df)`` — the
    classical-ML feature representation, straight off the BM25 index
    frames (same tokenizer, so weights and BM25 scores agree on what a
    term is). Long format IS the scale-safe representation: a vocabulary
    of millions never materializes as a dense row."""
    postings, doclen, dfreq = bm25_index(corpus, text_col, id_col)
    # N straight off the corpus ids — counting doclen would execute its
    # corpus-sized id⋈token-sums join just to learn a row count it has
    # by construction
    n = corpus.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    idf = dfreq.crossJoin(F.broadcast(n)).select(
        "term", F.log(F.col("__n") / F.col("df")).alias("__idf")
    )
    # NO broadcast hint on idf: it is vocabulary-sized (the docstring's
    # millions-of-terms case), and postings already shuffle by term for
    # dfreq — AQE broadcasts small vocabularies on its own
    return postings.join(idf, "term").select(
        F.col(id_col), "term", (F.col("tf") * F.col("__idf")).alias("weight")
    )


def hybrid_search(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    candidates_per_list: int | None = None,
    rrf_k: int = 60,
    text_col: str = "text",
    vec_col: str = "embedding",
    id_col: str = "doc_id",
    query_text_col: str = "query",
    query_vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Lexical + dense hybrid retrieval in one call: BM25 over
    ``text_col`` and exact cosine over ``vec_col``, fused with
    Reciprocal Rank Fusion — the standard two-tower retrieval recipe
    (each ranker catches what the other misses; RRF needs no score
    calibration between the two).

    ``corpus`` carries both columns; ``queries`` carries the query text
    and query vector. Each ranker retrieves ``candidates_per_list``
    (default ``2*k`` — the usual fusion over-fetch so a document ranked
    just outside top-k in both lists can still fuse into the top-k)
    and RRF keeps the final ``k``. Output: (query_id, id, score, rank).

    Scale shape = the two components': BM25 shuffles vocabulary-bounded
    posting frames with the query terms broadcast; cosine never shuffles
    the corpus (map-side partial top-k); the fusion join touches only
    ``Q x candidates`` rows.
    """
    from .similarity import cosine_topk

    n = candidates_per_list or 2 * k
    lex = bm25_topk(
        corpus, queries, k=n, text_col=text_col, id_col=id_col,
        query_text_col=query_text_col, query_id_col=query_id_col,
    )
    dense = cosine_topk(
        corpus.select(F.col(id_col), F.col(vec_col)),
        queries.select(F.col(query_id_col), F.col(query_vec_col).alias(vec_col)),
        k=n, id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
    )
    return reciprocal_rank_fusion(
        lex, dense, k=k, rrf_k=rrf_k,
        id_col=id_col, query_id_col=query_id_col,
    )
