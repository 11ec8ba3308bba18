"""Data-selection by importance resampling (DSIR-style).

Given a huge RAW corpus and a small TARGET corpus that exemplifies the
distribution you want (curated text, a domain, a benchmark's training
split), select raw documents whose hashed n-gram profile looks like the
target: estimate bucket distributions over hashed word n-grams for both
corpora, score every raw document with its log likelihood ratio
Σ log(p_target[b] / p_raw[b]), and resample with Gumbel top-k (sampling
without replacement ∝ exp(score/temperature)). This is the method of
Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling"), re-expressed as three DataFrame plans.

Scale shape (100 TB raw corpus):

* feature pass — one explode over n-grams, groupBy (doc, bucket) with
  map-side combine; the only corpus-sized shuffle carries
  (id, bucket:int, cnt:long), never text;
* distributions — groupBy bucket: output is exactly ``n_buckets`` rows
  (default 10⁴), broadcast back to the scoring join;
* selection — Gumbel keys are pure per-row expressions (hashed
  uniforms, no RNG state); top-k is a TakeOrderedAndProject over
  (id, key) pairs — no full sort materialization.

Everything hashes through the md5-portable scheme (same as the
``*_portable`` sketches and the Bloom filter), so bucket ids, uniforms,
and Gumbel keys are replayable bit-for-bit by a DuckDB oracle — the
whole selection is deterministic given (data, seed): stable across
cluster size, partitioning, and data order.

Reference scope: beyond-reference LLM-pipeline layer (the reference
engine has no data-selection operators).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from .portable import H_RANGE as _H_RANGE, md5_long as _md5_long


def _hashed_gram_stream(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    ns: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """Un-aggregated hashed n-gram occurrences: ``(id, bucket)``, one
    row per gram occurrence.

    Tokens come from a whitespace split; each n in ``ns`` contributes
    the document's n-grams (joined with a space) hashed into
    ``n_buckets``. One bound split, one explode — all narrow. Consumers
    pick their own aggregate: per-(id, bucket) for scoring features
    (:func:`hashed_ngram_features`), straight per-bucket for corpus
    distributions (one exchange instead of two — the per-document
    grouping is pure overhead when only Σcnt per bucket is needed).
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if not ns or any(n < 1 for n in ns):
        raise ValueError(f"ns must be non-empty positive ints, got {ns}")
    from .dedup import _parallelize

    # ws_tokens framing (one regex scan; review r7: F.trim left a
    # phantom '' token on \n-edged docs, and reference corpora are
    # typically newline-terminated — the md5('') bucket accumulated
    # mass in p_ref and two docs differing only by a trailing newline
    # earned different DSIR weights / lm scores)
    from .text import gram_concat, ws_tokens

    bound = _parallelize(df).select(
        F.col(id_col), ws_tokens(text_col).alias("__words")
    )

    def gram_expr(n: int) -> Column:
        # the lambda MUST stay unary: F.transform inspects arity and
        # passes the element INDEX as a second argument to any binary
        # callable — a `lambda i, n=n:` default silently receives the
        # index as n and produces garbage grams of position-dependent
        # width. Capturing n from this factory's scope keeps it unary.
        #
        # Documents shorter than n words emit ZERO n-grams for that n
        # (round-8 fix of a carried defect: the earlier
        # greatest(size - n, 0) floor emitted one UNDER-WIDTH gram, so
        # a 1-word document's only word counted twice under ns=(1, 2) —
        # doubled DSIR mass and inflated LM-score gram counts). This
        # deliberately diverges from the dedup-family shingles()
        # convention (short doc -> full text as one shingle): a dedup
        # candidate generator must not silently drop short documents
        # from pairing, but a feature distribution must not fabricate
        # mass. The when() guard keeps the sequence() bounds legal
        # under ANSI mode (sequence(0, negative) throws).
        #
        # n == 1 short-circuits to the words array itself: the r12
        # transform(sequence, join(slice)) form rebuilt every token
        # string through an interpreted per-element lambda — measured
        # 2× the expression CPU of reading the array that already holds
        # exactly those strings. Values identical (the when() guard is
        # kept so null text still yields [] at this expression, as
        # before). n >= 2 goes through gram_concat (get+concat_ws —
        # value-identical, ~40% cheaper than join(slice); text.py).
        if n == 1:
            return F.when(
                F.size("__words") >= 1, F.col("__words")
            ).otherwise(F.array().cast("array<string>"))
        return F.when(
            F.size("__words") >= n,
            F.transform(
                F.sequence(F.lit(0), F.size("__words") - n),
                lambda i: gram_concat("__words", i, n),
            ),
        ).otherwise(F.array().cast("array<string>"))

    gram_arrays = [gram_expr(n) for n in ns]
    grams = bound.select(
        F.col(id_col), F.explode(F.concat(*gram_arrays)).alias("gram")
    )
    # the coalesce is a NULLABILITY declaration, not a fallback: gram is
    # non-null by construction (concat_ws never returns null; the n=1
    # leg reads ws_tokens elements, also non-null), so the branch never
    # fires and the value is identical — but it makes `bucket` provably
    # non-nullable, which stops InferFiltersFromConstraints from
    # planting `isnotnull(<the full md5 expression>)` filters BELOW
    # this projection at every downstream join on bucket (three sites
    # in dsir_select: the ratio join plus both distribution legs) —
    # each of which re-evaluated the per-gram md5/conv/pmod chain a
    # second time per occurrence (r12; same optimizer-duplication class
    # as dedup._filter_materialized, guide §4.4).
    return grams.select(
        F.col(id_col),
        F.coalesce(
            F.pmod(_md5_long(F.col("gram")), F.lit(n_buckets)).cast("int"),
            F.lit(0),
        ).alias("bucket"),
    )


def hashed_ngram_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    ns: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """Hashed word n-gram counts per document: ``(id, bucket, cnt)`` —
    :func:`_hashed_gram_stream` aggregated per (id, bucket)."""
    return (
        _hashed_gram_stream(df, text_col, id_col, n_buckets, ns)
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bucket_distribution(features: DataFrame, n_buckets: int) -> DataFrame:
    """Smoothed bucket probability distribution from a feature frame:
    ``(bucket, prob)`` with add-one (Laplace) smoothing over ALL
    ``n_buckets`` buckets, so unseen buckets get mass and ratios never
    divide by zero. Exactly ``n_buckets`` output rows — broadcastable by
    construction."""
    spark = features.sparkSession
    counts = features.groupBy("bucket").agg(F.sum("cnt").alias("c"))
    all_buckets = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    filled = all_buckets.join(counts, "bucket", "left").select(
        "bucket", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    # the normalizing total rides a GLOBAL WINDOW over the (exactly
    # n_buckets-row, bounded-by-construction) frame — one
    # Exchange(SinglePartition) of n_buckets longs. The earlier 1-row
    # broadcast crossJoin planned a BroadcastNestedLoopJoin per
    # consumer; with this frame's subtree re-planned under every
    # consumer of the distribution, dsir_select carried FOUR of them
    # and 34 exchanges (r9 plan audit's heaviest query — verdict #4).
    total = F.sum("c").over(W.partitionBy()) + n_buckets
    return filled.select(
        "bucket", ((F.col("c") + 1) / total).alias("prob")
    )


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    ns: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """Per-raw-document DSIR log importance weight:
    ``(id, log_weight)`` where
    ``log_weight = Σ_grams cnt · log(p_target[bucket] / p_raw[bucket])``.

    The raw bucket distribution is estimated from the raw corpus itself
    and the target distribution from ``target``; both are
    ``n_buckets``-row frames broadcast into the scoring join, so the
    raw corpus is scanned twice (once for its distribution, once for
    scoring) and shuffled only as (id, bucket, cnt) triples.
    """
    # The raw corpus is scanned twice (scoring features + its own
    # distribution) — deliberately NOT localCheckpoint-ed: the (id,
    # bucket, cnt) triples are roughly corpus-token-sized (~12 B/gram
    # vs ~6 B/token of compressed parquet text), so materializing them
    # costs about as much I/O as the re-scan saves, loses parquet
    # pushdown/pruning on the second pass's replacement, and adds
    # localCheckpoint's executor-loss fragility at cluster scale.
    # Measured at sf0.1: checkpointing is ~0.3 s SLOWER warm (1.93 vs
    # 1.58 s); a LAZY checkpoint of the ratio table measured 8x worse —
    # RDD materialization runs the subtree outside AQE.
    #
    # The distribution legs aggregate the gram STREAM straight to
    # per-bucket counts (the per-document grouping scoring needs is
    # pure overhead here), and ONE n_buckets-row frame carries both
    # corpora's counts: one global window normalizes both sides — the
    # whole log-ratio table costs 3 exchanges total (2 bucket aggs +
    # 1 single-partition window) vs 8 in the two-bucket_distribution
    # formulation the r9 plan audit flagged (34 exchange mentions, 4
    # BroadcastNestedLoopJoins from the 1-row total crossJoins —
    # verdict #4).
    spark = raw.sparkSession
    raw_feats = hashed_ngram_features(raw, text_col, id_col, n_buckets, ns)
    c_raw = (
        _hashed_gram_stream(raw, text_col, id_col, n_buckets, ns)
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("__cr"))
    )
    c_tgt = (
        _hashed_gram_stream(target, text_col, id_col, n_buckets, ns)
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("__ct"))
    )
    all_buckets = spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket"))
    merged = (
        all_buckets
        .join(F.broadcast(c_raw), "bucket", "left")
        .join(F.broadcast(c_tgt), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("__cr", F.lit(0)).alias("__cr"),
            F.coalesce("__ct", F.lit(0)).alias("__ct"),
        )
    )
    w = W.partitionBy()
    ratios = merged.select(
        "bucket",
        (
            F.log((F.col("__ct") + 1)
                  / (F.sum("__ct").over(w) + n_buckets))
            - F.log((F.col("__cr") + 1)
                    / (F.sum("__cr").over(w) + n_buckets))
        ).alias("__lr"),
    )
    return (
        raw_feats.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("__lr")).alias("log_weight"))
    )


def gumbel_key(log_weight: Column, id_col: Column, seed: int, temperature: float) -> Column:
    """Deterministic Gumbel-max key: ``log_weight/T − ln(−ln(u))`` with
    ``u`` a hashed uniform in (0,1) from (seed, id). Taking the top-k
    keys samples k documents without replacement with probability
    ∝ exp(log_weight/T) — the Gumbel top-k trick — reproducibly for a
    fixed seed."""
    u = (_md5_long(F.concat_ws(":", F.lit(str(seed)), id_col.cast("string"))) + 0.5) / F.lit(
        _H_RANGE
    )
    return log_weight / F.lit(float(temperature)) - F.log(-F.log(u))


def importance_sample(
    raw: DataFrame,
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    seed: int = 42,
    temperature: float = 1.0,
) -> DataFrame:
    """Select ``k`` raw documents by Gumbel top-k over DSIR weights.

    ``weights`` is the (id, log_weight) frame from
    :func:`importance_weights`. Higher ``temperature`` flattens the
    distribution toward uniform sampling; ``temperature → 0`` becomes a
    deterministic arg-top-k of the weights. Selection is a
    TakeOrderedAndProject over (id, key) — the document payload joins
    back only for the k winners."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    keyed = weights.select(
        F.col(id_col),
        gumbel_key(F.col("log_weight"), F.col(id_col), seed, temperature).alias(
            "__key"
        ),
    )
    winners = keyed.orderBy(F.col("__key").desc(), F.col(id_col)).limit(k)
    return raw.join(F.broadcast(winners.select(id_col)), id_col, "left_semi")


def lm_quality_score(
    df: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 65_536,
    out_col: str = "lm_score",
) -> DataFrame:
    """Per-document mean token log-probability under a hashed unigram LM
    estimated from ``reference`` — the CCNet-style "perplexity against a
    clean corpus" quality signal, with the heavyweight KenLM swapped for
    a hashed unigram model the engine can fit in one aggregate pass.

    ``lm_score = Σ cnt · log p_ref[bucket] / Σ cnt`` (higher ⇒ more
    reference-like; gibberish and boilerplate land in rare buckets and
    score low). Hashing bounds the model at ``n_buckets`` rows —
    broadcastable regardless of vocabulary size — and keeps the score
    replayable by the DuckDB oracle (same md5 bucket scheme as
    :func:`importance_weights`). Output: ``(id, lm_score)``.
    """
    feats = hashed_ngram_features(df, text_col, id_col, n_buckets, ns=(1,))
    ref_feats = hashed_ngram_features(reference, text_col, id_col, n_buckets, ns=(1,))
    p_ref = bucket_distribution(ref_feats, n_buckets)
    return (
        feats.join(F.broadcast(p_ref), "bucket")
        .groupBy(id_col)
        .agg(
            (F.sum(F.col("cnt") * F.log("prob")) / F.sum("cnt")).alias(out_col)
        )
    )


def _validate_bands(cuts, labels) -> None:
    """Shared cuts/labels validation for the batch and streaming CCNet
    banding ops."""
    if len(labels) != len(cuts) + 1:
        raise ValueError(
            f"need len(labels) == len(cuts)+1, got {len(labels)} labels "
            f"for {len(cuts)} cuts")
    if list(cuts) != sorted(set(cuts)) or not all(0 < c < 1 for c in cuts):
        raise ValueError(f"cuts must be strictly increasing in (0,1): {cuts}")


def _band_case_expr(cuts_col: str, labels):
    """Ascending CASE chain over an ``lm_score`` column and a cuts ARRAY
    column: score <= cut_i -> labels[i], else the top label. Bands only
    when BOTH the score and the group's cuts exist: a row whose group
    value is null (or whose group produced no cuts) never equi-joins a
    cuts row, and an unguarded chain would fall through
    ``score <= NULL`` straight to the TOP label — the worst doc in the
    corpus branded 'head' because its language tag was missing. Shared
    by :func:`perplexity_buckets` and the streaming twin so both band
    identically."""
    expr = F.lit(labels[-1])
    for i in range(len(labels) - 2, -1, -1):
        expr = F.when(
            F.col("lm_score") <= F.col(cuts_col).getItem(i), F.lit(labels[i])
        ).otherwise(expr)
    return F.when(
        F.col("lm_score").isNotNull() & F.col(cuts_col).isNotNull(), expr
    )


def perplexity_buckets(
    df: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    by: str | None = None,
    cuts: tuple[float, ...] = (1 / 3, 2 / 3),
    labels: tuple[str, ...] = ("tail", "middle", "head"),
    n_buckets: int = 65_536,
    accuracy: int = 10_000,
    out_col: str = "ppl_bucket",
) -> DataFrame:
    """CCNet-style head/middle/tail split: score every document with
    :func:`lm_quality_score`, find the ``cuts`` quantiles of the score
    (per ``by`` group when given — CCNet cuts per LANGUAGE, so a
    low-resource language isn't judged against English fluency), and
    label each document with the band it falls in. ``labels`` are in
    ASCENDING score order, so the default maps lowest-scoring (least
    reference-like) to ``tail`` and highest to ``head``.

    Plan shape at 100 TB: the LM fit/score is the bounded-hash
    aggregation :func:`lm_quality_score` documents; the cut points are
    ONE ``percentile_approx`` sketch aggregation (constant memory per
    group, a handful of doubles to the driver-side broadcast); the
    label assignment is a broadcast join plus a codegen CASE chain.
    Nothing corpus-sized ever sits on the driver, and no second scan
    of the text happens — bucketing reads only (id, score).

    Documents with no scoreable tokens (null/empty text) get a null
    score and a null bucket — policy belongs to the caller, as with
    ``quality.quality_score``.

    Output: ``df`` + ``lm_score`` + ``out_col``.

    Reference scope: the reference has no perplexity machinery; this is
    the CCNet bucketing step (Wenzek et al. 2020) re-expressed on the
    engine's hashed unigram LM — beyond-reference LLM-pipeline
    extension (SURVEY.md §2 extension).
    """
    _validate_bands(cuts, labels)

    lm = lm_quality_score(df, reference, text_col, id_col,
                          n_buckets=n_buckets, out_col="lm_score")
    # two consumers (the cuts aggregation and the band join) would
    # otherwise re-execute the whole LM shingle/join/agg subtree; the
    # checkpointed frame is (id[, by], score) — narrow at any corpus
    # size (same sanctioned barrier the curation pipeline uses)
    proj = [id_col] + ([by] if by is not None else [])
    # no-token documents (null/empty/whitespace text) carry no signal:
    # null their score HERE so they neither band nor drag the tail cut
    # down (lm_quality_score itself scores an empty doc via the
    # single-gram shingle convention — fine for filtering floors, wrong
    # for quantile banding)
    # rlike('\S'), not F.trim (ASCII spaces only): a "\n\n" document is
    # whitespace-only and must band to null per the contract. rlike
    # short-circuits at the first non-ws char — the round-7 form
    # rewrote the whole document (regexp_replace) just to test this.
    has_signal = F.col(text_col).rlike(r"\S").alias("__has")
    keyed = (
        df.select(*proj, has_signal)
        .join(lm, id_col, "left")
        .withColumn("lm_score",
                    F.when(F.col("__has"), F.col("lm_score")))
        .drop("__has")
        .localCheckpoint()
    )

    qs = F.percentile_approx(
        "lm_score", F.array(*[F.lit(float(c)) for c in cuts]), accuracy
    ).alias("__cuts")
    if by is not None:
        cut_rows = keyed.groupBy(by).agg(qs)
        banded = keyed.join(F.broadcast(cut_rows), by, "left")
    else:
        banded = keyed.crossJoin(F.broadcast(keyed.agg(qs)))

    labeled = banded.select(
        F.col(id_col),
        F.col("lm_score"),
        _band_case_expr("__cuts", labels).alias(out_col),
    )
    return df.join(labeled, id_col, "left").select(
        *df.columns, "lm_score", out_col)
