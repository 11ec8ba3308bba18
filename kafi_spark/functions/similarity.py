"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the exact baseline; random-hyperplane LSH
bucketing as the scale path (candidates from matching signature buckets
only). All scoring is Arrow-batched numpy (one BLAS matmul per batch) —
the earlier `zip_with`+`aggregate` Column formulation ran interpreted
per element (higher-order functions don't codegen) and recomputed both
norms per *pair*; measured 163s → ~4s on the 500-vector check set.

Scale design (100 TB / 1000-executor framing):
* ``cosine_topk``: the query set is small by construction → ship it to
  every task as a closure matrix; one pass over the corpus with
  map-side partial top-k (``mapInPandas``), then a global top-k over
  ``partitions × Q × k`` rows. The corpus is never shuffled, never
  joined, never replicated.
* ``embedding_neardup_pairs``: block all-pairs — each row is replicated
  to B block-pairs, each (i, j) block-pair is one BLAS matmul in
  ``applyInPandas``. Replication factor B ≈ sqrt(parallelism) keeps
  per-task matrices cache-sized; total work is the unavoidable O(N²·d)
  FLOPs but spread evenly with no skew.
* LSH paths prune N to colliding buckets before any exact scoring;
  candidate de-dup happens on (id, id) pairs only — vectors are
  re-attached after, so the shuffle never carries embeddings twice.

Reference parity: the reference has no similarity ops; this implements
the LLM-pipeline surface mandated by the build brief (SURVEY.md §7
phase 6).
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W, functions as F
from pyspark.sql.functions import pandas_udf


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two array<numeric> columns (double result).

    Fine for one-off expressions; hot loops should use the numpy paths
    below (higher-order functions are interpreted, not codegen'd)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Column-side cosine with the family zero-norm convention: a zero
    vector scores 0.0, never NaN/null (round-9 review: plain division
    returned NULL under ANSI-off — silently dropping rows from
    score-threshold filters where every numpy kernel scored 0.0 — and
    would THROW under ANSI). Null vectors still propagate null."""
    den = l2_norm(a) * l2_norm(b)
    return F.when(den == 0.0, F.lit(0.0)).otherwise(dot(a, b) / den)


def _mat(series: pd.Series) -> np.ndarray:
    """(n × d) float64 matrix from a pandas Series of array values."""
    return np.vstack([np.asarray(e, dtype=np.float64) for e in series])


def _drop_null_vecs(df: DataFrame, vec_col: str) -> DataFrame:
    """Family null policy at the in-memory ANN entry points, matching
    the persisted index's (``ann_index.py``, round-8 review): null
    embeddings are dropped BEFORE any numpy kernel sees them — a single
    failed-embedding row otherwise kills a corpus-scale job inside
    :func:`_mat` with an opaque executor-side vstack shape error (None
    coerces to a 0-d array). Round-8 session review: ann_index enforced
    this but the in-memory twins (cosine_topk / _quantized / _lsh /
    _ivf, embedding_neardup_pairs, quantize_embeddings) did not, so the
    two families disagreed on the same corpus."""
    return df.filter(F.col(vec_col).isNotNull())


def _unit(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return x / n


def cosine_pairs_udf():
    """Vectorized cosine over two array columns: one row-wise einsum per
    Arrow batch."""

    @pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        x, y = _mat(a), _mat(b)
        num = np.einsum("ij,ij->i", x, y)
        den = np.linalg.norm(x, axis=1) * np.linalg.norm(y, axis=1)
        den[den == 0.0] = 1.0
        return pd.Series(num / den)

    return cos


def _topk_per_batch(S: np.ndarray, ids: np.ndarray, k: int):
    """Per query column of S (n × q): indices of the k best rows by
    (score desc, id asc) — deterministic ties."""
    for j in range(S.shape[1]):
        order = np.lexsort((ids, -S[:, j]))[:k]
        yield j, order


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    assume_normalized: bool = False,
) -> DataFrame:
    """Exact top-k by cosine for every query vector.

    The query set rides along as a closure matrix (it is small by
    definition — a broadcast in spirit); each corpus partition emits its
    local top-k per query (one matmul per Arrow batch), and a final
    window over ``partitions × Q × k`` rows picks the global top-k.
    Output: (query_id, vec_id, score, rank), rank 1..k, ties broken by
    corpus id.

    Null embeddings on either side are dropped (family null policy —
    see :func:`_drop_null_vecs`; a null query vector cannot be scored).
    """
    corpus = _drop_null_vecs(corpus, vec_col)
    qpdf = _drop_null_vecs(queries, vec_col).select(
        query_id_col, vec_col
    ).toPandas()
    if len(qpdf) == 0:
        raise ValueError("empty query set")
    Q = _mat(qpdf[vec_col])
    qids = qpdf[query_id_col].to_numpy()
    spark = corpus.sparkSession
    bq = spark.sparkContext.broadcast((Q, qids))

    def part(batches):
        Q_, qids_ = bq.value
        nq = np.ones(len(Q_)) if assume_normalized else np.linalg.norm(Q_, axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = _mat(pdf["__vec"])
            nx = np.ones(len(X)) if assume_normalized else np.linalg.norm(X, axis=1)
            # zero-norm guard (same convention as every sibling kernel:
            # cosine_pairs_udf, score_vs_query): a zero vector scores
            # 0.0, never NaN/null
            nx = np.where(nx == 0.0, 1.0, nx)
            nq_safe = np.where(nq == 0.0, 1.0, nq)
            # dot / (|x||q|), not normalize-then-dot: matches the SQL
            # oracle's formulation to the last float op
            S = (X @ Q_.T) / np.outer(nx, nq_safe)
            ids = pdf["__id"].to_numpy()
            out_q, out_id, out_s = [], [], []
            for j, order in _topk_per_batch(S, ids, k):
                out_q.extend([qids_[j]] * len(order))
                out_id.extend(ids[order])
                out_s.extend(S[order, j])
            yield pd.DataFrame(
                {query_id_col: out_q, id_col: out_id, "score": out_s}
            )

    c = corpus.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec"))
    id_t = corpus.schema[id_col].dataType.simpleString()
    qid_t = queries.schema[query_id_col].dataType.simpleString()
    partials = c.mapInPandas(
        part, f"{query_id_col} {qid_t}, {id_col} {id_t}, score double"
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("score").desc(), F.col(id_col))
    return partials.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector int8 scalar quantization: q = round(127 · x / max|x|),
    stored as a d-byte BINARY column — a 4× memory/scan cut versus
    float32 arrays.

    Cosine similarity is invariant under per-vector positive scaling, so
    ranking by cosine over the int8 codes approximates full-precision
    ranking with only rounding error — no codebook, no calibration pass,
    each vector self-contained. Output: (id_col, qvec BINARY). Null
    embeddings are dropped (family null policy, same as ``pq_encode``).
    """
    df = _drop_null_vecs(df, vec_col)

    def op(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = _mat(pdf["__vec"])
            m = np.abs(X).max(axis=1, keepdims=True)
            m[m == 0.0] = 1.0
            Q8 = np.clip(np.rint(127.0 * X / m), -127, 127).astype(np.int8)
            yield pd.DataFrame(
                {"__id": pdf["__id"].values,
                 "qvec": [row.tobytes() for row in Q8]}
            )

    id_t = df.schema[id_col].dataType.simpleString()
    return df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec")
    ).mapInPandas(op, f"__id {id_t}, qvec binary").withColumnRenamed(
        "__id", id_col
    )


def cosine_topk_quantized(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    rescore_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Top-k by cosine with an int8-quantized first pass and exact
    rescoring — the memory-bound scale path.

    Stage 1 scans the quantized corpus (d bytes/vector) and keeps
    ``k × rescore_factor`` candidates per query; stage 2 re-attaches the
    full-precision vectors for ONLY those candidates (semi-join by id)
    and rescores exactly. At 100 TB the first pass reads a 4× smaller
    table and the exact pass touches a few-hundred-row candidate set.
    Output schema matches :func:`cosine_topk`. Null embeddings on
    either side are dropped (family null policy).
    """
    corpus = _drop_null_vecs(corpus, vec_col)
    # anchor ONCE: the query frame is realized twice (the stage-1
    # closure matrix here and the exact-rescore join below) — a
    # nondeterministic query plan could realize two DIFFERENT sets,
    # silently losing queries from either leg; and the rescore join
    # must see the SAME null-filtered projection, not the raw frame
    # (a duplicated query id carrying one null row fed __qvec=None into
    # cosine_pairs_udf — round-9 review)
    queries = _drop_null_vecs(queries, vec_col).select(
        query_id_col, vec_col).localCheckpoint()
    qpdf = queries.toPandas()
    if len(qpdf) == 0:
        raise ValueError("empty query set")
    Q = _mat(qpdf[vec_col])
    qids = qpdf[query_id_col].to_numpy()
    spark = corpus.sparkSession
    bq = spark.sparkContext.broadcast((_unit(Q), qids))
    kk = k * rescore_factor

    def part(batches):
        Q_, qids_ = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.vstack([
                np.frombuffer(b, dtype=np.int8) for b in pdf["qvec"]
            ]).astype(np.float32)
            S = _unit(X) @ Q_.T
            ids = pdf["__id"].to_numpy()
            out_q, out_id = [], []
            for j, order in _topk_per_batch(S, ids, kk):
                out_q.extend([qids_[j]] * len(order))
                out_id.extend(ids[order])
            yield pd.DataFrame({query_id_col: out_q, "__id": out_id})

    q8 = quantize_embeddings(corpus, id_col, vec_col).withColumnRenamed(
        id_col, "__id"
    )
    id_t = corpus.schema[id_col].dataType.simpleString()
    qid_t = queries.schema[query_id_col].dataType.simpleString()
    cand = (
        q8.mapInPandas(part, f"{query_id_col} {qid_t}, __id {id_t}")
        .select(query_id_col, F.col("__id").alias(id_col))
        .distinct()
    )
    # exact rescore on the candidate set only
    vecs = corpus.select(id_col, vec_col).join(
        cand.select(id_col).distinct(), id_col, "semi"
    )
    scored = cand.join(vecs, id_col).join(
        queries.select(query_id_col, F.col(vec_col).alias("__qvec")),
        query_id_col,
    ).withColumn(
        "score",
        cosine_pairs_udf()(F.col(vec_col), F.col("__qvec")),
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("score").desc(), F.col(id_col))
    return (
        scored.select(query_id_col, id_col, "score")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rnd = random.Random(seed)
    return [
        [rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit i = sign(vec · plane_i), packed into
    a long. Pure Column arithmetic (the planes are literals baked into the
    plan — fine for a handful of planes; for real plane counts use
    :func:`lsh_signatures_udf`, the vectorized path)."""
    if len(planes) > 63:
        # 1 << 63 exceeds LongType as a Python-literal weight (the UDF
        # path packs bit 63 via int64 wraparound instead — see
        # lsh_signatures_udf); this interpreted variant stops at 63
        raise ValueError(
            f"lsh_signature packs at most 63 planes per long, got "
            f"{len(planes)}; use lsh_signatures_udf for wide signatures"
        )
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(vec, plane) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig + bit * F.lit(1 << i).cast("long")
    return sig


def lsh_signatures_udf(tables: list[list[list[float]]]):
    """All hash-table signatures in one Arrow-batched pandas UDF.

    One (batch × dim) @ (dim × tables·planes) numpy matmul per Arrow batch,
    then sign-bit packing — ~3 ops per batch regardless of plane count. The
    Column-literal variant builds tables·planes·dim expression-tree nodes of
    interpreted higher-order functions (measured ~20× slower at 60 planes ×
    64 dims); BLAS does this for free. Returns a UDF: array<float> vec →
    array<long> of one packed signature per table.
    """
    n_tables = len(tables)
    n_planes = len(tables[0])
    # 64 sign bits is the packing capacity of one long: shifting past
    # bit 63 wraps in int64 (plane 64 would ALIAS plane 0 — silent
    # recall loss, no error), so refuse rather than mis-bucket. Bit 63
    # makes the signature negative, which is fine: signatures are only
    # ever compared for equality, never ordered.
    if n_planes > 64:
        raise ValueError(
            f"n_planes must be <= 64 (one packed long per table), got "
            f"{n_planes}; add tables instead of planes for more bits"
        )
    mat = np.asarray(tables, dtype=np.float64).reshape(n_tables * n_planes, -1).T
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @pandas_udf("array<long>")
    def sigs(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        x = _mat(v)
        bits = (x @ mat) >= 0.0
        packed = bits.reshape(len(v), n_tables, n_planes) @ weights
        return pd.Series(list(packed))

    return sigs


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing an LSH bucket
    with the query in ANY of ``n_tables`` hash tables; exact cosine + rank
    on the candidate set. Recall tunes with n_planes (bucket size) and
    n_tables (OR-amplification).

    The bucket join carries only (id, table_id, sig) — 24 bytes/row; the
    de-dup is on bare id pairs; corpus vectors are re-attached once per
    surviving candidate and scored against a closure matrix of the (small)
    query set. Embeddings never enter a shuffle twice. Null embeddings
    on either side are dropped (family null policy).
    """
    corpus = _drop_null_vecs(corpus, vec_col)
    tables = [
        _hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]
    sig_udf = lsh_signatures_udf(tables)

    # anchor ONCE: the query frame is realized twice (the driver-side
    # closure matrix here and the signature leg below) — from a
    # nondeterministic plan (sample/unordered limit) the two jobs could
    # realize DIFFERENT query sets, and a signature-only query id would
    # IndexError inside score_vs_query (round-9 review; the same
    # checkpoint-hazard class round 8 fixed in ivf_search/ivfpq_search)
    queries = _drop_null_vecs(queries, vec_col).select(
        query_id_col, vec_col).localCheckpoint()
    qpdf = queries.toPandas()
    if len(qpdf) == 0:
        raise ValueError("empty query set")
    Q = _mat(qpdf[vec_col])
    qindex = {qid: i for i, qid in enumerate(qpdf[query_id_col])}
    spark = corpus.sparkSession
    bq = spark.sparkContext.broadcast((Q, qindex))

    @pandas_udf("double")
    def score_vs_query(qid: pd.Series, vec: pd.Series) -> pd.Series:
        if len(qid) == 0:
            return pd.Series([], dtype="float64")
        Q_, qindex_ = bq.value
        X = _mat(vec)
        rows = qid.map(qindex_).to_numpy()
        Qr = Q_[rows]
        num = np.einsum("ij,ij->i", X, Qr)
        den = np.linalg.norm(X, axis=1) * np.linalg.norm(Qr, axis=1)
        den[den == 0.0] = 1.0
        return pd.Series(num / den)

    def signatures(df: DataFrame, idc: str) -> DataFrame:
        return df.select(
            F.col(idc),
            F.posexplode(sig_udf(F.col(vec_col))).alias("table_id", "sig"),
        )

    cs = signatures(corpus, id_col)
    qs = signatures(queries, query_id_col)
    cand_ids = (
        cs.join(F.broadcast(qs), ["table_id", "sig"])
        .select(query_id_col, id_col)
        .distinct()
    )
    scored = cand_ids.join(corpus.select(id_col, vec_col), id_col).select(
        F.col(query_id_col),
        F.col(id_col),
        score_vs_query(F.col(query_id_col), F.col(vec_col)).alias("score"),
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("score").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _kmeans_np(
    X: np.ndarray, n_codes: int, seed: int, n_iter: int = 10, n_init: int = 3
) -> np.ndarray:
    """Seeded k-means in numpy: ``n_init`` independent k-means++ inits,
    each Lloyd-refined, lowest-inertia run wins — the standard restart
    defense against an unlucky seeding (a single init's quality depends
    on the D² draw, which depends on row order; restarts make recall
    stable across sample orderings). Deterministic for fixed
    (X, n_codes, seed). Returns (n_codes, d)."""
    n = len(X)
    if n == 0:
        raise ValueError(
            "empty training sample: the corpus (or the sampled subset) "
            "contains no vectors — cannot fit k-means centers"
        )
    k = min(n_codes, n)

    def one_run(run_seed: int) -> tuple[np.ndarray, float]:
        rng = np.random.RandomState(run_seed)
        centers = [X[rng.randint(n)]]
        d2 = ((X - centers[0]) ** 2).sum(axis=1)
        for _ in range(1, k):
            p = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
            centers.append(X[rng.choice(n, p=p)])
            d2 = np.minimum(d2, ((X - centers[-1]) ** 2).sum(axis=1))
        C = np.vstack(centers)
        d = X.shape[1]
        cols = np.arange(d)
        for _ in range(n_iter):
            # assignment via (x-c)² = |x|² - 2x·c + |c|²; |x|² constant/row
            dist = -2 * X @ C.T + (C**2).sum(axis=1)
            assign = dist.argmin(axis=1)
            # centroid update via d weighted bincounts — one O(n·d)
            # pass, replacing the r12 k-iteration Python mask loop
            # (k=256 per Lloyd step made the PQ codebook fit
            # driver-latency-bound: 2560 tiny masked means per
            # subspace). Same mean, accumulated in row order instead
            # of numpy's pairwise reduce — FP-level center drift only,
            # and every ORACLE-checked consumer is center-independent
            # by construction (full-probe IVF, n_clusters=1 semantic);
            # the probe/cell twins are recall-gated, not hash-gated.
            # Empty clusters keep their previous center (unchanged
            # policy). Deterministic for fixed (X, n_codes, seed).
            cnt = np.bincount(assign, minlength=k).astype(np.float64)
            sums = np.empty((k, d))
            for j in cols:
                sums[:, j] = np.bincount(
                    assign, weights=X[:, j], minlength=k)
            nz = cnt > 0
            C[nz] = sums[nz] / cnt[nz, None]
        final = -2 * X @ C.T + (C**2).sum(axis=1)
        inertia = float(final.min(axis=1).sum())  # + Σ|x|², constant
        return C, inertia

    best_c, best_i = None, None
    for r in range(max(1, n_init)):
        C, inertia = one_run(seed + 7919 * r)
        if best_i is None or inertia < best_i:
            best_c, best_i = C, inertia
    C = best_c
    if k < n_codes:  # degenerate tiny input: pad with repeats
        C = np.vstack([C, np.repeat(C[:1], n_codes - k, axis=0)])
    return C


def _estimate_rows(corpus: DataFrame, queries: DataFrame, vec_col: str) -> int:
    """Metadata-based corpus row-count estimate: Catalyst's sizeInBytes
    (file-size sum for parquet scans — no job) divided by an embedding
    row width derived from the query side's dimensionality (one
    ``first()`` on the SMALL side). Only used to pick a training-sample
    THINNING modulus — the hard sample-size bound is the hash-ordered
    ``limit(train_cap)`` in the fit paths, so a few-x error here (e.g.
    parquet compression shrinking bytes-per-row) costs at most a
    larger-than-needed pre-limit stream, never driver memory; falls
    back to a real count if plan statistics are unreachable."""
    try:
        # stats over the PROJECTED columns only: Catalyst scales a
        # Project's sizeInBytes by output-row width, so estimating from
        # the full frame divided corpus bytes (text, metadata, ...) by
        # an embedding-only row width — on fat-row tables that
        # overestimated rows by 10x+, inflating the modulus until the
        # hash filter starved (or emptied) the training sample
        projected = corpus.select(vec_col)
        # py4j hands BigInt back as a plain Python int
        size = int(projected._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        if size <= 0 or size >= (1 << 62):
            # stat-less plans report a Long.MaxValue-ish sentinel; an
            # unguarded sentinel would yield an astronomical modulus and
            # an EMPTY training sample (nothing to fit on)
            return corpus.count()
        q0 = queries.select(vec_col).first()
        dim = len(q0[0]) if q0 is not None and q0[0] is not None else 0
        bytes_per_row = dim * 8 + 32  # array payload + offsets/id overhead
        return size // max(bytes_per_row, 1)
    except Exception:  # noqa: BLE001 — plans the stats API can't serve
        return corpus.count()


def _nearest_cell_udf(spark, C: np.ndarray):
    """Pandas UDF assigning each vector its nearest centroid's index.

    THE single assignment kernel — build, search, append, and k-means
    labeling must all route through here so they can never disagree on
    cell membership. argmin of |x-c|² == argmin of -2x·C + |c|²
    (|x|² constant per row): one BLAS matmul instead of an O(n·k·d)
    broadcast temporary."""
    bc = spark.sparkContext.broadcast(C)

    @pandas_udf("int")
    def nearest_cell(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        X = _mat(v)
        d = -2 * X @ bc.value.T + (bc.value**2).sum(axis=1)
        return pd.Series(d.argmin(axis=1).astype("int32"))

    return nearest_cell


def _probe_cells_udf(spark, C: np.ndarray, n_probe: int):
    """Pandas UDF listing each query's ``n_probe`` nearest centroids
    (same distance identity as :func:`_nearest_cell_udf`)."""
    bc = spark.sparkContext.broadcast(C)

    @pandas_udf("array<int>")
    def probe_cells(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        X = _mat(v)
        d = -2 * X @ bc.value.T + (bc.value**2).sum(axis=1)
        order = np.argsort(d, axis=1)[:, :n_probe].astype("int32")
        return pd.Series(list(order))

    return probe_cells


def _fit_centroids(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    seed: int,
    train_cap: int,
) -> np.ndarray:
    """KMeans centroids fit on a capped deterministic sample.

    20 iterations over the FULL corpus would dominate build cost at
    scale, and centroid quality saturates long before ``train_cap``
    vectors. The deterministic per-row modulus filter keeps the sample
    reproducible (no Sample operator reshuffle); cells stay seeded/
    stable for the rows-only driver check. The sampling modulus comes
    from Catalyst's sizeInBytes estimate — NOT ``corpus.count()``,
    which was a full extra pass over the corpus before training even
    started. When the estimate says the corpus is small, the modulus is
    1 and the filter is a no-op. ``queries`` is only consulted for the
    embedding dimensionality estimate (pass the corpus itself when
    there is no separate query side).

    The fit itself is seeded numpy Lloyd on the COLLECTED sample (the
    same discipline the PQ codebooks use): a distributed KMeans on
    ≤ train_cap rows costs ~40 tiny scheduler round-trips (2 jobs × 20
    iterations) for work the driver finishes in milliseconds — pure
    latency at any scale. The modulus only THINS the stream; the HARD
    driver-memory bound is the hash-ordered ``limit(train_cap)``
    (TakeOrderedAndProject: partial top-k per partition, deterministic
    total order) — a few-x sizeInBytes estimate error, routine with
    parquet compression, can then never over-collect."""
    n_est = _estimate_rows(corpus, queries, vec_col)
    modulus = max(1, n_est // train_cap)
    train = corpus
    if modulus > 1:
        train = corpus.filter(F.pmod(F.xxhash64(F.col(id_col)), modulus) == 0)
    sample = (
        train.select(F.col(vec_col), F.xxhash64(F.col(id_col)).alias("__k"))
        .orderBy("__k")
        .limit(train_cap)
    )
    X = _mat(sample.toPandas()[vec_col])
    return _kmeans_np(X, n_cells, seed, n_iter=20)


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    train_cap: int = 100_000,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means partitions the
    corpus into ``n_cells`` cells; each query probes its ``n_probe``
    nearest centroids and scores only those cells' vectors exactly.

    Scale shape: training samples the corpus (KMeans on a capped sample),
    assignment is one vectorized pass, and the probe join is
    (cell → candidates) — the corpus is scanned once at build and only
    probed cells are rescored per query. Recall tunes with n_probe/n_cells.
    Centroids depend on the KMeans seed → rows-only checkable (like the
    hyperplane seeds, but k-means is iterative so not SQL-reproducible).
    Null embeddings on either side are dropped (family null policy).
    """
    corpus = _drop_null_vecs(corpus, vec_col)
    queries = _drop_null_vecs(queries, vec_col)
    C = _fit_centroids(corpus, queries, id_col, vec_col, n_cells, seed, train_cap)
    spark = corpus.sparkSession
    nearest_cell = _nearest_cell_udf(spark, C)
    probe_cells = _probe_cells_udf(spark, C, n_probe)

    assigned = corpus.select(
        F.col(id_col), F.col(vec_col), nearest_cell(F.col(vec_col)).alias("cell")
    )
    probes = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    )
    cos = cosine_pairs_udf()
    scored = assigned.join(F.broadcast(probes), "cell").select(
        F.col(query_id_col),
        F.col(id_col),
        cos(F.col("__qvec"), F.col(vec_col)).alias("score"),
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("score").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _block_pairs_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_blocks: int,
    group_col: str | None = None,
) -> DataFrame:
    """All-pairs cosine ≥ threshold via block matmul.

    Rows are hashed into B blocks; each row is replicated to every block-
    pair it participates in (≤ B copies), and each (i, j) group is one
    numpy matmul emitting only above-threshold pairs. Total FLOPs are the
    unavoidable O(N²·d), but per-task state is (N/B × d) — pick
    B ≈ sqrt(parallelism) so every core gets work and matrices stay in
    cache. No driver collect, no O(N²) shuffle (only hits survive).

    ``group_col`` restricts pairing to rows sharing that column (the
    semantic-dedup within-cluster case): the block-pair grouping key is
    prefixed with it, so FLOPs drop from O(N²) to Σ cluster²."""
    if n_blocks < 1:
        # pmod(hash, 0) is NULL under ANSI-off, so every row's block
        # would be null and the pair set silently EMPTY — read as "no
        # near-duplicates" by semantic_dedup / embedding_neardup_pairs
        # (round-9 review); fail loudly instead
        raise ValueError(f"n_blocks must be >= 1, got {n_blocks}")
    B = n_blocks
    extra = [group_col] if group_col else []
    d = df.select(
        *extra,
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(B)).cast("int").alias("__b"),
    )
    # replicate: row in block b serves as LEFT of pairs (b, j>=b) and as
    # RIGHT of pairs (i<b, b) — exactly one copy per block-pair touched.
    targets = F.array_union(
        F.transform(F.sequence(F.col("__b"), F.lit(B - 1)),
                    lambda j: F.struct(F.col("__b").alias("bi"), j.alias("bj"))),
        F.transform(F.sequence(F.lit(0), F.col("__b")),
                    lambda i: F.struct(i.alias("bi"), F.col("__b").alias("bj"))),
    )
    rep = d.select(
        *extra, "__id", "__vec", "__b", F.explode(targets).alias("bp")
    ).select(
        *extra, "__id", "__vec", "__b",
        F.col("bp.bi").alias("bi"), F.col("bp.bj").alias("bj"),
    )

    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = f"id_1 {id_t}, id_2 {id_t}, score double"

    def block(key, pdf):
        bi, bj = key[-2], key[-1]
        left = pdf[pdf["__b"] == bi]
        right = pdf[pdf["__b"] == bj]
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"id_1": [], "id_2": [], "score": []})
        Xl, Xr = _mat(left["__vec"]), _mat(right["__vec"])
        nl, nr = np.linalg.norm(Xl, axis=1), np.linalg.norm(Xr, axis=1)
        nl[nl == 0.0] = 1.0
        nr[nr == 0.0] = 1.0
        S = (Xl @ Xr.T) / np.outer(nl, nr)
        il = left["__id"].to_numpy()
        ir = right["__id"].to_numpy()
        # orient every pair as id_1 < id_2; drop self-pairs
        ii, jj = np.nonzero(S >= threshold)
        a, b = il[ii], ir[jj]
        keep = a != b
        a, b, s = a[keep], b[keep], S[ii[keep], jj[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        out = pd.DataFrame({"id_1": lo, "id_2": hi, "score": s})
        # same-block groups see each unordered pair twice (S is square
        # there); off-block groups see it once per orientation == once.
        return out.drop_duplicates(["id_1", "id_2"])

    return rep.groupBy(*extra, "bi", "bj").applyInPandas(block, out_schema)


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 6,
    dim: int | None = None,
    seed: int = 42,
    exact: bool = False,
    n_blocks: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_1 < id_2, score ≥
    threshold). ``exact=True`` runs the full O(N²·d) block-matmul
    (verification / modest-N path); otherwise LSH-bucketed candidates
    only, with exact rescoring of candidates. Null embeddings are
    dropped (family null policy)."""
    df = _drop_null_vecs(df, vec_col)
    if exact:
        if n_blocks is None:
            par = df.sparkSession.sparkContext.defaultParallelism
            n_blocks = max(2, int(par ** 0.5))
        return _block_pairs_exact(df, id_col, vec_col, threshold, n_blocks)

    if dim is None:
        raise ValueError("dim required for LSH path")
    tables = [_hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    sig_udf = lsh_signatures_udf(tables)
    sigs = df.select(
        F.col(id_col), F.posexplode(sig_udf(F.col(vec_col))).alias("table_id", "sig")
    ).localCheckpoint()  # the self-join plus the two vector re-attaches
    # hang FOUR consumers off this subtree: unanchored, the signature
    # UDF and the corpus scan re-execute per consumer (the same
    # subtree-re-execution hazard bm25_index materializes against)
    l = sigs.select(F.col(id_col).alias("id_1"), "table_id", "sig")
    r = sigs.select(F.col(id_col).alias("id_2"), "table_id", "sig")
    cand = (
        l.join(r, ["table_id", "sig"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2")
        .distinct()
    )
    v1 = df.select(F.col(id_col).alias("id_1"), F.col(vec_col).alias("__v1"))
    v2 = df.select(F.col(id_col).alias("id_2"), F.col(vec_col).alias("__v2"))
    cos = cosine_pairs_udf()
    return (
        cand.join(v1, "id_1")
        .join(v2, "id_2")
        .select("id_1", "id_2", cos(F.col("__v1"), F.col("__v2")).alias("score"))
        .filter(F.col("score") >= threshold)
    )


def kmeans_assign(
    df: DataFrame,
    n_clusters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_cap: int = 100_000,
) -> DataFrame:
    """Cluster-assign every row: ``(id, vec, cell)``.

    Centroids fit on a capped deterministic sample
    (:func:`_fit_centroids`), assignment is one Arrow-batched pass with
    the centroid matrix broadcast — the corpus is scanned once, never
    shuffled. Null embeddings are dropped first — the family's standard
    policy (see :func:`prototypicality_scores`): one failed-embedding
    row must not kill a corpus-scale job with an opaque executor-side
    numpy shape error."""
    df = _drop_null_vecs(df, vec_col)
    C = _fit_centroids(df, df, id_col, vec_col, n_clusters, seed, train_cap)
    nearest_cell = _nearest_cell_udf(df.sparkSession, C)

    return df.select(
        F.col(id_col), F.col(vec_col), nearest_cell(F.col(vec_col)).alias("cell")
    )


def semantic_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_cap: int = 100_000,
    n_blocks: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023):
    k-means the embedding space into ``n_clusters`` cells, then exact
    all-pairs cosine WITHIN each cell only. Cross-cluster duplicates are
    the accepted miss (the paper's premise: semantic duplicates land in
    the same cell; recall tunes with fewer, larger clusters).

    FLOPs drop from O(N²·d) to Σ cluster²·d; within a cell the blocked
    matmul of :func:`_block_pairs_exact` spreads work so a mega-cluster
    cannot pin one task. Centroids depend on the KMeans seed →
    rows-only checkable; the recall test against the exact blocked
    all-pairs is the correctness gate."""
    assigned = kmeans_assign(df, n_clusters, id_col, vec_col, seed, train_cap)
    if n_blocks is None:
        par = df.sparkSession.sparkContext.defaultParallelism
        n_blocks = max(2, int(par ** 0.5))
    return _block_pairs_exact(
        assigned, id_col, vec_col, threshold, n_blocks, group_col="cell"
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_cap: int = 100_000,
) -> DataFrame:
    """Rows of ``df`` surviving semantic dedup (greedy min-id keep
    policy over :func:`semantic_dedup_pairs`)."""
    from .dedup import keep_representatives

    pairs = semantic_dedup_pairs(
        df, threshold, n_clusters, id_col, vec_col, seed, train_cap
    )
    kept = keep_representatives(pairs, df.select(id_col), id_col)
    return df.join(kept, id_col, "left_semi")


def mean_pool_embeddings(
    df: DataFrame,
    group_col: str = "doc_id",
    vec_col: str = "embedding",
    out_col: str = "embedding",
) -> DataFrame:
    """Mean-pool chunk embeddings back to one vector per group — the
    chunk→document aggregation after embedding :func:`spans.chunk_text`
    output. Long-format plan (posexplode to (group, dim, value), avg,
    sorted-struct reassembly): the shuffle carries scalars with
    map-side partial averages, and nothing assumes a fixed
    dimensionality. Groups mixing dimensionalities do NOT raise:
    positions beyond a shorter vector's length simply average over the
    rows that have them, so the pooled vector has the group's MAX
    length with tail positions pooled from fewer chunks. Standard
    embedding tables are fixed-dim, where this never triggers; callers
    that need mixed dims rejected should assert a single distinct
    ``F.size(vec_col)`` per group upstream."""
    longf = df.select(
        F.col(group_col), F.posexplode(F.col(vec_col)).alias("__dim", "__v")
    )
    pooled = longf.groupBy(group_col, "__dim").agg(F.avg("__v").alias("__m"))
    return pooled.groupBy(group_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__dim", "__m"))),
            lambda x: x["__m"].cast("float"),
        ).alias(out_col)
    )


def _cell_cosine_udf(spark, C: np.ndarray):
    """Pandas UDF: cosine between a vector and ITS OWN cell's centroid
    (cell assignment comes from :func:`_nearest_cell_udf` — this kernel
    only scores, so assignment can never disagree with the rest of the
    IVF family)."""
    bc = spark.sparkContext.broadcast(_unit(C))

    @pandas_udf("double")
    def cell_cosine(v: pd.Series, cell: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="float64")
        X = _unit(_mat(v))
        cen = bc.value[cell.to_numpy()]
        return pd.Series((X * cen).sum(axis=1))

    return cell_cosine


def prototypicality_scores(
    df: DataFrame,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_cap: int = 100_000,
    out_col: str = "proto_score",
) -> DataFrame:
    """Per-row prototypicality: cosine similarity to the row's k-means
    cluster centroid (Sorscher et al. 2022, "Beyond neural scaling
    laws" — the SSL-prototype difficulty metric: high cosine ⇒ the
    example is prototypical/easy, low cosine ⇒ rare/hard).

    Output: (id, vec, cell, ``out_col``). One corpus scan, zero
    shuffle: centroids fit on the capped sample
    (:func:`_fit_centroids`), then assignment and scoring are two
    Arrow-batched UDFs in the SAME stage with the centroid matrix
    broadcast once each.

    Null embeddings score null cell and null ``out_col`` (no signal —
    the family's standard policy; :func:`prototype_prune`'s filters are
    null-safe, so they drop there). They are also excluded from the
    centroid fit. Ragged dimensionalities are NOT handled, same as the
    rest of the ANN family — assert one ``F.size(vec_col)`` upstream if
    the table can mix dims."""
    spark = df.sparkSession
    ok = _drop_null_vecs(df, vec_col)
    C = _fit_centroids(ok, ok, id_col, vec_col, n_clusters, seed, train_cap)
    nearest = _nearest_cell_udf(spark, C)
    score = _cell_cosine_udf(spark, C)
    scored = ok.select(
        F.col(id_col), F.col(vec_col),
        nearest(F.col(vec_col)).alias("cell"),
    ).withColumn(out_col, score(F.col(vec_col), F.col("cell")))
    nulls = df.filter(F.col(vec_col).isNull()).select(
        F.col(id_col), F.col(vec_col),
        F.lit(None).cast("int").alias("cell"),
        F.lit(None).cast("double").alias(out_col),
    )
    return scored.unionByName(nulls)


def prototype_prune(
    df: DataFrame,
    keep_frac: float = 0.7,
    n_clusters: int = 16,
    policy: str = "keep_hard",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_cap: int = 100_000,
    accuracy: int = 10_000,
) -> DataFrame:
    """Data pruning by prototypicality (Sorscher et al. 2022): keep
    ``keep_frac`` of each cluster, dropping the most prototypical
    examples (``keep_hard`` — the right policy for abundant data) or
    the hardest (``keep_easy`` — the paper's small-data regime).

    The cut is PER CLUSTER via one ``percentile_approx`` sketch
    aggregation broadcast back — no window, no per-cluster sort, so a
    hot cluster costs a bigger aggregation partial, never a single-task
    sort. Per-cluster cuts keep retention balanced across the embedding
    space (the paper's class-balance discipline). keep_frac is honored
    to sketch accuracy, not exactly.

    Output: surviving rows of :func:`prototypicality_scores` (id, vec,
    cell, proto_score)."""
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    if policy not in ("keep_hard", "keep_easy"):
        raise ValueError(f"policy must be keep_hard|keep_easy, got {policy!r}")
    scored = prototypicality_scores(
        df, n_clusters, id_col, vec_col, seed, train_cap)
    if keep_frac == 1.0:
        # drop null-embedding rows here too: the cut-filter path drops
        # them implicitly (null never passes a comparison), and the
        # surviving set must be monotone in keep_frac
        return scored.filter(F.col("proto_score").isNotNull())
    q = keep_frac if policy == "keep_hard" else 1.0 - keep_frac
    cuts = scored.groupBy("cell").agg(
        F.percentile_approx("proto_score", F.lit(float(q)), accuracy)
        .alias("__cut"))
    out = scored.join(F.broadcast(cuts), "cell")
    if policy == "keep_hard":
        out = out.filter(F.col("proto_score") <= F.col("__cut"))
    else:
        out = out.filter(F.col("proto_score") >= F.col("__cut"))
    return out.drop("__cut").select(id_col, vec_col, "cell", "proto_score")
