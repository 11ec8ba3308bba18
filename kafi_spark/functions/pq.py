"""Product quantization (PQ) for memory-bound ANN at corpus scale.

Scalar int8 quantization (:mod:`similarity`) cuts scans 4×; PQ goes
much further: split the d-dim space into M subspaces, k-means each
subspace into 256 centroids, store each vector as M one-byte codes —
d·4 bytes → M bytes (e.g. 64-dim float32 = 256 B → 8 B at M=8, 32×).
Search uses the asymmetric distance computation (ADC) of Jégou et al.
2011: the query precomputes an (M × 256) table of partial dot products
against the codebooks, and scoring a corpus vector is M table lookups —
no float math per vector. A final exact rescore of the top
``rescore_factor·k`` ADC candidates recovers the precision the 8-byte
codes lose (same two-phase shape as ``cosine_topk_quantized``).

Scale shape: training collects ≤ ``train_cap`` sampled vectors to the
driver (bounded by construction — the one deliberate driver-side step,
like IVF's centroid fit) and runs seeded k-means per subspace in numpy;
encoding is one Arrow-batched corpus pass with the codebooks broadcast;
search is one corpus pass with map-side partial top-k (the corpus is
never shuffled or joined — only partitions × Q × k' candidate rows move).

Codebooks depend on the k-means seed → rows-only checkable; the recall
differential against exact ``cosine_topk`` is the correctness gate.

Reference scope: beyond-reference LLM-pipeline layer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F

from .similarity import _kmeans_np, _mat, _topk_per_batch, _unit


def pq_train(
    df: DataFrame,
    m_subspaces: int = 8,
    n_codes: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_cap: int = 50_000,
    normalize: bool = True,
) -> np.ndarray:
    """Fit PQ codebooks: (M, n_codes, d/M) from a capped deterministic
    sample (hash-of-id modulus, same discipline as the IVF fit — no
    Sample reshuffle, stable across cluster size). ``normalize=True``
    trains on unit vectors so ADC dot products ≈ cosine."""
    from .similarity import _estimate_rows

    if n_codes > 256:
        raise ValueError(f"n_codes must fit one byte (<= 256), got {n_codes}")
    # null embeddings drop up front — the ANN family's standard policy
    # (similarity.kmeans_assign/prototypicality_scores): one failed-
    # embedding row must not kill the job with a numpy shape error
    df = df.filter(F.col(vec_col).isNotNull())
    n_est = _estimate_rows(df, df, vec_col)
    modulus = max(1, n_est // train_cap)
    sample = df
    if modulus > 1:
        sample = df.filter(F.pmod(F.xxhash64(F.col(id_col)), modulus) == 0)
    # hash-ordered limit = the HARD driver-memory bound (the modulus
    # only thins; a compressed-parquet sizeInBytes estimate can be a
    # few-x off) — deterministic total order, partial top-k per
    # partition, never over-collects
    sample = (
        sample.select(F.col(vec_col), F.xxhash64(F.col(id_col)).alias("__k"))
        .orderBy("__k")
        .limit(train_cap)
    )
    X = _mat(sample.toPandas()[vec_col])
    if normalize:
        X = _unit(X)
    d = X.shape[1]
    if d % m_subspaces != 0:
        raise ValueError(f"dim {d} not divisible by m_subspaces {m_subspaces}")
    w = d // m_subspaces
    # single init per subspace: PQ quantization error is smoothed over M
    # independent codebooks AND corrected by the exact rescore phase, so
    # restart selection (which triples training time at k=256) buys no
    # measurable recall here — unlike the cell-assignment fits, where
    # partition quality directly gates probe recall
    return np.stack(
        [
            _kmeans_np(X[:, j * w : (j + 1) * w], n_codes, seed + j, n_init=1)
            for j in range(m_subspaces)
        ]
    )


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
    keep_vec: bool = False,
) -> DataFrame:
    """Encode each vector as M one-byte codes: ``(id, pq_code binary)``.
    One Arrow-batched pass, codebooks broadcast. ``keep_vec=True`` also
    emits the original vector column from the SAME pass — callers that
    need codes + vectors together (the rescoring search) must use this
    rather than joining back to the corpus, which would shuffle every
    embedding across the cluster."""
    df = df.filter(F.col(vec_col).isNotNull())  # family null policy
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(codebooks)

    def op(batches):
        CB = bc.value
        m, _, w = CB.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = _mat(pdf["__vec"])
            if normalize:
                X = _unit(X)
            codes = np.empty((len(X), m), dtype=np.uint8)
            for j in range(m):
                sub = X[:, j * w : (j + 1) * w]
                C = CB[j]
                codes[:, j] = (
                    (-2 * sub @ C.T + (C**2).sum(axis=1)).argmin(axis=1)
                ).astype(np.uint8)
            out = {"__id": pdf["__id"].values,
                   "pq_code": [row.tobytes() for row in codes]}
            if keep_vec:
                out["__vec"] = pdf["__vec"].values
            yield pd.DataFrame(out)

    id_t = df.schema[id_col].dataType.simpleString()
    vec_t = df.schema[vec_col].dataType.simpleString()
    schema = f"__id {id_t}, pq_code binary"
    if keep_vec:
        schema += f", __vec {vec_t}"
    out = (
        df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec"))
        .mapInPandas(op, schema)
        .withColumnRenamed("__id", id_col)
    )
    return out.withColumnRenamed("__vec", vec_col) if keep_vec else out


def cosine_topk_pq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m_subspaces: int = 8,
    n_codes: int = 256,
    rescore_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    train_cap: int = 50_000,
) -> DataFrame:
    """Top-k by cosine with a PQ-compressed first pass + exact rescore.

    Phase 1 scans (id, pq_code, vec): per Arrow batch, decode is M
    uint8 gathers into the query's ADC lookup table (no per-vector
    float ops), emitting each partition's top ``rescore_factor·k`` per
    query with their EXACT cosine (the full vector rides along in the
    same scan, so rescoring costs one einsum over survivors only — no
    second corpus pass, no join). Phase 2 is the global top-k window
    over partitions × Q × k' rows.
    """
    cb = pq_train(
        corpus, m_subspaces, n_codes, id_col, vec_col, seed, train_cap,
        normalize=True,
    )
    # codes + vectors from ONE encode pass — no join back to the corpus
    # (a corpus-sized shuffle of every embedding)
    encoded = pq_encode(corpus, cb, id_col, vec_col, normalize=True, keep_vec=True)
    return adc_rescore_topk(
        encoded, cb, queries, k, rescore_factor, id_col, vec_col,
        query_id_col,
    )


def adc_rescore_topk(
    encoded: DataFrame,
    cb: np.ndarray,
    queries: DataFrame,
    k: int = 5,
    rescore_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """The ADC scan + exact-rescore + global top-k tail, over an already
    ENCODED frame ``(id, pq_code, vec)`` — shared by
    :func:`cosine_topk_pq` (which encodes inline) and the persisted
    IVF-PQ index (:mod:`kafi_spark.functions.ann_index`, which scans
    pre-encoded, partition-pruned cells). Phase semantics as documented
    on :func:`cosine_topk_pq`.
    """
    qpdf = queries.select(query_id_col, vec_col).filter(
        f"{vec_col} IS NOT NULL").toPandas()
    if len(qpdf) == 0:
        raise ValueError("empty query set")
    Q = _unit(_mat(qpdf[vec_col]))
    qids = qpdf[query_id_col].to_numpy()
    spark = encoded.sparkSession
    m, _, w = cb.shape
    # ADC tables: lut[q, j, code] = Q_sub(q,j) · codebook(j, code)
    lut = np.einsum("qjw,jcw->qjc", Q.reshape(len(Q), m, w), cb)
    bq = spark.sparkContext.broadcast((lut, Q, qids))
    kk = max(k, rescore_factor * k)

    def part(batches):
        lut_, Q_, qids_ = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.frombuffer(
                b"".join(pdf["pq_code"]), dtype=np.uint8
            ).reshape(len(pdf), m)
            # S_adc[i, q] = Σ_j lut[q, j, codes[i, j]]
            S = np.zeros((len(pdf), len(Q_)))
            for j in range(m):
                S += lut_[:, j, codes[:, j]].T
            ids = pdf["__id"].to_numpy()
            # two-phase within the batch: pick every query's ADC
            # survivors first, then materialize/normalize ONLY the
            # union of survivor rows (≤ Q·k' of a possibly 10k-row
            # batch) — the rescore einsum touches survivors only
            per_q = list(_topk_per_batch(S, ids, kk))
            surv = np.unique(np.concatenate([o for _, o in per_q])) if per_q else []
            if len(surv) == 0:
                continue
            Xs = _unit(_mat(pdf["__vec"].iloc[surv]))
            row_of = {int(g): i for i, g in enumerate(surv)}
            out_q, out_id, out_s = [], [], []
            for q, order in per_q:
                local = [row_of[int(g)] for g in order]
                exact = Xs[local] @ Q_[q]
                out_q.extend([qids_[q]] * len(order))
                out_id.extend(ids[order])
                out_s.extend(exact)
            yield pd.DataFrame(
                {query_id_col: out_q, id_col: out_id, "score": out_s}
            )

    id_t = encoded.schema[id_col].dataType.simpleString()
    qid_t = queries.schema[query_id_col].dataType.simpleString()
    c = encoded.select(
        F.col(id_col).alias("__id"), "pq_code", F.col(vec_col).alias("__vec")
    )
    partials = c.mapInPandas(
        part, f"{query_id_col} {qid_t}, {id_col} {id_t}, score double"
    )
    win = W.partitionBy(query_id_col).orderBy(F.col("score").desc(), F.col(id_col))
    return partials.withColumn("rank", F.row_number().over(win)).filter(
        F.col("rank") <= k
    )
