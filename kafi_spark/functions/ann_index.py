"""Persisted IVF ANN index — build once, serve many query batches.

:func:`similarity.cosine_topk_ivf` trains k-means and assigns every
corpus vector on EVERY call — the right shape for a one-shot query, the
wrong one for a serving pattern where the same 100 TB corpus answers
query batches all day. This module splits the lifecycle:

- **build** (once): fit centroids, assign cells, write the corpus
  parquet **partitioned by cell** plus a tiny centroids table;
- **search** (many): load the centroid matrix (n_cells × dim — driver-
  small by construction), pick each query's probe cells, and scan ONLY
  the probed cells' partition directories. The cell filter is a
  partition-pruning predicate, so a probe of ``n_probe`` of
  ``n_cells`` cells reads ~n_probe/n_cells of the corpus bytes —
  at scale the index IS the layout (the same footer/directory pruning
  argument as :mod:`kafi_spark.functions.layout`, applied to vectors).

Centroids depend on the k-means seed (rows-only checkable, like
``cosine_topk_ivf``); a full-probe search is mathematically exact
regardless of the centroids, which is the equivalence the tests pin.

Builds are not atomic across the corpus/centroids/codebooks writes —
treat index paths as IMMUTABLE VERSIONS (build to a fresh
``path/v=N``, flip readers after the build returns), the standard
serving practice; :func:`ivf_append` is the one sanctioned in-place
mutation (an appended file set is consistent with the existing
centroids by construction).

Reference scope note: the reference engine has no vector indexes; this
is part of the beyond-reference LLM-pipeline layer (SURVEY.md §2
extension).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window as W, functions as F

from .similarity import (
    _drop_null_vecs, _fit_centroids, _nearest_cell_udf, _probe_cells_udf,
    cosine_pairs_udf)


def _corpus_dir(path: str) -> str:
    return f"{path.rstrip('/')}/corpus"


def _centroids_dir(path: str) -> str:
    return f"{path.rstrip('/')}/centroids"


def _meta_dir(path: str) -> str:
    return f"{path.rstrip('/')}/meta"


def _write_build_meta(spark, path: str) -> None:
    """Record the build-time corpus size (one row) — the baseline the
    append-time health guard measures growth against. The count prunes
    to footer metadata (no vector payload is read). Always written with
    mode=overwrite regardless of the corpus write mode: the meta is a
    single-row baseline for the CURRENT build, and an append-mode build
    used to stack a second built_total row, making .first() (and so the
    growth warning) nondeterministic."""
    built = spark.read.parquet(_corpus_dir(path)).count()
    spark.createDataFrame([(int(built),)], "built_total long").write.mode(
        "overwrite"
    ).parquet(_meta_dir(path))


def _load_build_meta(spark, path: str) -> int | None:
    """Build-time corpus size, or None for indexes persisted before the
    meta record existed (the growth guard then degrades to skew-only)."""
    try:
        row = spark.read.parquet(_meta_dir(path)).first()
    except Exception:  # noqa: BLE001 — missing dir: pre-meta index
        return None
    return None if row is None else int(row["built_total"])


def _check_build_mode(mode: str) -> None:
    """Builds accept overwrite/error modes only. mode="append" would
    stack a SECOND centroid (and codebook) set with duplicate cell ids
    onto the index — load_centroids' row-index-equals-cell-id invariant
    breaks and every subsequent search probes misaligned cells. The
    sanctioned way to grow an index in place is :func:`ivf_append`
    (assigns to the EXISTING centroids); anything else is a rebuild to
    a fresh version path."""
    if mode not in ("overwrite", "error", "errorifexists"):
        raise ValueError(
            f"ivf/ivfpq build mode must be overwrite or error, got "
            f"{mode!r} — use ivf_append to add vectors to an existing "
            "index, or rebuild to a fresh path"
        )


def ivf_build(
    corpus: DataFrame,
    path: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_cap: int = 100_000,
    mode: str = "overwrite",
) -> None:
    """Fit, assign, and persist the index under ``path``.

    One training sample pass + one assignment pass over the corpus; the
    corpus write is ``partitionBy("cell")`` so searches prune at the
    directory level. Centroids go to a second tiny parquet
    (``n_cells`` rows) — the only part a search ever collects.
    """
    _check_build_mode(mode)
    # family null policy (stated by pq.py, round-8 review: build/append
    # crashed in np.vstack instead): a failed-embedding row is DROPPED,
    # never persisted and never fatal
    corpus = _drop_null_vecs(corpus, vec_col)
    C = _fit_centroids(corpus, corpus, id_col, vec_col, n_cells, seed,
                       train_cap)
    spark = corpus.sparkSession
    nearest_cell = _nearest_cell_udf(spark, C)

    (
        corpus.select(
            F.col(id_col), F.col(vec_col),
            nearest_cell(F.col(vec_col)).alias("cell"),
        )
        .write.mode(mode)
        .partitionBy("cell")
        .parquet(_corpus_dir(path))
    )
    cent = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(C)],
        "cell int, centroid array<double>",
    )
    cent.write.mode(mode).parquet(_centroids_dir(path))
    _write_build_meta(spark, path)


def load_centroids(spark, path: str) -> np.ndarray:
    """The centroid matrix (n_cells × dim). Driver-side by design:
    n_cells rows — the index metadata, not the corpus."""
    rows = (
        spark.read.parquet(_centroids_dir(path))
        .orderBy("cell")
        .collect()
    )
    return np.array([r["centroid"] for r in rows], dtype="float64")


def probed_corpus(spark, path: str, cells: list[int]) -> DataFrame:
    """The pruned corpus scan: only the probed cells' partition
    directories are read (the ``cell`` filter is a partition-pruning
    predicate over the ``cell=`` layout — check ``inputFiles()``)."""
    scan = spark.read.parquet(_corpus_dir(path))
    return scan.filter(F.col("cell").isin([int(c) for c in cells]))


def ivf_search(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k cosine search against a persisted index — no training, no
    full-corpus scan.

    The probe-cell union across the query batch is collected driver-side
    to drive partition pruning; it is bounded by ``n_cells`` ints
    (index metadata, not data — sanctioned small collect). Queries are
    broadcast onto the pruned corpus scan exactly as in
    ``cosine_topk_ivf``; scoring and the per-query top-k window are
    unchanged.
    """
    C = load_centroids(spark, path)
    n_cells = len(C)
    if not 1 <= n_probe <= n_cells:
        raise ValueError(f"n_probe must be in [1, {n_cells}], got {n_probe}")
    probe_cells = _probe_cells_udf(spark, C, n_probe)

    probes = _drop_null_vecs(queries, vec_col).select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    ).localCheckpoint()  # consumed twice: cell-union collect + the join
    # (null query vectors are dropped — they cannot be scored; family
    # null policy, round-8 review)
    cells = [r["cell"] for r in probes.select("cell").distinct().collect()]
    corpus = probed_corpus(spark, path, cells)
    cos = cosine_pairs_udf()
    scored = corpus.join(F.broadcast(probes), "cell").select(
        F.col(query_id_col),
        F.col(id_col),
        cos(F.col("__qvec"), F.col(vec_col)).alias("score"),
    )
    w = W.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _codebooks_dir(path: str) -> str:
    return f"{path.rstrip('/')}/codebooks"


def ivfpq_build(
    corpus: DataFrame,
    path: str,
    n_cells: int = 16,
    m_subspaces: int = 8,
    n_codes: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_cap: int = 100_000,
    mode: str = "overwrite",
) -> None:
    """Persist an IVF-PQ index: partition-pruned cells AND compact
    codes — the standard composition for billion-vector corpora
    (Jégou et al. 2011's IVFADC). The cell layout bounds how many BYTES
    a search reads (n_probe/n_cells of the corpus); the PQ codes bound
    how much FLOAT MATH the ADC scan does per byte read; the exact
    rescore (vectors ride along in the same files) restores precision.

    Build: one centroid fit + one codebook fit (both capped driver
    samples), then a single Arrow pass encoding codes AND assigning
    cells — the corpus is scanned once and never joined or shuffled
    except by the partitioned write.
    """
    from .pq import pq_encode, pq_train

    _check_build_mode(mode)
    # family null policy — ivf_build/ivf_append filter, this twin did
    # not (round-9 review): one failed-embedding row reached the
    # centroid-fit sample and killed the whole build inside np.vstack
    corpus = _drop_null_vecs(corpus, vec_col)
    C = _fit_centroids(corpus, corpus, id_col, vec_col, n_cells, seed,
                       train_cap)
    cb = pq_train(corpus, m_subspaces, n_codes, id_col, vec_col, seed,
                  train_cap, normalize=True)
    spark = corpus.sparkSession
    nearest_cell = _nearest_cell_udf(spark, C)

    encoded = pq_encode(
        corpus, cb, id_col, vec_col, normalize=True, keep_vec=True
    ).withColumn("cell", nearest_cell(F.col(vec_col)))
    (
        encoded.write.mode(mode).partitionBy("cell")
        .parquet(_corpus_dir(path))
    )
    cent = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(C)],
        "cell int, centroid array<double>",
    )
    cent.write.mode(mode).parquet(_centroids_dir(path))
    books = spark.createDataFrame(
        [
            (j, c, cb[j, c].tolist())
            for j in range(cb.shape[0])
            for c in range(cb.shape[1])
        ],
        "subspace int, code int, centroid array<double>",
    )
    books.write.mode(mode).parquet(_codebooks_dir(path))
    _write_build_meta(spark, path)


def load_codebooks(spark, path: str) -> np.ndarray:
    """(M, n_codes, d/M) codebook tensor — index metadata
    (M·n_codes rows), driver-side by design."""
    rows = (
        spark.read.parquet(_codebooks_dir(path))
        .orderBy("subspace", "code")
        .collect()
    )
    m = max(r["subspace"] for r in rows) + 1
    n = max(r["code"] for r in rows) + 1
    w = len(rows[0]["centroid"])
    out = np.empty((m, n, w), dtype="float64")
    for r in rows:
        out[r["subspace"], r["code"]] = r["centroid"]
    return out


def ivfpq_search(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    rescore_factor: int = 4,
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k cosine against a persisted IVF-PQ index: partition-pruned
    cell scan → ADC code scan → exact rescore → global top-k.

    The batch's probe-cell UNION drives the pruning, and the ADC scan
    scores every query against every scanned row — rows from cells a
    query did not probe are extra candidates that can only improve its
    recall (restricting per query would trade a corpus-side join
    shuffle for fewer table lookups; at PQ lookup cost the union scan
    wins). Lists collected driver-side are bounded by n_cells and
    M·n_codes — index metadata, never data.
    """
    from .pq import adc_rescore_topk

    C = load_centroids(spark, path)
    n_cells = len(C)
    if not 1 <= n_probe <= n_cells:
        raise ValueError(f"n_probe must be in [1, {n_cells}], got {n_probe}")
    cb = load_codebooks(spark, path)
    probe_cells = _probe_cells_udf(spark, C, n_probe)

    # anchor the query batch ONCE: it is consumed twice (probe-cell
    # collect here, ADC scoring inside adc_rescore_topk), and a
    # nondeterministic queries subplan (sample/limit) would otherwise
    # realize two DIFFERENT batches — a query present only in the
    # second has its nearest cells unprobed and silently returns
    # low-recall top-k (round-8 review; same class as ivf_delete's
    # dels checkpoint and ivf_search's probes checkpoint). Query
    # batches are small by contract, so the checkpoint is cheap.
    q = (_drop_null_vecs(queries, vec_col)  # family null policy
         .select(query_id_col, vec_col).localCheckpoint())
    if q.isEmpty():
        # match the plain-IVF sibling: an empty (or all-null) query
        # batch returns an empty result frame — ivf_search already did,
        # while this path raised from adc_rescore_topk, so the SAME
        # serving job crashed or succeeded depending on which index
        # flavor it probed (round-9 review)
        qid_t = queries.schema[query_id_col].dataType.simpleString()
        id_t = spark.read.parquet(_corpus_dir(path)).schema[
            id_col].dataType.simpleString()
        return spark.createDataFrame(
            [], f"{query_id_col} {qid_t}, {id_col} {id_t}, "
                "score double, rank int")
    cells = [
        r["cell"]
        for r in q.select(
            F.explode(probe_cells(F.col(vec_col))).alias("cell")
        )
        .distinct()
        .collect()
    ]
    scan = probed_corpus(spark, path, cells)
    return adc_rescore_topk(
        scan, cb, q, k, rescore_factor, id_col, vec_col,
        query_id_col,
    )


def ivf_append(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    skew_warn: float = 4.0,
    growth_warn: float = 2.0,
) -> DataFrame:
    """Assign NEW vectors to the existing centroids and append them to
    the cell partitions — the daily-ingest path: the index absorbs new
    data without retraining or rewriting (centroid drift is the
    documented trade). Works for both plain-IVF and IVF-PQ indexes (the
    latter re-encodes with the persisted codebooks so the appended rows
    carry codes too).

    Returns the POST-append :func:`ivf_stats` frame, and SURFACES the
    rebuild cadence that function documents instead of leaving it to
    the operator's memory: a :class:`UserWarning` fires when the
    appended index crosses either advisory threshold —
    ``max(skew) > skew_warn`` (a cell holds > skew_warn× the uniform
    share: centroid drift is concentrating ingest, probes of that cell
    now scan a corpus-scale partition) or total volume ≥ ``growth_warn``
    × the build-time size (recall decays once appended mass rivals what
    the centroids were fit on). The check reads the cell partition
    column + one meta row — index metadata, not vectors. Indexes
    persisted before the build-size record degrade to skew-only.
    Thresholds are advisory (append always succeeds); rebuild with
    :func:`ivf_build`/:func:`ivfpq_build` to a fresh version path when
    warned."""
    spark = new_vectors.sparkSession
    # null embeddings: drop, matching the IVF-PQ leg (pq_encode filters
    # them) and the family policy — one failed row must not kill the
    # daily ingest (round-8 review)
    new_vectors = _drop_null_vecs(new_vectors, vec_col)
    C = load_centroids(spark, path)
    nearest_cell = _nearest_cell_udf(spark, C)

    existing = spark.read.parquet(_corpus_dir(path))
    if "pq_code" in existing.columns:
        from .pq import pq_encode

        cb = load_codebooks(spark, path)
        rows = pq_encode(
            new_vectors, cb, id_col, vec_col, normalize=True,
            keep_vec=True,
        )
    else:
        rows = new_vectors.select(F.col(id_col), F.col(vec_col))
    (
        rows.withColumn("cell", nearest_cell(F.col(vec_col)))
        .write.mode("append")
        .partitionBy("cell")
        .parquet(_corpus_dir(path))
    )
    import warnings

    stats = ivf_stats(spark, path)
    # ONE aggregation job answers every threshold question (a second
    # stats.first() for the hot cell would recompute the whole groupBy)
    agg = stats.agg(
        F.max("skew").alias("max_skew"),
        F.sum("n").alias("total"),
        F.max_by(F.struct("cell", "n"), "n").alias("hot"),
    ).first()
    problems = []
    if agg["max_skew"] is not None and agg["max_skew"] > skew_warn:
        problems.append(
            f"max cell skew {agg['max_skew']:.1f}x > {skew_warn}x "
            f"(cell {agg['hot']['cell']}: {agg['hot']['n']} vectors)"
        )
    built = _load_build_meta(spark, path)
    # built == 0 must NOT disable the check (an append onto centroids fit
    # on nothing is exactly when the rebuild warning matters most)
    if built is not None and agg["total"] and agg["total"] >= growth_warn * built:
        problems.append(
            f"volume {agg['total']} >= {growth_warn}x build size {built}"
        )
    if problems:
        warnings.warn(
            f"IVF index at {path} past its rebuild cadence: "
            + "; ".join(problems)
            + " — rebuild to a fresh version path (ivf_build/ivfpq_build)",
            UserWarning,
            stacklevel=2,
        )
    return stats


def ivf_delete(
    ids,
    path: str,
    id_col: str = "vec_id",
) -> DataFrame:
    """Remove vectors from a persisted index by id, rewriting ONLY the
    cell partitions that contain them — the compaction half of the
    ingest story: the engine's own dedup emits "drop these vec_ids"
    lists, and without this every drop list forced a full rebuild.

    ``ids`` is a DataFrame carrying ``id_col`` (or a plain iterable of
    ids). Discipline mirrors :func:`ivf_append`'s cell pruning:

    - one semi-join over the corpus' (id, cell) COLUMNS finds the
      affected cells (ids don't know their cell; the id column scan is
      the unavoidable lookup, the vector payload is never read for it);
    - survivors of ONLY those cells are localCheckpoint-ed (bounded by
      the touched partitions — this breaks lineage so the dynamic
      partition overwrite never reads the files it is replacing), then
      written back with ``partitionOverwriteMode=dynamic`` so untouched
      cell directories keep their files byte-for-byte;
    - cells whose every row was deleted produce no output partition for
      the dynamic overwrite to replace, so their stale directories are
      removed explicitly (idempotent — a crash between commit and
      cleanup re-deletes on the next call).

    Works for plain-IVF and IVF-PQ alike (survivor rows keep their
    ``pq_code``). Deleting the LAST vector of the index is refused —
    an empty corpus directory is not a valid index; drop the path and
    rebuild instead. Like builds, the rewrite is not atomic across
    cells; treat index paths as versions under concurrent readers.

    Returns the post-delete :func:`ivf_stats` frame."""
    if not isinstance(ids, DataFrame):
        # the documented plain-iterable convention (round-8 ADVICE: the
        # docstring promised it, the code rejected it). Strings/bytes
        # are almost certainly a single mistyped id, not a collection
        # of its characters — refuse those explicitly.
        from pyspark.sql import SparkSession

        if isinstance(ids, (str, bytes)):
            raise TypeError(
                f"ids must be a DataFrame or an iterable of ids, got a "
                f"single {type(ids).__name__} — wrap it in a list"
            )
        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                "no active SparkSession to build the delete frame from "
                "a plain iterable — pass ids as a DataFrame instead"
            )
        id_list = [(i,) for i in ids]
        if not id_list:
            return ivf_stats(spark, path)
        ids = spark.createDataFrame(id_list, [id_col])
    spark = ids.sparkSession
    # materialize the delete set ONCE: the semi-join probe and the
    # anti-join rewrite are separate Spark jobs, so a nondeterministic
    # ids frame (limit/sample) would otherwise realize two DIFFERENT id
    # sets — an id only in the second realization lands outside the
    # `affected` cells and silently survives. Id-column-only, so the
    # checkpoint is delete-list-sized, not corpus-sized. No broadcast
    # hint: drop lists can be corpus-scale; AQE broadcasts small ones
    # on its own and shuffles the rest.
    dels = ids.select(F.col(id_col)).distinct().localCheckpoint()
    cdir = _corpus_dir(path)
    corpus = spark.read.parquet(cdir)
    # affected + populated cells in ONE pass over (id, cell) only
    probe = (
        corpus.join(dels, id_col, "semi")
        .select("cell").distinct().collect()
    )
    affected = sorted(r["cell"] for r in probe)
    if not affected:
        return ivf_stats(spark, path)
    survivors = (
        corpus.filter(F.col("cell").isin(affected))
        .join(dels, id_col, "anti")
        .localCheckpoint()
    )
    remaining = {
        r["cell"] for r in survivors.select("cell").distinct().collect()
    }
    emptied = [c for c in affected if c not in remaining]
    if emptied:
        populated = {
            r["cell"] for r in corpus.select("cell").distinct().collect()
        }
        if populated <= set(emptied):
            raise ValueError(
                "ivf_delete would remove every vector in the index at "
                f"{path}; an empty index is not servable — drop the "
                "path and rebuild instead"
            )
    if remaining:
        (
            survivors.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("cell")
            .parquet(cdir)
        )
    if emptied:
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        root = jvm.org.apache.hadoop.fs.Path(cdir)
        fs = root.getFileSystem(hconf)
        for c in emptied:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(f"{cdir}/cell={int(c)}"),
                True,
            )
    return ivf_stats(spark, path)


def ivf_stats(spark, path: str) -> DataFrame:
    """Index health probe: one row per cell with its vector count, plus
    ``frac`` (share of the corpus) and ``skew`` (count / ideal uniform
    count). Drives the rebuild cadence :func:`ivf_append` documents —
    e.g. rebuild when ``max(skew)`` crosses a few x, or when total
    volume has doubled since :func:`ivf_build`.

    Cost: one aggregation over the cell partition COLUMN only (parquet
    partition pruning means no vector payload is read)."""
    corpus = spark.read.parquet(_corpus_dir(path))
    counts = corpus.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    n_cells = load_centroids(spark, path).shape[0]
    totals = counts.agg(
        F.sum("n").alias("__total")).select(
        "__total", (F.col("__total") / n_cells).alias("__ideal"))
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "cell", "n",
            (F.col("n") / F.col("__total")).alias("frac"),
            (F.col("n") / F.col("__ideal")).alias("skew"),
        )
        .orderBy(F.col("n").desc())
    )
