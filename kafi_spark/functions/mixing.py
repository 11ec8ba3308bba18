"""Corpus mixing — sample sources to target mixture proportions.

Training corpora are blended from sources with prescribed weights
("data mixing"). ``mix_sources`` computes per-source Bernoulli sampling
fractions that realize the requested proportions at the largest feasible
scale (or a requested total) and applies them in one ``sampleBy`` pass.

Scale notes: the only driver-side materialization is the per-source
count (one hash aggregate, #sources rows — admin-small by definition);
the sampling itself is a stateless per-row Bernoulli draw, no shuffle at
all. Sampling is seed-deterministic per (row, seed) and approximate in
count (binomial), which is the standard trade at corpus scale — exact-n
sampling would need a global sort or reservoir pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def mix_fractions(
    counts: dict[str, int],
    targets: dict[str, float],
    total: int | None = None,
) -> dict[str, float]:
    """Per-source sampling fractions hitting ``targets`` proportions.

    ``targets`` are relative weights (normalized internally). The
    feasible scale is capped by the scarcest source (no oversampling —
    fractions never exceed 1.0) and optionally by ``total`` rows.
    Sources absent from ``targets`` get fraction 0 (dropped).
    """
    if any(w < 0 for w in targets.values()):
        # a negative weight silently inflated every other fraction (the
        # normalizer shrank while the kept weights didn't) — reject like
        # split_corpus does
        raise ValueError(f"target weights must be >= 0, got {targets}")
    weight_sum = sum(targets.values())
    if weight_sum <= 0:
        raise ValueError("targets must contain positive weights")
    norm = {s: w / weight_sum for s, w in targets.items() if w > 0}
    missing = [s for s in norm if s not in counts or counts[s] == 0]
    if missing:
        raise ValueError(f"no rows for target sources {missing}")
    # largest total T with T * norm_s <= count_s for every source
    scale = min(counts[s] / f for s, f in norm.items())
    if total is not None:
        scale = min(scale, float(total))
    return {s: min(1.0, scale * f / counts[s]) for s, f in norm.items()}


def mix_sources(
    df: DataFrame,
    source_col: str,
    targets: dict[str, float],
    total: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Sample ``df`` so sources appear in ``targets`` proportions.

    Returns the sampled frame (schema unchanged). Proportions are
    approximate (per-row Bernoulli; relative error shrinks as 1/√n).
    """
    counts = {
        r[0]: r[1]
        for r in df.groupBy(source_col).count().collect()
    }
    fractions = mix_fractions(counts, targets, total)
    return df.sampleBy(source_col, fractions, seed=seed)


def split_corpus(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
) -> dict[str, DataFrame]:
    """Deterministic train/val/test split by content of the id column.

    Every row lands in EXACTLY one split, decided by
    ``xxhash64(seed, id) mod 1e6`` against cumulative weight thresholds —
    so membership is a pure function of (id, seed, weights): stable
    across runs, cluster sizes, partitionings, and data order (the
    property ``randomSplit`` does NOT give you — its assignment depends
    on partition layout). Proportions are approximate (hash-uniform;
    relative error shrinks as 1/sqrt(n)).

    Returns {split_name: DataFrame}; the frames partition ``df`` (each
    original row appears in exactly one). Weights are relative and
    normalized internally.
    """
    from pyspark.sql import functions as F

    total = sum(weights.values())
    if total <= 0 or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative with a positive sum")
    resolution = 1_000_000
    bucket = F.pmod(F.xxhash64(F.lit(seed), F.col(id_col)), F.lit(resolution))
    out: dict[str, DataFrame] = {}
    cum = 0.0
    names = list(weights)
    for i, name in enumerate(names):
        lo = int(cum * resolution / total)
        cum += weights[name]
        # last split takes the remainder so rounding never drops a row
        hi = resolution if i == len(names) - 1 else int(cum * resolution / total)
        out[name] = df.filter((bucket >= lo) & (bucket < hi))
    return out


def stratified_sample_exact(
    df: DataFrame,
    strata_col: str,
    k_per_stratum: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """EXACTLY ``k`` rows per stratum (fewer iff the stratum is
    smaller), chosen by ranking a hashed uniform within each stratum —
    deterministic for fixed (data, seed), unlike ``sampleBy`` (Bernoulli
    per row: approximate counts, partition-order-sensitive). The eval-
    set carve-out primitive: one window shuffle keyed on the stratum."""
    from pyspark.sql import Window as W, functions as F

    from kafi_spark.functions.portable import md5_long

    if k_per_stratum < 1:
        raise ValueError(f"k_per_stratum must be >= 1, got {k_per_stratum}")
    if "__rank" in df.columns:
        raise ValueError(
            "input column '__rank' collides with sampling internals; "
            "rename it before sampling")
    key = md5_long(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    w = W.partitionBy(strata_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k_per_stratum)
        .drop("__rank")
    )


def shuffle_deterministic(
    df: DataFrame, id_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Global deterministic permutation by hashed id — the
    training-order shuffle: same (data, seed) ⇒ same order on any
    cluster size or partitioning. One range-partitioned sort; write the
    result with ``sortWithinPartitions`` preserved for reproducible
    epoch order."""
    from pyspark.sql import functions as F

    from kafi_spark.functions.portable import md5_long

    key = md5_long(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    return df.orderBy(key, F.col(id_col))
