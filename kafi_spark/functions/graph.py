"""Connected components — transitive closure for near-dup clustering.

``keep_representatives`` (dedup.py) is the single-pass policy: drop the
larger member of every pair. It under-merges chains (a~b, b~c keeps a
and c in separate decisions but drops b twice — fine — yet a pair
(c, d) whose c was already dropped still eliminates d). Proper
cluster-then-keep needs the transitive closure: connected components
over the near-dup pair graph, then one representative per component.

Algorithm: alternating large-star / small-star contraction (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC 2014 — the
standard shuffle-based formulation, public literature). Each round
every node re-links its neighbors to the minimum id it can see; the
edge set converges to one star per component, centered at the
component's minimum id, in O(log n) rounds in practice (O(log² n)
worst case). This replaces an earlier plain min-label propagation that
moved labels ONE hop per round — O(diameter) rounds, which a 25-node
chain already pushed past max_iter.

Scale notes: each half-round is one groupBy-min plus one join, both
shuffling on node ids with map-side partial aggregation; skewed hub
nodes are AQE's skew-join case. The input pair list is materialized
ONCE with ``localCheckpoint`` (near-dup ``pairs`` are an expensive
subplan — LSH banding + verification — that must not re-execute every
round), and each round's edge set is checkpointed too: an iterative
fixpoint DOUBLES plan depth per round without lineage truncation
(compile time explodes long before data does). This is the one
sanctioned deviation from the no-materialize policy (PLANS.md) — the
checkpointed frame is O(edges) id pairs, not data, and iterative
algorithms are exactly what checkpointing exists for (MLlib/GraphX do
the same).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to the minimum of u's closed
    neighborhood: emit (v, m) for v ∈ Γ(u), v > u, m = min(Γ(u) ∪ {u})."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", "u").alias("m"))
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Within each node's smaller-neighbor set, re-link everything to the
    minimum: orient edges (u > v), m = min of u's smaller neighbors, emit
    (v, m) for each such neighbor plus (u, m)."""
    oriented = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    return (
        oriented.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select("u", F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src_col: str = "id_1",
    dst_col: str = "id_2",
    max_iter: int = 20,
) -> DataFrame:
    """Component label per node of the undirected ``edges`` graph.

    Output: (id, component) — component = the minimum node id reachable;
    isolated nodes do not appear (callers union their full id set, see
    :func:`keep_representatives_cc`). Raises if the fixpoint is not
    reached within ``max_iter`` rounds; star contraction needs
    O(log² n) rounds worst case, so 20 covers any graph that fits on
    hardware (2^20-diameter chains included).
    """
    e = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev_n = e.count()
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint()
        n2 = e2.count()
        # carry the previous round's count instead of re-counting e —
        # one fewer cluster-wide job per iteration
        converged = n2 == prev_n and e2.subtract(e).limit(1).count() == 0
        e, prev_n = e2, n2
        if converged:
            # fixpoint = one star per component, centered at the min id
            return (
                e.select(F.col("u").alias("id"), F.col("v").alias("component"))
                .union(
                    e.select(
                        F.col("v").alias("id"), F.col("v").alias("component")
                    )
                )
                .groupBy("id")
                .agg(F.min("component").alias("component"))
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def keep_representatives_cc(
    pairs: DataFrame, all_ids: DataFrame, id_col: str
) -> DataFrame:
    """Transitive-closure dedup policy: one survivor (the minimum id)
    per near-dup component; ids in no pair survive untouched.

    The exact upgrade of ``dedup.keep_representatives`` — for chain
    topologies (a~b~c with no a~c pair) the single-pass policy keeps
    {a}, and so does this one, but for pair sets where a dropped id
    appears as the smaller member (c dropped via (b, c), then (c, d))
    the single-pass drops d spuriously while the closure keeps exactly
    one per component.

    Schema-preserving like ``dedup.keep_representatives`` (review r7:
    the old positional ``isolated.union(survivors)`` required all_ids
    to be a single-column frame and threw on callers passing their full
    document frame): the result is ``all_ids`` minus the dropped ids,
    every input column intact.
    """
    comp = connected_components(pairs, "id_1", "id_2")
    # the component label IS the component's minimum id (the star
    # fixpoint centers on it), so survivors are just the distinct
    # labels — no extra groupBy-min
    survivor_ids = comp.select(F.col("component").alias(id_col)).distinct()
    losers = comp.select(F.col("id").alias(id_col)).join(
        survivor_ids, id_col, "left_anti")
    return all_ids.join(losers, id_col, "left_anti")


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    max_iter: int = 20,
) -> DataFrame:
    """PageRank over a directed edge list: ``(id, rank)``, ranks summing
    to 1 — the standard link-authority score for web-corpus curation
    (domain/page weighting before sampling).

    Power iteration, all DataFrame ops: per round a rank⋈out-degree
    join (checkpointed — two consumers), an edge⋈rank contribution join
    + aggregate, and the vertex re-attach, with the rank frame
    ``localCheckpoint``-ed so round N+1's plan does not re-embed rounds
    1..N (the iterative-plan-blowup hazard
    :func:`connected_components` documents). Parallel edges are
    WEIGHTED (multiplicity = share of the source's mass). Dangling mass (sinks with
    no out-edges) redistributes uniformly, keeping the distribution
    normalized — drift would otherwise compound per iteration. A fixed
    ``max_iter`` bounds rounds; each round is one action (the dangling
    sum), the standard cost of dangling-aware PageRank.
    """
    if not (0.0 < damping < 1.0):
        raise ValueError(f"damping must be in (0,1), got {damping}")
    # PARALLEL edges carry weight: (a→b) three times sends b three
    # shares of a's mass (a page linking another repeatedly, an
    # un-deduped crawl). Deduplicate upstream if multiplicity should
    # not count.
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("__w"))
        .localCheckpoint()
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    n = verts.count()
    if n == 0:
        return verts.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.sum("__w").alias("__deg"))
    ranks = verts.withColumn("rank", F.lit(1.0 / n))
    for _ in range(max_iter):
        # checkpoint the joined frame: BOTH the dangling action and the
        # contribution lineage consume it — unanchored, the verts-scale
        # ranks⋈outdeg join would execute twice per round
        with_deg = (
            ranks.join(outdeg, ranks["id"] == outdeg["src"], "left")
            .select(ranks["id"], "rank", "__deg")
            .localCheckpoint()
        )
        # sinks contribute their whole rank to the uniform pool
        dangling = (
            with_deg.filter(F.col("__deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        contribs = (
            e.join(with_deg.filter(F.col("__deg").isNotNull()),
                   e["src"] == with_deg["id"])
            .select(F.col("dst").alias("id"),
                    (F.col("rank") * F.col("__w") / F.col("__deg")).alias("__c"))
            .groupBy("id")
            .agg(F.sum("__c").alias("__in"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = verts.join(contribs, "id", "left").select(
            "id",
            (F.lit(base) + damping * F.coalesce("__in", F.lit(0.0))).alias("rank"),
        ).localCheckpoint()
    return ranks
