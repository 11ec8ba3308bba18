"""Connected components — transitive closure for near-dup clustering.

``keep_representatives`` (dedup.py) is the single-pass policy: drop the
larger member of every pair. It under-merges chains (a~b, b~c keeps a
and c in separate decisions but drops b twice — fine — yet a pair
(c, d) whose c was already dropped still eliminates d). Proper
cluster-then-keep needs the transitive closure: connected components
over the near-dup pair graph, then one representative per component.

Algorithm: iterative min-label propagation (the standard Spark-scale
formulation — each step every node adopts the minimum label in its
closed neighborhood; converges in O(log diameter) rounds on real dedup
graphs, whose components are tiny and dense).

Scale notes: each round is one join (labels ⋈ edges) + one groupBy min
— both shuffle on node ids. The label frame is ``localCheckpoint``-ed
every round: an iterative fixpoint DOUBLES plan depth per round without
lineage truncation (compile time explodes long before data does). This
is the one sanctioned deviation from the no-materialize policy
(PLANS.md) — the checkpointed frame is O(nodes) ids+labels, not data,
and iterative algorithms are exactly what checkpointing exists for
(MLlib/GraphX do the same).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


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
    reached within ``max_iter`` rounds (pathological graph diameter).
    """
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # each node adopts min(own label, neighbors' labels)
        neighbor = (
            sym.join(labels.withColumnRenamed("id", "b"), "b")
            .select(F.col("a").alias("id"), "component")
        )
        new_labels = (
            labels.union(neighbor)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("component", "old"), "id")
            .filter(F.col("component") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
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
    """
    comp = connected_components(pairs, "id_1", "id_2")
    survivors = comp.groupBy("component").agg(F.min("id").alias(id_col)).select(id_col)
    in_graph = comp.select(F.col("id").alias(id_col))
    isolated = all_ids.join(in_graph, id_col, "left_anti")
    return isolated.union(survivors)
