"""Connected components vs a union-find oracle (fixed + hypothesis)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from tests.conftest import rows


def _uf_components(edges):
    """Union-find oracle: {node: min-id-of-component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_components_chain_and_clique(spark):
    from kafi_spark.functions.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 10), (20, 21), (21, 22), (20, 22)],
        "id_1 long, id_2 long",
    )
    got = rows(connected_components(edges), "id", "component")
    assert got == [
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    ]


def test_components_long_chain(spark):
    """A 40-node chain has diameter 39 — plain one-hop label propagation
    needed O(diameter) rounds and blew past max_iter; star contraction
    converges logarithmically."""
    from kafi_spark.functions.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], "id_1 long, id_2 long"
    )
    got = rows(connected_components(edges), "id", "component")
    assert got == [(i, 1) for i in range(1, 41)]


def test_keep_representatives_cc_vs_single_pass(spark):
    from kafi_spark.functions.dedup import keep_representatives
    from kafi_spark.functions.graph import keep_representatives_cc

    # (2,3) drops 3; (3,4) would drop 4 even though 3 is already gone —
    # the closure keeps exactly one per component instead
    pairs = spark.createDataFrame([(2, 3), (3, 4)], "id_1 long, id_2 long")
    ids = spark.range(1, 6).select(F.col("id").alias("doc_id"))
    single = {r[0] for r in keep_representatives(pairs, ids, "doc_id").collect()}
    closure = {r[0] for r in keep_representatives_cc(pairs, ids, "doc_id").collect()}
    assert single == {1, 2, 5}          # both 3 and 4 dropped
    assert closure == {1, 2, 5}         # same here (one component {2,3,4})
    # a case where they differ: two separate pairs sharing no overlap
    pairs2 = spark.createDataFrame([(1, 3), (2, 3)], "id_1 long, id_2 long")
    single2 = {r[0] for r in keep_representatives(pairs2, ids, "doc_id").collect()}
    closure2 = {r[0] for r in keep_representatives_cc(pairs2, ids, "doc_id").collect()}
    assert closure2 == {1, 4, 5}        # component {1,2,3} -> keep 1
    assert single2 == {1, 2, 4, 5}      # single-pass keeps 2 as well
    # review r7: "the exact upgrade" must honor keep_representatives'
    # schema contract — a multi-column document frame survives with
    # every column intact (the old positional union threw on it)
    docs = ids.withColumn("text", F.concat(F.lit("t"), "doc_id"))
    kept = keep_representatives_cc(pairs2, docs, "doc_id")
    assert kept.columns == ["doc_id", "text"]
    assert {(r.doc_id, r.text) for r in kept.collect()} == {
        (1, "t1"), (4, "t4"), (5, "t5")}


edge_lists = st.lists(
    st.tuples(st.integers(min_value=0, max_value=9),
              st.integers(min_value=0, max_value=9)),
    max_size=12,
).map(lambda es: [(a, b) for a, b in es if a != b])


@pytest.mark.slow
@given(edges=edge_lists)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_components_match_union_find(spark, edges):
    from kafi_spark.functions.graph import connected_components

    if not edges:
        return
    df = spark.createDataFrame(edges, "id_1 long, id_2 long")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert got == _uf_components(edges)


def _pagerank_py(edges, damping=0.85, iters=20):
    """Weighted power iteration: parallel edges count as multiplicity."""
    from collections import Counter

    verts = sorted({v for e in edges for v in e})
    n = len(verts)
    w = Counter(edges)
    out = {}
    for (s, d), c in w.items():
        out.setdefault(s, {})[d] = c
    r = {v: 1.0 / n for v in verts}
    for _ in range(iters):
        dangling = sum(r[v] for v in verts if v not in out)
        nxt = {v: (1 - damping) / n + damping * dangling / n for v in verts}
        for s, ds in out.items():
            deg = sum(ds.values())
            for d, c in ds.items():
                nxt[d] += damping * r[s] * c / deg
        r = nxt
    return r


def test_pagerank_matches_python_power_iteration(spark):
    from kafi_spark.functions.graph import pagerank

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (5, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.rank for r in pagerank(df, max_iter=20).collect()}
    want = _pagerank_py(edges)
    assert set(got) == set(want)
    for v in got:
        assert got[v] == pytest.approx(want[v], rel=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_pagerank_uniform_on_cycle_and_validation(spark):
    from kafi_spark.functions.graph import pagerank

    cyc = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
    got = [r.rank for r in pagerank(cyc, max_iter=10).collect()]
    assert all(x == pytest.approx(1 / 3, rel=1e-9) for x in got)
    with pytest.raises(ValueError):
        pagerank(cyc, damping=1.5)


def test_pagerank_parallel_edges_carry_weight(spark):
    from kafi_spark.functions.graph import pagerank

    edges = [(1, 2), (1, 2), (1, 2), (1, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.rank for r in pagerank(df, max_iter=15).collect()}
    want = _pagerank_py(edges, iters=15)
    for v in got:
        assert got[v] == pytest.approx(want[v], rel=1e-9)
    # triple edge → node 2 strictly outranks node 3
    assert got[2] > got[3]
