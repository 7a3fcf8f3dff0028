"""Connected components / dedup clustering (operators/graph.py).

The reference's dedup stops at ``distinct()`` (modules/
auto_loader_steps.py:289); the clustering step is part of the
LLM-corpus extension surface. These tests check the distributed
min-label-propagation CC against known graph shapes and a brute-force
union-find reference.
"""

import random

from pyspark.sql import functions as F

from dataingestionframework_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def _cc_rows(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, **kw)
    return {r["id"]: r["component"] for r in out.collect()}


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # Canonicalize to min id per component.
    comps = {}
    for n in list(parent):
        comps.setdefault(find(n), []).append(n)
    return {n: root for root, ns in comps.items() for n in ns}


def test_cc_chain_collapses_to_min(spark):
    # A long path is the worst case for plain label propagation;
    # pointer jumping must still converge well inside max_iter.
    edges = [(i, i + 1) for i in range(0, 64)]
    got = _cc_rows(spark, edges, max_iter=10)
    assert got == {i: 0 for i in range(0, 65)}


def test_cc_two_components_and_duplicates(spark):
    edges = [(5, 3), (3, 5), (3, 9), (20, 21), (21, 21)]
    got = _cc_rows(spark, edges)
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}


def test_cc_matches_union_find_random(spark):
    rng = random.Random(7)
    nodes = list(range(200))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    want = _union_find(edges)
    got = _cc_rows(spark, edges)
    assert got == want


def test_dedup_clusters_covers_unpaired_docs(spark):
    docs = spark.range(10).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(1, 4), (4, 7), (2, 9)], "id_a long, id_b long"
    )
    out = {
        r["doc_id"]: (r["canonical_id"], r["cluster_size"])
        for r in dedup_clusters(docs, pairs).collect()
    }
    assert len(out) == 10
    assert out[1] == (1, 3) and out[4] == (1, 3) and out[7] == (1, 3)
    assert out[2] == (2, 2) and out[9] == (2, 2)
    for lone in (0, 3, 5, 6, 8):
        assert out[lone] == (lone, 1)
    # The keep-set is exactly one doc per cluster.
    keep = [d for d, (c, _) in out.items() if d == c]
    assert sorted(keep) == [0, 1, 2, 3, 5, 6, 8]


def test_pagerank_star_and_cycle(spark):
    from dataingestionframework_spark.operators.graph import pagerank

    # 2-cycle: symmetric, every rank stays exactly 1.0 at any iteration
    cyc = spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"])
    got = {r.node: r.rank for r in pagerank(cyc, iterations=4).collect()}
    assert got == {1: 1.0, 2: 1.0}
    # star 1..4 -> 0: leaves settle at 1-d, the hub at (1-d)(1+4d)
    star = spark.createDataFrame([(i, 0) for i in range(1, 5)], ["src", "dst"])
    got = {r.node: r.rank for r in pagerank(star, iterations=3).collect()}
    assert abs(got[0] - 0.15 * (1 + 4 * 0.85)) < 1e-9
    assert all(abs(got[i] - 0.15) < 1e-9 for i in range(1, 5))
    # checkpoint=False yields identical values (pure lineage question)
    got2 = {
        r.node: r.rank
        for r in pagerank(star, iterations=3, checkpoint=False).collect()
    }
    assert got == got2
