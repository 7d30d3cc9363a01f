"""Degree-ordered triangle enumeration and integer PageRank
(graph/metrics.py) on handcrafted graphs with known results."""

from __future__ import annotations

from pyspark.sql import functions as F

from iyp_spark.graph.metrics import oriented_edges, pagerank_integer, triangle_counts


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_triangle_counts_k4_plus_pendant(spark):
    # K4 on {1..4} (4 triangles, 3 per node) + node 5 closing {1,2,5}
    # + an isolated edge (10,11) that must not appear in the result.
    # Edges given with duplicates and reversed orientation to exercise
    # the undirected canonicalization.
    pairs = [
        (1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (3, 2), (2, 4), (3, 4),
        (5, 1), (2, 5), (5, 2),
        (10, 11),
        (7, 7),  # self-loop, dropped
    ]
    got = {
        r["node_id"]: r["n_triangles"]
        for r in triangle_counts(_edges(spark, pairs)).collect()
    }
    assert got == {1: 4, 2: 4, 3: 3, 4: 3, 5: 1}


def test_triangle_counts_triangle_free(spark):
    # A path and a star: zero triangles -> empty result.
    pairs = [(1, 2), (2, 3), (3, 4), (9, 5), (9, 6), (9, 7)]
    assert triangle_counts(_edges(spark, pairs)).count() == 0


def _pagerank_py(pairs, iterations=3, scale=1_000_000, damping_pct=85):
    # Straight-line mirror of the pagerank_integer spec: BIGINT fixed-point,
    # truncating integer division, dangling mass dropped.
    edges = sorted(set(pairs))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    base = (scale * (100 - damping_pct)) // 100
    rank = {n: scale for n in nodes}
    for _ in range(iterations):
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += rank[u] // outdeg[u]
        rank = {n: base + (damping_pct * s[n]) // 100 for n in nodes}
    return rank


def test_pagerank_integer_matches_python_mirror(spark):
    # Hub-authority shape with a dangling node (4 has no out-edges), a
    # duplicate edge that must collapse, and a 2-cycle.
    pairs = [(1, 2), (1, 3), (2, 3), (3, 1), (3, 4), (5, 4), (5, 4), (2, 1)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {r["node_id"]: r["pr_scaled"] for r in pagerank_integer(df).collect()}
    assert got == _pagerank_py(pairs)
    # node 5 has no in-edges -> pure teleport base, the minimum; the hub 3
    # (fed by both 1 and 2) outranks it and its own feeders.
    assert got[5] == min(got.values())
    assert got[3] > got[5] and got[4] > got[5]


def test_pagerank_integer_uniform_on_cycle(spark):
    # On a directed cycle every node keeps (nearly) the full mass: the
    # recurrence is exactly r' = base + 85*r//100, identical per node.
    pairs = [(1, 2), (2, 3), (3, 1)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    rows = pagerank_integer(df, iterations=5).collect()
    vals = {r["pr_scaled"] for r in rows}
    assert len(rows) == 3 and len(vals) == 1
    assert vals == {_pagerank_py(pairs, iterations=5)[1]}


def test_oriented_edges_degree_order_and_dedup(spark):
    # Star center 9 (degree 3) must be the ARROW TARGET of every leaf
    # (degree 1), regardless of id order; duplicates collapse.
    pairs = [(9, 1), (1, 9), (9, 2), (9, 50)]
    o = oriented_edges(_edges(spark, pairs))
    rows = {(r["x"], r["y"]) for r in o.collect()}
    assert rows == {(1, 9), (2, 9), (50, 9)}
    # total order: exactly one direction per undirected edge
    und = o.select(F.least("x", "y"), F.greatest("x", "y")).distinct()
    assert und.count() == o.count() == 3
