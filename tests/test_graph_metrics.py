"""Degree-ordered triangle enumeration (graph/metrics.py) on handcrafted
graphs with known triangle counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from iyp_spark.graph.metrics import oriented_edges, triangle_counts


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
