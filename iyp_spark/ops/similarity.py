"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the exactness baseline; O(Q×N) — fine when Q is
  small or N fits a broadcast.
- IVF top-k: the scale path — assign vectors to their nearest of K fixed
  centroids (one shuffle keyed by centroid), then search only within the
  query's cell. At 10^9+ vectors K grows ~sqrt(N) and the per-cell search
  becomes a co-partitioned join instead of a cross product.

All arithmetic is double (elements cast before multiply), accumulation is
sequential left-to-right in both Spark (F.aggregate) and DuckDB
(list_dot_product) — bit-identical, hence oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import Window as W


def trunc6(col: F.Column) -> F.Column:
    """floor(x*1e6)/1e6 — cross-engine-stable truncation (see ops.text)."""
    return F.floor(col * F.lit(1000000.0)) / F.lit(1000000.0)


def _vec(col) -> F.Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def with_norm(emb: DataFrame) -> DataFrame:
    v = _vec(F.col("embedding"))
    return emb.select(
        "vec_id", v.alias("vec"), F.sqrt(_dot(v, v)).alias("nrm")
    )


def cosine_topk(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Brute-force cosine top-k for query vectors vec_id < n_queries."""
    n = with_norm(emb)
    q = n.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("vec").alias("qv"), F.col("nrm").alias("qn")
    )
    cos = F.col("dot") / (F.col("qn") * F.col("nrm"))
    w = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        q.join(n.withColumnRenamed("vec_id", "n_id"), F.col("n_id") != F.col("q_id"))
        .withColumn("dot", _dot(F.col("qv"), F.col("vec")))
        .withColumn("cos", cos)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "n_id", trunc6(F.col("cos")).alias("cos"), "rn")
    )


def _assign_cells(n: DataFrame, cents: DataFrame) -> DataFrame:
    """Assign every vector to its max-cosine centroid (broadcast cents)."""
    w_assign = W.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("c_id"))
    return (
        n.join(F.broadcast(cents))
        .withColumn("ccos", _dot(F.col("vec"), F.col("cv")) / (F.col("nrm") * F.col("cn")))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "vec", "nrm", F.col("c_id").alias("cell"))
    )


def lloyd_refined_centroids(
    emb: DataFrame, centroid_every: int = 50
) -> DataFrame:
    """One Lloyd (k-means) refinement of the modulo-sampled seed centroids:
    assign every vector to its nearest seed, then replace each centroid
    with the element-wise MEAN of its assigned vectors.

    Engine-portability: each component is floor-quantized to 1e-6 BEFORE
    the mean (integer sums are associative; float sums are not, and
    Spark's aggregation order differs from DuckDB's), so the refined
    centroids — and everything downstream — are bit-identical across
    engines.

    Scale path: assignment is a broadcast map-side join (no shuffle of the
    big side); the mean is one groupBy(cell, dim) after a posexplode —
    shuffle keyed by (cell, dim), uniform by construction. Further Lloyd
    iterations are the same two steps repeated."""
    n = with_norm(emb)
    seeds = n.filter(F.col("vec_id") % centroid_every == 0).select(
        F.col("vec_id").alias("c_id"), F.col("vec").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    assigned = _assign_cells(n, seeds)
    by_dim = assigned.select(
        "cell", F.posexplode(F.col("vec")).alias("i", "x")
    ).select("cell", "i", F.floor(F.col("x") * 1000000).cast("long").alias("xq"))
    dim_means = by_dim.groupBy("cell", "i").agg(
        (F.sum("xq") / F.count(F.lit(1)) / F.lit(1000000.0)).alias("m")
    )
    refined = (
        dim_means.groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "m"))),
                lambda s: s["m"],
            ).alias("cv")
        )
        .select(
            F.col("cell").alias("c_id"), "cv",
            F.sqrt(_dot(F.col("cv"), F.col("cv"))).alias("cn"),
        )
    )
    return refined


def ivf_topk(
    emb: DataFrame, centroid_every: int = 50, n_queries: int = 10, k: int = 3
) -> DataFrame:
    """IVF-style ANN: seed centroids (vec_id % centroid_every == 0) refined
    by one Lloyd iteration; every vector is assigned to its max-cosine
    centroid (its cell); queries search only their own cell. Returns
    (q_id, n_id, cell, cos)."""
    n = with_norm(emb)
    cents = lloyd_refined_centroids(emb, centroid_every)
    assigned = _assign_cells(n, cents)
    q = assigned.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("vec").alias("qv"),
        F.col("nrm").alias("qn"), "cell",
    )
    w_rank = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        q.join(
            assigned.select(
                F.col("vec_id").alias("n_id"), F.col("vec").alias("nv"),
                F.col("nrm").alias("nn"), F.col("cell").alias("ncell"),
            ),
            (F.col("cell") == F.col("ncell")) & (F.col("n_id") != F.col("q_id")),
        )
        .withColumn("cos", _dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")))
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= k)
        .select("q_id", "n_id", "cell", trunc6(F.col("cos")).alias("cos"))
    )
