"""Graph metrics — degree-ordered triangle enumeration, integer PageRank.

Reference parity (SURVEY §2.11): the reference answers neighborhood-shape
questions (sibling cliques from inetintel/as_org.py sibling edges, IXP
co-membership overlap from the MEMBER_OF edges of peeringdb/ix.py) with
read-time Cypher over Neo4j; a batch engine needs the same shapes as
explicit jobs. Triangle counting is the canonical one: it measures clique
density / clustering over co-occurrence graphs and is the building block
for community quality checks over the canonicalized KG.

Scale design: the classic degree-ordered orientation. Every undirected
edge is directed from its (degree, id)-smaller endpoint to the larger, so
each triangle {x ≺ y ≺ z} is enumerated exactly once as the wedge
x→y→z closed by x→z, and — the point of degree ordering — the wedge
join's fan-out per node is bounded by its ORIENTED out-degree, which
degree ordering caps at O(sqrt(m)) (arboricity bound): a celebrity node
with 10^7 neighbors contributes wedges only through the few neighbors
with even higher degree, not 10^14 pairs. Both joins are plain equi-joins
(shuffle on node id / edge key), no Python, no cartesian; at 100 TB the
edge list is hash-partitioned by join key and AQE handles residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def oriented_edges(edges: DataFrame) -> DataFrame:
    """Undirected (src, dst) pairs → deduplicated directed (x, y) with
    (degree, id)-ordering: deg(x) < deg(y), ties broken by id. Self-loops
    dropped. Degrees are computed on the deduplicated undirected edge set."""
    und = (
        edges.select(
            F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )
    deg = (
        und.select(F.col("lo").alias("node"))
        .unionByName(und.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    dl = deg.select(F.col("node").alias("lo"), F.col("deg").alias("deg_lo"))
    dh = deg.select(F.col("node").alias("hi"), F.col("deg").alias("deg_hi"))
    j = und.join(dl, "lo").join(dh, "hi")
    lo_first = (F.col("deg_lo") < F.col("deg_hi")) | (
        (F.col("deg_lo") == F.col("deg_hi")) & (F.col("lo") < F.col("hi"))
    )
    return j.select(
        F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("x"),
        F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("y"),
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Undirected (src, dst) edges → (node_id, n_triangles) for every node
    that participates in at least one triangle. Orientation-independent
    result: the triangle SET does not depend on the total order used to
    enumerate it, so an id-ordered SQL oracle verifies this degree-ordered
    plan exactly. Integer-exact (no float math)."""
    o = oriented_edges(edges).localCheckpoint(eager=False)
    e1 = o.select(F.col("x").alias("a"), F.col("y").alias("b"))
    e2 = o.select(F.col("x").alias("b"), F.col("y").alias("c"))
    wedges = e1.join(e2, "b")
    e3 = o.select(F.col("x").alias("a"), F.col("y").alias("c"))
    tri = wedges.join(e3, ["a", "c"]).select("a", "b", "c")
    corners = tri.select(F.explode(F.array("a", "b", "c")).alias("node_id"))
    return corners.groupBy("node_id").agg(F.count(F.lit(1)).alias("n_triangles"))


def pagerank_integer(
    edges: DataFrame,
    iterations: int = 3,
    scale: int = 1_000_000,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration PageRank over directed (src, dst) edges, computed
    entirely in BIGINT fixed-point so the result is bit-identical across
    engines (reference parity: CAIDA AS-Rank ingested by iyp/crawlers/
    caida/asrank.py is exactly this kind of link-analysis centrality over
    the AS graph; here we compute the centrality in-engine instead of
    ingesting a precomputed one).

    Spec (shared verbatim with the SQL oracle):
      r0(v)    = scale                                   for every node
      r_{k+1}(v) = base + (damping_pct * S_k(v)) div 100,
                   base = (scale * (100 - damping_pct)) div 100,
                   S_k(v) = sum over distinct edges u->v of
                            (r_k(u) div outdeg(u))
    Dangling mass is dropped (not redistributed) — deterministic and
    engine-portable; all divisions are integer div on non-negative values,
    so truncation == floor in both Spark and DuckDB.

    Scale design: outdeg is joined onto the edge list ONCE (one shuffle,
    then checkpointed); each iteration is one hash-join on src (ranks are
    a node-keyed table) + one map-side-combinable SUM groupBy on dst + one
    left join back to the node set. No Python, no floats, no cartesian.
    Rank magnitudes stay <= n * scale (fits BIGINT to ~9e12 nodes at the
    default scale); localCheckpoint per round keeps lineage linear.
    """
    # materialize the deduped edge list ONCE: nodes, outdeg and ew all
    # derive from it, and without the checkpoint each of their
    # materializations re-runs the caller's edge-building join (for
    # pagerank_cust_supp that is lineitem ⋈ orders + distinct, recomputed
    # up to 3x — the dominant cost of the query build phase)
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ew = e.join(outdeg, "src").localCheckpoint(eager=True)
    base = (scale * (100 - damping_pct)) // 100
    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    for _ in range(iterations):
        contrib = (
            ew.join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr("rank div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({damping_pct} * coalesce(s, 0L)) div 100"
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(F.col("node").alias("node_id"), F.col("rank").alias("pr_scaled"))


def weighted_sssp(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    edges_unique: bool = False,
) -> DataFrame:
    """Bounded-hop single-source shortest paths (Bellman-Ford rounds) over
    directed (src, dst, w) edges with non-negative BIGINT weights — the
    weighted companion of ``canonicalize.bfs_reach`` (SURVEY §2.11: the
    reference's Cypher cost-path gallery shapes, answered as a batch job).

    seeds: (node). Returns (node, dist long): the minimum total weight
    over any path from a seed using at most ``max_hops`` edges (0 at the
    seeds; unreachable nodes absent). After round k the table holds
    EXACTLY min-cost-over-<=k-hop-paths per node (the classic Bellman-Ford
    invariant, preserved because each round relaxes from the full
    best-so-far table), so a hop-bounded path-enumeration SQL oracle
    verifies it bit-for-bit — all arithmetic is BIGINT add/min, no floats.

    Scale shape: per round, one hash-join (dist ⋈ edges on node=src,
    both sides partitioned on the key), one map-side-combinable MIN
    groupBy, and a union+MIN with the previous table — no Python, no
    cartesian, frontier bounded by |V|. Dijkstra's priority queue is
    inherently sequential; hop-synchronous relaxation is the shape that
    runs on 1000 executors (delta-stepping reduces to this with one
    bucket at batch granularity). localCheckpoint per round keeps
    lineage linear; no driver-side row iteration at all.

    ``edges_unique=True`` skips the defensive per-(src, dst) MIN
    normalization when the caller already guarantees one row per directed
    edge (e.g. the edge list is itself a groupBy output): the normalize
    pass is a full shuffle of the edge list that deduplicates nothing
    (measured on the sf0.1 co-supply graph: 1.18M rows in, 1.18M out).
    Relaxation is min-based, so duplicate-free input makes it a pure
    no-op — the result is identical either way.
    """
    e = edges.select("src", "dst", F.col("w").cast("long").alias("w"))
    if not edges_unique:
        e = e.groupBy("src", "dst").agg(F.min("w").alias("w"))
    e = e.localCheckpoint(eager=True)
    dist = (
        seeds.select("node").distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_hops):
        relaxed = (
            dist.join(e, dist.node == e.src)
            .select(F.col("dst").alias("node"),
                    (F.col("dist") + F.col("w")).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist


def k_core(edges: DataFrame, k: int = 3, rounds: int = 8) -> DataFrame:
    """Bounded k-core peeling over undirected symmetric (src, dst) edges:
    ``rounds`` synchronous peel rounds, each dropping every node whose
    degree in the surviving subgraph is < k. Returns (node, deg) — all
    surviving nodes with their degree in the subgraph after the last
    round (== the true k-core whenever peeling converges within
    ``rounds``; the loop exits early at the fixpoint, so extra budget
    costs nothing on converged graphs).

    Bounded-round semantics are the point: "survivors after R synchronous
    peels" is a deterministic quantity BOTH engines can compute, so the
    DuckDB oracle is the same recurrence unrolled — no fixpoint oracle
    needed (the same discipline as pagerank_integer's fixed iterations
    and weighted_sssp's bounded hops).

    Scale: each round is one map-side-combinable degree count + one
    semi-join of the edge list against the survivor set on src and dst
    (both hash-partitioned on node id); localCheckpoint per round keeps
    lineage linear. Rounds needed = peeling depth (degeneracy ordering
    layers), typically small; raise ``rounds`` for adversarial chains —
    the early exit makes the budget free on real graphs."""
    from ..ckpt import checkpoint_reset_stats

    e = checkpoint_reset_stats(edges.select("src", "dst"))
    n_edges = e.count()
    for _ in range(rounds):
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        surv = deg.filter(F.col("deg") >= k).select(F.col("src").alias("node"))
        # checkpoint_reset_stats, not plain localCheckpoint: this loop
        # joins the edge list against a survivor set DERIVED FROM IT, so
        # the size-only estimator's multiply-through-joins compounds the
        # stats ~cubically per round through the checkpoint's origin
        # stats (same planner hazard as connected_components — see
        # iyp_spark/ckpt.py)
        e = checkpoint_reset_stats(
            e.join(surv.withColumnRenamed("node", "src"), "src")
            .join(surv.withColumnRenamed("node", "dst"), "dst")
            .select("src", "dst")
        )
        n_now = e.count()
        if n_now == n_edges:
            break
        n_edges = n_now
    return e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
