"""Canonicalization — connected components over alias/sibling edges.

Reference semantics (SURVEY §J10): SIBLING_OF / ALIAS_OF edges
(inetintel/as_org.py:97-109, openintel CNAME chains) define equivalence
groups; the canonical representative is the minimum node id of the
component. The reference never materializes this (Cypher path queries do it
at read time); here it is an explicit min-label-propagation job:

    comp(v) ← min(comp(v), min over neighbors comp(u))   until fixpoint

Each iteration is one hash-join + one aggregation + one pointer-jump join
(comp(v) <- comp(comp(v)), which advances the min two hops per round
instead of one — ~diameter/2 rounds; alias chains are short, so 2-4
rounds in practice). localCheckpoint after every round keeps the plan
linear — without it the lineage doubles per iteration and Catalyst
analysis time explodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ALIAS_PREDS = ["SIBLING_OF", "ALIAS_OF"]


def connected_components(edges: DataFrame, max_iter: int = 200,
                         require_converged: bool = True) -> DataFrame:
    """edges: (src long, dst long) undirected-izable pairs →
    (node_id long, component_id long) where component_id = min node id.

    Plain min-label propagation needs ~component-diameter rounds (NOT
    log n — the min label travels one hop per round), so ``max_iter``
    defaults to 200: alias/dup chains converge in 2-4 rounds and pay
    nothing extra, while a pathological long chain still finishes instead
    of silently mislabeling. If the loop exhausts without reaching the
    fixpoint the result is partial, which is a correctness bug for every
    caller (canonical ids would differ between runs of different depth) —
    so by default this RAISES rather than returning partial labels; pass
    ``require_converged=False`` to get best-effort labels explicitly."""
    sym = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    sym = sym.unionByName(
        sym.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().localCheckpoint(eager=True)

    comp = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    converged = False
    for _ in range(max_iter):
        # candidate component = min over self and neighbors' comps
        neighbor_comp = (
            sym.join(comp, sym.b == comp.node)
            .select(F.col("a").alias("node"), "comp")
        )
        propagated = (
            comp.unionByName(neighbor_comp)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        # pointer jumping (path compression): comp(v) <- comp(comp(v)).
        # Every label is itself a node id of the same component (min over
        # member labels / a member's label), so the lookup always hits, and
        # labels stay monotonically decreasing member ids. Neighbor-min
        # alone moves a component's min ONE hop per round (O(diameter));
        # the jump advances a second hop, halving the rounds (measured on
        # the sf0.1 alias graph's diameter-39 giant component: 39 -> 19
        # rounds, 14.5s -> 8.4s). Applying the jump more than once per
        # round buys nothing (the round's label chain collapses after one
        # composition — verified empirically); sub-linear rounds would
        # need large-star/small-star contraction, whose per-round cost is
        # ~2x this round's, washing out at these diameters.
        parent = propagated.select(
            F.col("node").alias("comp"), F.col("comp").alias("jump")
        )
        new_comp = (
            propagated.join(parent, "comp", "left")
            .select(
                "node",
                F.coalesce("jump", "comp").alias("comp"),
            )
            # lazy: the convergence aggregate below materializes the
            # checkpoint as a side effect — eager would burn one extra
            # job per round
            .localCheckpoint(eager=False)
        )
        # convergence: per-node labels only ever DECREASE under min-label
        # propagation, so an unchanged global sum is a fixpoint — one tiny
        # aggregate per round instead of a new-vs-old join + count. Summed
        # as DECIMAL(38,0): real node ids are full-range xxhash64 longs, so
        # a BIGINT sum overflows under ANSI mode (crashed on the 0.2-scale
        # verify graph); decimal is exact to ~1e19 rows of |id|<=2^63.
        cur_sum = new_comp.agg(
            F.sum(F.col("comp").cast("decimal(38,0)"))
        ).collect()[0][0]
        comp = new_comp
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged and require_converged:
        raise RuntimeError(
            f"connected_components did not reach a fixpoint within "
            f"{max_iter} rounds — a component's diameter exceeds the "
            f"iteration budget; raise max_iter (labels would be PARTIAL)"
        )
    return comp.select(F.col("node").alias("node_id"), F.col("comp").alias("component_id"))


def incremental_components(labels: DataFrame, new_edges: DataFrame,
                           max_iter: int = 200) -> DataFrame:
    """Merge a NEW batch of alias edges into an EXISTING min-label
    component labeling without recomputing components over the full graph
    — the weekly-build path: IYP rebuilds its whole Neo4j DB per run
    (create_db.py crawler loop), but at 10^12 nodes a rebuild for 0.1%
    new alias edges is the difference between minutes and a full pass.

    labels: (node_id, component_id) from a prior ``connected_components``
    run (component_id = min member id — the invariant this relies on).
    new_edges: (src, dst) alias pairs, may touch labeled or brand-new
    nodes. Returns the same (node_id, component_id) shape, EXACTLY equal
    to full recomputation over (old edges ∪ new edges):

    - every new-edge endpoint resolves to its current representative
      (its own id if unlabeled);
    - CC runs on the QUOTIENT graph — edges between representatives —
      whose size is bounded by 2·|new_edges|, independent of corpus size;
    - because old labels are min member ids and fresh nodes carry their
      own id, the quotient min IS the global min of each merged
      component, so composing the quotient map over the old labels
      reproduces full-recompute labels bit-for-bit.

    Scale shape: two hash-joins to build the quotient edges (lookups on
    the new-edge endpoints only), CC over a tiny edge set, then ONE join
    of the big labels table against the quotient remap — broadcastable,
    since the remap is bounded by the touched-representative count."""
    pts = (
        new_edges.select(F.col("src").alias("node_id"))
        .unionByName(new_edges.select(F.col("dst").alias("node_id")))
        .distinct()
    )
    fresh = (
        pts.join(labels, "node_id", "left_anti")
        .select("node_id", F.col("node_id").alias("component_id"))
    )
    all_labels = labels.unionByName(fresh).localCheckpoint(eager=True)

    lut = all_labels.select(
        F.col("node_id").alias("n"), F.col("component_id").alias("c")
    )
    qedges = (
        new_edges
        .join(lut.withColumnRenamed("n", "src"), "src")
        .withColumnRenamed("c", "qsrc")
        .join(lut.withColumnRenamed("n", "dst"), "dst")
        .withColumnRenamed("c", "qdst")
        .filter(F.col("qsrc") != F.col("qdst"))
        .select(F.col("qsrc").alias("src"), F.col("qdst").alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if qedges.isEmpty():
        return all_labels
    remap = connected_components(qedges, max_iter=max_iter).select(
        F.col("node_id").alias("component_id"),
        F.col("component_id").alias("merged_id"),
    )
    return (
        all_labels.join(remap, "component_id", "left")
        .select(
            "node_id",
            F.coalesce("merged_id", "component_id").alias("component_id"),
        )
    )


def canonical_id_mapping(store) -> DataFrame:
    """Canonical-id map over the graph's alias edges: every node in a
    SIBLING_OF/ALIAS_OF component maps to the component's min node_id.
    Nodes without alias edges map to themselves implicitly (absent here)."""
    alias_edges = (
        store.read_triples()
        .filter(F.col("pred").isin(ALIAS_PREDS))
        .select(F.col("subj_id").alias("src"), F.col("obj_id").alias("dst"))
    )
    return connected_components(alias_edges)


def resolve_cname_chains(resolves: DataFrame, aliases: DataFrame,
                         max_depth: int = 10) -> DataFrame:
    """Transitive CNAME resolution (J10, openintel/__init__.py:475-482
    recurse_cnames): host -ALIAS_OF-> host chains are followed until an
    address-bearing host is reached; emits (host, ip, depth) rows with the
    transitive closure. Iterative join to fixpoint with a loop guard
    (max_depth bounds cycles, like the reference's seen-set).

    resolves: (host string, ip string); aliases: (src string, dst string).
    """
    out = resolves.select("host", "ip").withColumn("depth", F.lit(0))
    frontier = out
    for depth in range(1, max_depth + 1):
        nxt = (
            aliases.join(frontier, aliases.dst == frontier.host)
            .select(aliases.src.alias("host"), "ip")
            .withColumn("depth", F.lit(depth))
        )
        # drop pairs already known (cycle guard)
        nxt = nxt.join(
            out.select("host", "ip").withColumnRenamed("host", "h2")
            .withColumnRenamed("ip", "i2"),
            (F.col("host") == F.col("h2")) & (F.col("ip") == F.col("i2")),
            "left_anti",
        ).localCheckpoint(eager=True)
        if nxt.limit(1).count() == 0:
            break
        out = out.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return out


def bfs_reach(edges: DataFrame, seeds: DataFrame, max_hops: int) -> DataFrame:
    """Bounded-hop BFS: minimum hop count from any seed (SURVEY §J10 /
    §2.11, the DataFrame analog of the reference's Cypher variable-length
    path ``-[*1..k]->`` — gallery.md shortest-reach patterns).

    edges: (src string, dst string), directed — pass both directions for an
    undirected graph. seeds: (node string). Returns (node, hop) where hop is
    the minimum number of edges from any seed, 0 for the seeds themselves,
    capped at max_hops.

    Scale shape: one hash-join + anti-join per hop, frontier and visited set
    both partitioned by node; localCheckpoint per hop keeps lineage linear
    (same discipline as connected_components above). No driver-side row
    iteration — the only per-hop driver work is an isEmpty() on the already
    materialized frontier.
    """
    edges = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    visited = (
        seeds.select("node").distinct()
        .withColumn("hop", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(h).cast("long"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def multi_source_bfs(edges: DataFrame, seeds: DataFrame,
                     max_hops: int) -> DataFrame:
    """Per-seed bounded-hop BFS: minimum hop count from EACH seed
    separately — the landmark-distance primitive. At 10^12-node scale
    exact all-pairs distances are impossible; the standard sketch
    (Das Sarma et al., landmark/bfs embedding) runs one multi-source BFS
    from a small landmark set and answers distance queries by triangle
    inequality over the per-landmark vectors. The reference answers these
    shapes at read time with Cypher ``shortestPath`` per query pair
    (SURVEY §2.11, gallery.md); a batch engine precomputes the landmark
    vectors once instead.

    edges: (src string, dst string) directed — pass both directions for
    undirected. seeds: (seed string) — each seed starts its own BFS at its
    own node. Returns (seed, node, hop): min hops from that seed, 0 at the
    seed itself, capped at max_hops.

    Scale shape: identical to ``bfs_reach`` but every frontier/visited row
    carries its seed id, so the per-hop hash-join fans out |landmarks|×
    and the anti-join key is (seed, node) — both hash-partitioned; with
    L landmarks the state is at most L×|V|, which is the sketch's whole
    point (L is small). localCheckpoint per hop keeps lineage linear; the
    only driver work per hop is an isEmpty() on a materialized frontier.
    """
    edges = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    visited = (
        seeds.select("seed").distinct()
        .select("seed", F.col("seed").alias("node"))
        .withColumn("hop", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select("seed", F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("seed", "node"), ["seed", "node"], "left_anti")
            .withColumn("hop", F.lit(h).cast("long"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited
