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

from ..ckpt import checkpoint_reset_stats

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
    ``require_converged=False`` to get best-effort labels explicitly.

    Algorithm (r6 optimization — same output, far fewer rounds): min-label
    propagation WITH GRAPH CONTRACTION between rounds, the classic
    contraction CC family. Each level runs ONE propagate+jump step
    (label(v) = min over v's closed neighborhood, then one pointer jump),
    then CONTRACTS the graph — every edge is rewritten to connect the two
    endpoints' labels, self-loops dropped, duplicates deduped — and the
    next level runs on the (much smaller) quotient graph. The level label
    tables compose back at the end (one left join per level, deepest
    first). Compared to r5's flat propagate+jump loop this replaces
    ~diameter/2 rounds with ~log(diameter) levels on random-id graphs
    (measured on the sf0.1 alias graph's diameter-39 giant component:
    19 rounds / ~135 Spark jobs / 5.7-6.4s warm -> 6 levels / ~71 jobs /
    3.5-4.5s warm, labels bit-identical), and at cluster scale every
    level's shuffle runs on a geometrically shrinking edge set instead of
    the full one. The worst case (ids monotone along a long chain —
    contraction merges only a constant number of nodes per level) degrades
    to the same O(diameter) the old loop had, never worse.

    Exactness: level-1 labels are member ids (min over a ball, then a
    member's member id); the global min m of a component labels itself m,
    so m survives as a quotient node at every level, the deepest level's
    min IS m, and the composed label of every member is m — the same
    (node_id, min member id) fixpoint as before. There is no convergence
    aggregate any more: the quotient running out of edges IS the fixpoint
    (each level with edges strictly merges labels), so the driver check
    per level is one isEmpty on an already-materialized checkpoint.
    Self-loop edges keep their node in the output labeled by itself
    (they enter level 1's node set and contract away immediately)."""
    e = checkpoint_reset_stats(
        edges.select(
            F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
        ).distinct()
    )
    level_labels: list[DataFrame] = []
    converged = False
    for _ in range(max_iter):
        if e.isEmpty():
            converged = True
            break
        # propagate: label = min over the closed neighborhood, assembled
        # from the (lo, hi) edge list without a symmetrized copy — the
        # four union legs feed one map-side-combinable min groupBy
        nodes = (
            e.select(F.col("lo").alias("node"), F.col("lo").alias("comp"))
            .unionByName(e.select(F.col("hi").alias("node"), F.col("hi").alias("comp")))
            .unionByName(e.select(F.col("lo").alias("node"), F.col("hi").alias("comp")))
            .unionByName(e.select(F.col("hi").alias("node"), F.col("lo").alias("comp")))
        )
        propagated = nodes.groupBy("node").agg(F.min("comp").alias("comp"))
        # one pointer jump (comp(v) <- comp(comp(v))): halves the levels
        # on chain-shaped graphs for one extra self-join (measured 10 -> 6
        # levels on the sf0.1 alias graph); more jumps per level buy
        # nothing (re-verified: 3 compositions left the count unchanged)
        parent = propagated.select(
            F.col("node").alias("comp"), F.col("comp").alias("jump")
        )
        lab = checkpoint_reset_stats(
            propagated.join(parent, "comp", "left")
            .select("node", F.coalesce("jump", "comp").alias("comp"))
        )
        level_labels.append(lab)
        # contract: rewrite every edge to its endpoints' labels; the
        # quotient keeps canonical (lo <= hi) orientation and dedupes.
        # Both checkpoints in this loop go through checkpoint_reset_stats:
        # Spark's size-only stats visitor multiplies child estimates
        # through joins and localCheckpoint carries origin stats, so a
        # loop joining two iteration-dependent tables per level compounds
        # the estimate's bit length geometrically (a 30-edge chain spent
        # 40+ min in driver-side BigInteger products inside
        # canBroadcastBySize before the reset; see iyp_spark/ckpt.py).
        la = lab.select(F.col("node").alias("lo"), F.col("comp").alias("ca"))
        lb = lab.select(F.col("node").alias("hi"), F.col("comp").alias("cb"))
        e = checkpoint_reset_stats(
            e.join(la, "lo")
            .join(lb, "hi")
            .select(
                F.least("ca", "cb").alias("lo"), F.greatest("ca", "cb").alias("hi")
            )
            .filter(F.col("lo") != F.col("hi"))
            .distinct()
        )
    else:
        converged = e.isEmpty()
    if not converged and require_converged:
        raise RuntimeError(
            f"connected_components did not reach a fixpoint within "
            f"{max_iter} rounds — a component's diameter exceeds the "
            f"iteration budget; raise max_iter (labels would be PARTIAL)"
        )
    if not level_labels:
        # no edges at all: empty labeling (callers treat absent nodes as
        # their own singleton components)
        return edges.sparkSession.createDataFrame(
            [], "node_id long, component_id long"
        )
    # compose the per-level quotient maps, deepest level first; nodes a
    # deeper level never saw (their component finished contracting
    # earlier) keep their current label via the coalesce
    final = level_labels[-1]
    for lab in reversed(level_labels[:-1]):
        up = final.select(F.col("node").alias("comp"), F.col("comp").alias("f"))
        final = lab.join(up, "comp", "left").select(
            "node", F.coalesce("f", "comp").alias("comp")
        )
    return final.select(
        F.col("node").alias("node_id"), F.col("comp").alias("component_id")
    )


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


def bfs_reach(edges: DataFrame, seeds: DataFrame, max_hops: int,
              dedup_edges: bool = True) -> DataFrame:
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

    ``dedup_edges=False`` skips the defensive edge distinct+materialize:
    min-hop BFS is insensitive to duplicate edges (the per-hop frontier
    dedups anyway), so when the caller knows edge multiplicity is ~1 the
    distinct is a full shuffle of the edge list for nothing (measured on
    the sf0.1 co-supply graph: 1.18M of 1.2M rows survive it — 2%
    dedup for the heaviest exchange in the query). Leave it on when the
    edge list has real multiplicity: the per-hop join fanout multiplies
    by it.
    """
    if dedup_edges:
        edges = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    else:
        edges = edges.select("src", "dst")
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
        # visited is a flat union of already-checkpointed frontiers —
        # re-checkpointing it per hop would rewrite the whole visited set
        # (one extra job per hop) to truncate an already-shallow plan
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def multi_source_bfs(edges: DataFrame, seeds: DataFrame,
                     max_hops: int, dedup_edges: bool = True) -> DataFrame:
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

    ``dedup_edges=False``: same contract as ``bfs_reach`` — min-hop is
    duplicate-insensitive (the per-hop (seed, node) distinct dedups), so
    callers whose edge multiplicity is ~1 skip a full edge-list shuffle.
    """
    if dedup_edges:
        edges = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    else:
        edges = edges.select("src", "dst")
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
        # same as bfs_reach: the union of checkpointed frontiers is a
        # shallow plan; skipping the per-hop re-checkpoint saves a job
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited
