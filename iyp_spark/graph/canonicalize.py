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
        # aggregate per round instead of a new-vs-old join + count
        cur_sum = new_comp.agg(F.sum("comp")).collect()[0][0]
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
