"""Gallery query surface — the user-facing query shapes of the reference
(documentation/gallery.md), re-expressed over the triples fact table.

Every Cypher k-hop pattern becomes k self-joins of the triples table
filtered by pred (SURVEY §2.11); Catalyst supplies the whole query
lifecycle (parse → analyze → optimize → execute) that Neo4j supplied in
the reference. Partition pruning on pred/reference_name replaces the
reference's reference_name range index (iyp/__init__.py:201-227).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class GraphQueries:
    def __init__(self, store):
        self.store = store
        self.t = store.read_triples()

    def edges(self, pred: str | None = None) -> DataFrame:
        df = self.t
        if pred:
            df = df.filter(F.col("pred") == pred)
        return df

    # --- gallery.md:18-21: 1-hop typed pattern -------------------------
    def one_hop(self, pred: str, subj_label: str | None = None,
                subj_key: str | None = None) -> DataFrame:
        df = self.edges(pred)
        if subj_label:
            df = df.filter(F.col("subj_label") == subj_label)
        if subj_key is not None:
            df = df.filter(F.col("subj_key") == subj_key)
        return df.select("subj_label", "subj_key", "pred", "obj_label", "obj_key",
                         "reference_name", "props")

    # --- gallery.md:30-33: untyped neighborhood ------------------------
    def neighborhood(self, label: str, key: str) -> DataFrame:
        nid = F.xxhash64(F.lit(label), F.lit(key))
        out = self.t.filter(F.col("subj_id") == nid).select(
            F.col("pred"), F.lit("out").alias("direction"),
            F.col("obj_label").alias("peer_label"), F.col("obj_key").alias("peer_key"),
            "reference_name",
        )
        inc = self.t.filter(F.col("obj_id") == nid).select(
            F.col("pred"), F.lit("in").alias("direction"),
            F.col("subj_label").alias("peer_label"),
            F.col("subj_key").alias("peer_key"),
            "reference_name",
        )
        return out.unionByName(inc)

    # --- gallery.md:42-45: edge filter by data source ------------------
    def by_source(self, reference_name: str) -> DataFrame:
        return self.store.read_triples(reference_name)  # partition-pruned scan

    # --- gallery.md:54-95: k-hop typed path (k self-joins) -------------
    def path(self, preds: list[str], start_label: str | None = None) -> DataFrame:
        """Chain of predicates: returns one row per path with hop columns
        n0_label, n0_key, ..., nk_label, nk_key."""
        hop0 = self.edges(preds[0]).select(
            F.col("subj_label").alias("n0_label"), F.col("subj_key").alias("n0_key"),
            F.col("obj_id").alias("_join"),
            F.col("obj_label").alias("n1_label"), F.col("obj_key").alias("n1_key"),
        )
        if start_label:
            hop0 = hop0.filter(F.col("n0_label") == start_label)
        df = hop0
        for i, pred in enumerate(preds[1:], start=1):
            nxt = self.edges(pred).select(
                F.col("subj_id").alias("_join2"),
                F.col("obj_id").alias("_join_next"),
                F.col("obj_label").alias(f"n{i + 1}_label"),
                F.col("obj_key").alias(f"n{i + 1}_key"),
            )
            df = (
                df.join(nxt, df["_join"] == nxt["_join2"])
                .drop("_join", "_join2")
                .withColumnRenamed("_join_next", "_join")
            )
        return df.drop("_join")

    # --- gallery.md:104-112: mutual edges (a→b and b→a) ----------------
    def mutual(self, pred: str) -> DataFrame:
        a = self.edges(pred).select(
            F.col("subj_id").alias("x"), F.col("obj_id").alias("y"),
            "subj_label", "subj_key", "obj_label", "obj_key",
        )
        b = self.edges(pred).select(
            F.col("subj_id").alias("y2"), F.col("obj_id").alias("x2")
        )
        return a.join(b, (a.x == F.col("x2")) & (a.y == F.col("y2"))).filter(
            F.col("x") < F.col("y")  # one row per unordered pair
        ).select("subj_label", "subj_key", "obj_label", "obj_key")

    # --- gallery.md:136-140: aggregation over the graph ----------------
    def degree(self, pred: str, direction: str = "out") -> DataFrame:
        key = ("subj_label", "subj_key") if direction == "out" else ("obj_label", "obj_key")
        return (
            self.edges(pred)
            .groupBy(*key)
            .agg(
                F.count(F.lit(1)).alias("degree"),
                F.countDistinct("reference_name").alias("n_sources"),
            )
        )

    # --- gallery.md:121-130: variable-length path (bounded BFS) --------
    def bfs(self, preds: list[str], start_label: str, start_key: str,
            max_hops: int = 4, undirected: bool = True) -> DataFrame:
        """Bounded breadth-first reachability: (node, min_hops). Iterative
        DataFrame joins — one shuffle per hop, localCheckpoint to keep the
        plan linear (the Cypher allShortestPaths analog, bounded)."""
        edges = self.t.filter(F.col("pred").isin(preds)).select(
            F.col("subj_id").alias("src"), F.col("obj_id").alias("dst")
        )
        if undirected:
            edges = edges.unionByName(
                edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
        edges = edges.distinct().localCheckpoint(eager=True)
        start_id = F.xxhash64(F.lit(start_label), F.lit(start_key))
        frontier = (
            self.t.select(start_id.alias("node")).limit(1)
            .withColumn("hops", F.lit(0))
        ).localCheckpoint(eager=True)
        visited = frontier
        for hop in range(1, max_hops + 1):
            nxt = (
                frontier.join(edges, frontier.node == edges.src)
                .select(F.col("dst").alias("node"))
                .join(visited.select("node").withColumnRenamed("node", "v"),
                      F.col("node") == F.col("v"), "left_anti")
                .distinct()
                .withColumn("hops", F.lit(hop))
                .localCheckpoint(eager=True)
            )
            if nxt.limit(1).count() == 0:
                break
            visited = visited.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
        # resolve ids back to (label, key) via the node dictionary
        nodes = self.store.read_nodes().select("node_id", "label", "key")
        return visited.join(nodes, visited.node == nodes.node_id).select(
            "label", "key", "hops"
        )

    # --- gallery.md:115-130: allShortestPaths enumeration ---------------
    def all_shortest_paths(self, preds: list[str], start_label: str,
                           start_key: str, max_hops: int = 4,
                           undirected: bool = True,
                           node_ids: DataFrame | None = None) -> DataFrame:
        """Enumerate ALL shortest paths from a start node — the Cypher
        ``allShortestPaths((a)-[:PEERS_WITH*]-(d))`` of gallery.md:121-130,
        where ``bfs`` gives only the distance.

        Level-synchronous BFS carrying the node-id path: at hop h the
        admissible targets are exactly the nodes NOT seen at any earlier
        level, so every surviving (path, node) pair is a shortest path to
        that node; multiple same-length paths to one node all survive.
        ``node_ids`` (one ``id`` column) optionally restricts intermediate
        AND terminal nodes — the gallery's ``all(n IN nodes(p) WHERE n IN
        dependencies)`` becomes a semi-join on the edge endpoints.

        Returns (label, key, hops, path) with path an ordered array of
        (label, key) structs including both endpoints. Paths can be
        combinatorial; bound with max_hops and node_ids like the
        reference query does.
        """
        edges = self.t.filter(F.col("pred").isin(preds)).select(
            F.col("subj_id").alias("src"), F.col("obj_id").alias("dst")
        )
        if undirected:
            edges = edges.unionByName(
                edges.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst"))
            )
        if node_ids is not None:
            allowed = node_ids.select(F.col("id")).distinct()
            edges = (
                edges.join(allowed.withColumnRenamed("id", "src"), "src",
                           "left_semi")
                .join(allowed.withColumnRenamed("id", "dst"), "dst",
                      "left_semi")
            )
        edges = edges.distinct().localCheckpoint(eager=True)

        start_id = F.xxhash64(F.lit(start_label), F.lit(start_key))
        frontier = (
            self.t.select(start_id.alias("node")).limit(1)
            .withColumn("path", F.array(F.col("node")))
            .withColumn("hops", F.lit(0))
        ).localCheckpoint(eager=True)
        visited = frontier.select("node")
        acc = frontier
        for hop in range(1, max_hops + 1):
            expanded = (
                frontier.join(edges, frontier.node == edges.src)
                .select(F.col("dst").alias("node"),
                        F.concat("path", F.array(F.col("dst"))).alias("path"))
            )
            nxt = (
                expanded.join(
                    visited.withColumnRenamed("node", "v"),
                    F.col("node") == F.col("v"), "left_anti",
                )
                .withColumn("hops", F.lit(hop))
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            visited = (
                visited.unionByName(nxt.select("node").distinct())
                .distinct().localCheckpoint(eager=True)
            )
            acc = acc.unionByName(nxt)
            frontier = nxt
        # resolve node ids → (label, key), preserving path order
        nodes = self.store.read_nodes().select("node_id", "label", "key")
        pathed = (
            acc.withColumn("_pid", F.monotonically_increasing_id())
            .select("node", "hops", "_pid",
                    F.posexplode("path").alias("pos", "step"))
            .join(nodes, F.col("step") == nodes.node_id)
            .groupBy("node", "hops", "_pid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "label", "key"))
                ).alias("steps")
            )
            .withColumn(
                "path",
                F.transform("steps", lambda s: F.struct(
                    s["label"].alias("label"), s["key"].alias("key"))),
            )
        )
        end = nodes.withColumnRenamed("label", "end_label").withColumnRenamed(
            "key", "end_key")
        return (
            pathed.join(end, pathed.node == end.node_id)
            .select(F.col("end_label").alias("label"),
                    F.col("end_key").alias("key"), "hops", "path")
        )
