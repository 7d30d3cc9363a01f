"""SparkCrawler — the universal crawler dataflow as a Spark job.

Reference lifecycle (every crawler, e.g. iyp/crawlers/example/crawler.py:29-76
and create_db.py:158-186): fetch → parse rows → accumulate node sets + link
dicts → batch_get_nodes* (entity linking over Bolt) → rewrite endpoints to
ids → batch_add_links → unit_test. Here:

    documents scan (partition-pruned to this crawler)
      → parse() [native exprs / Arrow pandas UDF]         (subclass hook)
      → mentions DataFrame
      → nodes() / triples() [DataFrame programs]          (subclass hooks)
      → GraphStore.upsert_nodes + replace_triples         (idempotent)
      → unit_test: ≥1 triple per expected predicate       (iyp/__init__.py:760-776)

Entity linking is a pure column computation (node_id = xxhash64(label,key)),
so the reference's write-then-read id round-trip disappears entirely; only
"link-to-existing-only" crawlers (nro.delegated_stats, worldbank, inetintel
orgs) read the dictionary back — as a broadcast semi-join (S8).
"""

from __future__ import annotations

import datetime
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .canon import node_id
from .store import GraphStore, StageTimer

FIXED_FETCH_TIME = datetime.datetime(2026, 1, 1, 0, 0, 0)  # FIXTURES.md seed date


class RelationCountError(Exception):
    """A unit test found zero triples for an expected predicate
    (ref: create_db.py:166-169)."""


class SparkCrawler:
    """Subclasses set ORG/URL/NAME/EXPECTED_PREDS and implement transform()."""

    ORG: str = ""
    URL: str = ""
    NAME: str = ""
    EXPECTED_PREDS: list[str] = []

    def __init__(self, store: GraphStore):
        self.store = store
        self.spark = store.spark
        self.cache_mentions = False  # set by the batched runner

    def m(self, mentions: DataFrame) -> DataFrame:
        """Mark the parsed-mentions DataFrame: in batched mode it is
        persisted so the node- and triple-derivation subtrees share one
        parse pass instead of recomputing it."""
        return mentions.persist() if self.cache_mentions else mentions

    # ---------- reference stamping (iyp/__init__.py:701-708) ----------
    def reference_col(self, time_mod: F.Column | None = None) -> F.Column:
        """``time_mod`` lets a crawler stamp a PER-ROW modification time
        (alice_lg's per-routeserver cached_at, alice_lg/__init__.py:390-397);
        default is the corpus-wide fixed fetch stamp."""
        return F.struct(
            F.lit(self.NAME).alias("reference_name"),
            F.lit(self.ORG).alias("reference_org"),
            F.lit(self.URL).alias("reference_url_data"),
            F.lit(None).cast("string").alias("reference_url_info"),
            F.lit(FIXED_FETCH_TIME).alias("reference_time_fetch"),
            (
                time_mod.cast("timestamp")
                if time_mod is not None
                else F.lit(FIXED_FETCH_TIME)
            ).alias("reference_time_modification"),
        )

    # ---------- helpers for subclasses ----------
    def text_span(self, idx: int) -> F.Column:
        """The idx-th *text* span of a document (media spans interleave:
        FIXTURES.md §1), preserving order by offset."""
        return F.try_element_at(
            F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("text")),
            F.lit(idx + 1),
        )["text"]

    def make_nodes(
        self, df: DataFrame, label: str, key_col: str,
        extra_labels: list[str] | None = None, props_col: str | None = None,
    ) -> DataFrame:
        """Dictionary rows for one label from a mention column (K1)."""
        labels = [label] + (extra_labels or [])
        base = df.select(F.col(key_col).cast("string").alias("key"))
        if props_col is not None:
            base = df.select(
                F.col(key_col).cast("string").alias("key"),
                F.col(props_col).alias("props"),
            )
        else:
            base = base.withColumn("props", F.lit(None).cast("map<string,string>"))
        # NOTE: no dropDuplicates here — GraphStore.upsert_nodes groups by
        # (label, key) anyway; deduping twice would just add a shuffle.
        return (
            base.filter(F.col("key").isNotNull())
            .select(
                F.lit(label).alias("label"),
                "key",
                node_id(label, F.col("key")).alias("node_id"),
                F.array(*[F.lit(x) for x in labels]).alias("labels"),
                "props",
            )
        )

    def make_triples(
        self, df: DataFrame, pred: str | F.Column,
        subj_label: str, subj_key: str, obj_label: str, obj_key: str,
        props_col: F.Column | None = None,
        time_mod_col: F.Column | None = None,
    ) -> DataFrame:
        """Triple rows from a mention DataFrame (K5), endpoints id-linked
        via deterministic hashes (J1 without the shuffle). ``pred`` may be a
        Column for data-driven predicates (nro status edges,
        nro/delegated_stats.py:189-196)."""
        sk = F.col(subj_key).cast("string")
        ok = F.col(obj_key).cast("string")
        pred_col = F.lit(pred) if isinstance(pred, str) else pred
        return (
            df.filter(sk.isNotNull() & ok.isNotNull())
            .select(
                node_id(subj_label, sk).alias("subj_id"),
                pred_col.alias("pred"),
                node_id(obj_label, ok).alias("obj_id"),
                F.lit(subj_label).alias("subj_label"),
                sk.alias("subj_key"),
                F.lit(obj_label).alias("obj_label"),
                ok.alias("obj_key"),
                (
                    props_col
                    if props_col is not None
                    else F.lit(None).cast("map<string,string>")
                ).alias("props"),
                self.reference_col(time_mod=time_mod_col).alias("reference"),
            )
        )

    def melt_triples(
        self, df: DataFrame, subj_label: str, subj_key: str,
        specs: list[tuple[F.Column | None, str, str, str, F.Column | None]],
    ) -> DataFrame:
        """Multi-predicate emission in ONE pass over the mentions: build an
        array of candidate triple structs (null when the spec's condition
        fails) and explode it. A union of k make_triples branches evaluates
        the parse k times; this evaluates it once — the difference between
        k scans and 1 scan of the document table at scale.

        specs: (condition | None, pred, obj_label, obj_key_col, props | None).
        """
        null_props = F.lit(None).cast("map<string,string>")
        cands = []
        for cond, pred, obj_label, obj_key, props in specs:
            entry = F.struct(
                F.lit(pred).alias("pred"),
                F.lit(obj_label).alias("obj_label"),
                F.col(obj_key).cast("string").alias("obj_key"),
                (props if props is not None else null_props).alias("props"),
            )
            cands.append(entry if cond is None else F.when(cond, entry))
        sk = F.col(subj_key).cast("string")
        exploded = (
            df.filter(sk.isNotNull())
            .select(sk.alias("subj_key"), F.explode(F.array(*cands)).alias("t"))
            .filter(F.col("t").isNotNull() & F.col("t.obj_key").isNotNull())
        )
        return exploded.select(
            node_id(subj_label, F.col("subj_key")).alias("subj_id"),
            F.col("t.pred").alias("pred"),
            F.xxhash64(F.col("t.obj_label"), F.col("t.obj_key")).alias("obj_id"),
            F.lit(subj_label).alias("subj_label"),
            "subj_key",
            F.col("t.obj_label").alias("obj_label"),
            F.col("t.obj_key").alias("obj_key"),
            F.col("t.props").alias("props"),
            self.reference_col().alias("reference"),
        )

    def existing_keys(self, label: str) -> DataFrame:
        """S8: keys already in the dictionary, for link-to-existing-only
        crawlers. Small dimension → broadcast on the join side."""
        return self.store.read_nodes(label).select(F.col("key"))

    # ---------- subclass contract ----------
    def transform(self, docs: DataFrame) -> tuple[list[DataFrame], list[DataFrame]]:
        """docs → (node DataFrames, triple DataFrames)."""
        raise NotImplementedError

    # ---------- driver ----------
    def run(self, run_id: str | None = None) -> dict:
        run_id = run_id or uuid.uuid4().hex[:12]
        docs = self.store.read_documents(crawler=self.NAME)
        was_cached = self.cache_mentions
        self.cache_mentions = True  # share one parse across the subtrees below
        try:
            with StageTimer(self.store, self.NAME, "parse", run_id):
                node_dfs, triple_dfs = self.transform(docs)
                triples = triple_dfs[0]
                for extra in triple_dfs[1:]:
                    triples = triples.unionByName(extra)
                # only transforms that READ the graph (S8 seed scans,
                # NEEDS_EXISTING) must materialize their outputs BEFORE
                # writing — they would otherwise re-read node/triple
                # partitions our own upsert is about to replace. Everyone
                # else skips the eager checkpoint: it doubles I/O for no
                # safety benefit (the persisted mentions already share the
                # parse between the node and triple subtrees).
                if getattr(self, "NEEDS_EXISTING", False):
                    node_dfs = [nd.localCheckpoint(eager=True) for nd in node_dfs]
                    triples = triples.localCheckpoint(eager=True)
            with StageTimer(self.store, self.NAME, "link_nodes", run_id) as t:
                n_nodes = 0
                for nd in node_dfs:
                    n_nodes += self.store.upsert_nodes(nd)
                t.rows = n_nodes
            with StageTimer(self.store, self.NAME, "materialize", run_id) as t:
                n_triples = self.store.replace_triples(self.NAME, triples)
                t.rows = n_triples
        finally:
            self.cache_mentions = was_cached
        return {"crawler": self.NAME, "nodes": n_nodes, "triples": n_triples}

    def unit_test(self) -> None:
        """≥1 triple of each expected predicate under this reference_name
        (ref iyp/__init__.py:760-776; declared lists per crawler, e.g.
        caida/asrank.py:118-119)."""
        got = {
            r["pred"]
            for r in self.store.read_triples(self.NAME)
            .select("pred")
            .distinct()
            .collect()
        }
        missing = [p for p in self.EXPECTED_PREDS if p not in got]
        if missing:
            raise RelationCountError(f"{self.NAME}: no triples for {missing}")


# subtype labels applied when deriving the node dictionary from triple
# endpoints (nodes_from_triples mode): primary label → extra labels
SUBTYPE_LABELS = {
    "BGPPrefix": ["Prefix"],
    "RIRPrefix": ["Prefix"],
    "GeoPrefix": ["Prefix"],
    "PeeringLAN": ["Prefix"],
    "RPKIPrefix": ["Prefix"],
    "IANAPrefix": ["Prefix"],
    "RDNSPrefix": ["Prefix"],
}


def derive_nodes_from_triples(store: GraphStore, count_rows: bool = True) -> int:
    """Build the node dictionary from the endpoints of the materialized
    triples table: every node that participates in an edge, with subtype
    labels applied by rule. One columnar scan of the fact table — no second
    parse pass and no executor-memory caching (the scale path used by the
    throughput bench; exact per-crawler node props go through the
    sequential path)."""
    spark = store.spark
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    # the endpoint dedup is small relative to the fact table — fewer shuffle
    # partitions means fewer tiny tasks and output files for this one job
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    t = store.read_triples()
    subj = t.select(F.col("subj_label").alias("label"), F.col("subj_key").alias("key"))
    obj = t.select(F.col("obj_label").alias("label"), F.col("obj_key").alias("key"))
    extra = F.coalesce(
        *[
            F.when(F.col("label") == lab, F.array(*[F.lit(x) for x in xs]))
            for lab, xs in SUBTYPE_LABELS.items()
        ],
        F.array().cast("array<string>"),
    )
    nodes = (
        subj.unionByName(obj)
        .dropDuplicates(["label", "key"])
        .select(
            "label", "key",
            F.xxhash64("label", "key").alias("node_id"),
            F.concat(F.array(F.col("label")), extra).alias("labels"),
            F.lit(None).cast("map<string,string>").alias("props"),
        )
    )
    try:
        return store.upsert_nodes(nodes, count_rows=count_rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)


def run_pipeline_batched(store: GraphStore, crawlers: list[type[SparkCrawler]],
                         count_rows: bool = True,
                         nodes_from_triples: bool = False,
                         resume: bool = False,
                         fail_after: int | None = None) -> dict:
    """Throughput path: run every crawler's transform lazily, union all node
    and triple outputs, and materialize with ONE dictionary merge and ONE
    partitioned triples write — collapsing per-crawler job overhead into a
    single shuffle per table. This is the shape of the production weekly
    build.

    ``resume=True`` makes THIS path restartable too (north-rule
    resumability on the production path, not only the sequential loop):
    crawlers whose 'materialize' lineage record exists are dropped from the
    batch, so their already-written triple partitions are never recomputed
    or rewritten. Completion is recorded per crawler AS its partition write
    lands (the threaded wave-1 writes each log their own lineage row —
    lineage rows are one-file-per-call, so concurrent logging is safe);
    the node dictionary is re-derived/upserted idempotently on restart.
    ``fail_after`` injects a crash after N wave-1 partition writes for the
    kill/resume test."""
    # crawlers that read the node dictionary (S8 seed scans) must see the
    # previous waves' output on disk. WAVE declares the scheduling tier:
    # 1 = no graph reads; 2 = reads wave-1 output; 3 = reads output of
    # wave-2 crawlers too (nro links ASes that peeringdb.ix creates,
    # worldbank links Countries from the same).
    def _wave(c) -> int:
        return getattr(c, "WAVE", 2 if getattr(c, "NEEDS_EXISTING", False) else 1)

    done = store.completed_crawlers() if resume else set()
    skipped = [c.NAME for c in crawlers if c.NAME in done]
    crawlers = [c for c in crawlers if c.NAME not in done]
    wave1 = [c for c in crawlers if _wave(c) == 1]
    later_waves = [
        [c for c in crawlers if _wave(c) == w]
        for w in sorted({_wave(c) for c in crawlers} - {1})
    ]
    all_docs = store.read_documents()  # one listing, filtered per crawler
    all_nodes = None
    all_triples = None
    per_crawler_triples = {}
    names = []
    for cls in wave1:
        crawler = cls(store)
        # nodes_from_triples mode runs ONE parse pass (the triples write) and
        # reconstructs the dictionary from endpoints — no executor-memory
        # persist, no recompute; otherwise persist shares the parse between
        # the node and triple subtrees
        crawler.cache_mentions = not nodes_from_triples
        names.append(crawler.NAME)
        node_dfs, triple_dfs = crawler.transform(
            all_docs.filter(F.col("crawler") == crawler.NAME)
        )
        if not nodes_from_triples:
            for nd in node_dfs:
                all_nodes = nd if all_nodes is None else all_nodes.unionByName(nd)
        ct = None
        for td in triple_dfs:
            all_triples = td if all_triples is None else all_triples.unionByName(td)
            ct = td if ct is None else ct.unionByName(td)
        per_crawler_triples[crawler.NAME] = ct
    import time as _time

    run_id = uuid.uuid4().hex[:12]
    t0 = _time.time()
    if nodes_from_triples:
        # one write job per crawler partition, submitted from concurrent
        # driver threads: query planning/codegen (driver-serial otherwise)
        # overlaps executor compute, and each job only writes its own
        # reference_name partition (concurrent-safe: per-job staging dirs).
        # Each write logs ITS OWN completion record the moment it lands —
        # the resume anchor for a mid-wave crash.
        from concurrent.futures import ThreadPoolExecutor

        def _write_one(item):
            name, df = item
            n = store.replace_triples(name, df, count_rows=count_rows)
            store.log_lineage(name, "materialize", n if count_rows else -1,
                              _time.time() - t0, run_id=run_id)
            return n

        n_triples = 0
        if fail_after is not None:
            # deterministic kill/resume test mode: sequential writes, crash
            # after exactly `fail_after` completed partitions
            written = 0
            for item in per_crawler_triples.items():
                if written >= fail_after:
                    raise RuntimeError("injected failure for resume test")
                n_triples += _write_one(item)
                written += 1
        elif per_crawler_triples:
            with ThreadPoolExecutor(
                max_workers=min(4, len(per_crawler_triples))
            ) as ex:
                counts = list(ex.map(_write_one, per_crawler_triples.items()))
            n_triples = sum(counts) if count_rows else -1
        n_nodes = derive_nodes_from_triples(store, count_rows=count_rows)
    else:
        n_nodes = store.upsert_nodes(all_nodes, count_rows=count_rows) \
            if all_nodes is not None else 0
        n_triples = store.replace_triples_multi(
            all_triples, count_rows=count_rows) if all_triples is not None else 0
        for name in names:
            store.log_lineage(name, "materialize", n_triples,
                              _time.time() - t0, run_id=run_id)
    dt = _time.time() - t0
    store.spark.catalog.clearCache()  # drop persisted mention sets
    # ---- later waves: crawlers that read the already-built graph ----
    # Per wave: materialize every transform first (they read dictionary /
    # triple partitions the writes below will replace), then merge ALL the
    # wave's node outputs in ONE upsert — per-crawler upserts would each
    # re-read and rewrite the whole touched dictionary, O(crawlers ×
    # dictionary bytes) as the crawler count grows.
    for wave in later_waves:
        w_nodes = None
        w_triples: dict[str, DataFrame] = {}
        for cls in wave:
            crawler = cls(store)
            crawler.cache_mentions = True
            node_dfs, triple_dfs = crawler.transform(
                all_docs.filter(F.col("crawler") == crawler.NAME)
            )
            for nd in node_dfs:
                nd = nd.localCheckpoint(eager=True)
                w_nodes = nd if w_nodes is None else w_nodes.unionByName(nd)
            ct = triple_dfs[0]
            for td in triple_dfs[1:]:
                ct = ct.unionByName(td)
            w_triples[crawler.NAME] = ct.localCheckpoint(eager=True)
        if w_nodes is not None:
            n2 = store.upsert_nodes(w_nodes, count_rows=count_rows)
            if count_rows:
                n_nodes += n2
        for name, ct in w_triples.items():
            nt = store.replace_triples(name, ct, count_rows=count_rows)
            if count_rows:
                n_triples += nt
            store.log_lineage(name, "materialize", nt, 0.0, run_id=run_id)
        store.spark.catalog.clearCache()
    return {"nodes": n_nodes, "triples": n_triples, "seconds": dt}


def run_pipeline(
    store: GraphStore,
    crawlers: list[type[SparkCrawler]],
    resume: bool = False,
    fail_after: int | None = None,
) -> dict:
    """Entry point A (create_db.py:158-186): ordered crawler loop with
    per-crawler status capture; ``resume=True`` skips crawlers whose
    materialize stage already completed (S7 checkpoint semantics).
    ``fail_after`` injects a crash for the kill/resume test."""
    run_id = uuid.uuid4().hex[:12]
    done = store.completed_crawlers() if resume else set()
    status: dict[str, str] = {}
    ran = 0
    for cls in crawlers:
        crawler = cls(store)
        if crawler.NAME in done:
            status[crawler.NAME] = "skipped (checkpoint)"
            continue
        if fail_after is not None and ran >= fail_after:
            raise RuntimeError("injected failure for resume test")
        try:
            crawler.run(run_id=run_id)
            crawler.unit_test()
            status[crawler.NAME] = "ok"
        except RelationCountError as e:  # recorded, not fatal (create_db.py:171-179)
            status[crawler.NAME] = f"unit_test failed: {e}"
        ran += 1
    return status
