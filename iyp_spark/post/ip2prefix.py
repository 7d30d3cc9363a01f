"""ip2prefix — longest-prefix-match joins (the reference's hardest operator).

Reference: iyp/post/ip2prefix.py:25-108 builds one radix tree per prefix
label and, for every IP, links it to the most-specific covering prefix per
label (search_best); every prefix is additionally linked to its least-
enclosing covering prefix per label (same-label uses the /len-1 trick to
exclude the node itself); all prefixes get network/prefixlen props.

Spark rewrite (SURVEY §J4/J5): the radix tree becomes the shared fine/coarse
bucketed interval join in iyp_spark/lpm.py —

- FINE prefixes (>= bucket width: /8 v4, /16 v6) occupy exactly one coarse
  bucket, so probe→prefix candidates come from an EQUI-join on (af, bucket)
  with the range containment as a residual filter (sub-quadratic at 10^12
  scale; the bucket width is the knob);
- COARSE prefixes (a provably tiny set) broadcast-range-join directly —
  no bucket explosion for short prefixes (::/0 would have emitted 2^16
  exploded rows under the old design);
- most-specific = row_number over (probe, tree-label) ordered by prefixlen
  desc → rank 1 (W1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..framework import FIXED_FETCH_TIME
from ..lpm import V4_BUCKET_BITS, V6_BUCKET_BITS, lpm_candidates, prefix_intervals, probe_hex
from ..store import GraphStore

NAME = "iyp.ip2prefix"


class Ip2Prefix:
    NAME = NAME
    EXPECTED_PREDS = ["PART_OF"]

    def __init__(self, store: GraphStore):
        self.store = store
        self.spark = store.spark

    def reference_col(self):
        return F.struct(
            F.lit(self.NAME).alias("reference_name"),
            F.lit("Internet Yellow Pages").alias("reference_org"),
            F.lit("https://iyp.iijlab.net").alias("reference_url_data"),
            F.lit(None).cast("string").alias("reference_url_info"),
            F.lit(FIXED_FETCH_TIME).alias("reference_time_fetch"),
            F.lit(FIXED_FETCH_TIME).alias("reference_time_modification"),
        )

    def _prefix_table(self) -> DataFrame:
        """All nodes labeled Prefix (any subtype), with bounds and buckets."""
        nodes = self.store.read_nodes().filter(
            F.array_contains("labels", "Prefix") & (F.col("label") != "Prefix")
        )
        return prefix_intervals(
            nodes.select("label", F.col("key").alias("prefix"), "node_id"),
            "prefix",
        )

    def run(self) -> dict:
        pfx = self._prefix_table().localCheckpoint(eager=True)

        # K7: network / prefixlen props on every prefix node (ref :44-52)
        self.store.enrich_nodes(
            pfx.dropDuplicates(["label", "prefix"]).select(
                "label",
                F.col("prefix").alias("key"),
                F.create_map(
                    F.lit("network"), F.substring_index("prefix", "/", 1),
                    F.lit("prefixlen"), F.substring_index("prefix", "/", -1),
                ).alias("props"),
            )
        )

        ref = self.reference_col()

        # ---- IP → most-specific prefix per label tree (J4) ----
        ips = probe_hex(
            self.store.read_nodes("IP").select(F.col("key").alias("ip")), "ip"
        )
        cand = lpm_candidates(ips, pfx)
        # most-specific selection as a min_by AGGREGATE, not a row_number
        # window: the key struct (-prefixlen, prefix) orders exactly like
        # the old (prefixlen DESC, prefix ASC) window and min_by is
        # map-side partial — one combinable exchange instead of a full
        # repartition + per-group sort over every candidate row
        best = F.min_by(
            F.struct("node_id", "prefix"),
            F.struct((-F.col("prefixlen")).alias("nl"), "prefix"),
        ).alias("best")
        ip_best = cand.groupBy("ip", "label").agg(best)
        ip_links = ip_best.select(
            F.xxhash64(F.lit("IP"), F.col("ip")).alias("subj_id"),
            F.lit("PART_OF").alias("pred"),
            F.col("best.node_id").alias("obj_id"),
            F.lit("IP").alias("subj_label"),
            F.col("ip").alias("subj_key"),
            F.col("label").alias("obj_label"),
            F.col("best.prefix").alias("obj_key"),
            F.lit(None).cast("map<string,string>").alias("props"),
            ref.alias("reference"),
        )

        # ---- prefix → least-enclosing covering prefix per label (J5) ----
        # A covering parent has prefixlen <= the child's, so: fine children
        # can only be covered by fine parents in the SAME bucket (equi-join)
        # or by coarse parents (broadcast); coarse children only by coarse
        # parents (the broadcast side again).
        child = pfx.select(
            F.col("label").alias("c_label"), F.col("prefix").alias("c_prefix"),
            F.col("node_id").alias("c_id"), F.col("start").alias("c_start"),
            F.col("end").alias("c_end"), F.col("prefixlen").alias("c_plen"),
            F.col("af").alias("c_af"), F.col("bucket").alias("c_bucket"),
            F.col("is_coarse").alias("c_coarse"),
        ).filter(F.col("c_plen") > 0)
        covers = (
            # same label: strictly larger prefix (the /len-1 trick, :91-93);
            # cross label: may be the very same prefix (:94-96)
            (F.col("start") <= F.col("c_start"))
            & (F.col("end") >= F.col("c_end"))
            & F.when(F.col("c_label") == F.col("label"),
                     F.col("prefixlen") < F.col("c_plen"))
            .otherwise(
                (F.col("prefixlen") < F.col("c_plen"))
                | ((F.col("prefixlen") == F.col("c_plen"))
                   & (F.col("prefix") == F.col("c_prefix")))
            )
        )
        fine_parent = pfx.filter(~F.col("is_coarse"))
        coarse_parent = pfx.filter(F.col("is_coarse")).drop("bucket", "is_coarse")
        cand2 = (
            child.filter(~F.col("c_coarse"))
            .join(fine_parent,
                  (F.col("c_af") == fine_parent.af)
                  & (F.col("c_bucket") == fine_parent.bucket) & covers)
            .drop("bucket", "is_coarse")
            .unionByName(
                child.join(F.broadcast(coarse_parent),
                           (F.col("c_af") == coarse_parent.af) & covers)
            )
        )
        # least-enclosing selection: same min_by-aggregate replacement of
        # the row_number window as the IP side above
        best2 = F.min_by(
            F.struct("node_id", "prefix"),
            F.struct((-F.col("prefixlen")).alias("nl"), "prefix"),
        ).alias("best")
        pfx_best = cand2.groupBy("c_label", "c_prefix", "c_id", "label").agg(best2)
        pfx_links = pfx_best.select(
            F.col("c_id").alias("subj_id"),
            F.lit("PART_OF").alias("pred"),
            F.col("best.node_id").alias("obj_id"),
            F.col("c_label").alias("subj_label"),
            F.col("c_prefix").alias("subj_key"),
            F.col("label").alias("obj_label"),
            F.col("best.prefix").alias("obj_key"),
            F.lit(None).cast("map<string,string>").alias("props"),
            ref.alias("reference"),
        )

        n = self.store.replace_triples(self.NAME, ip_links.unionByName(pfx_links))
        self.store.log_lineage(self.NAME, "materialize", n, 0.0)
        return {"post": self.NAME, "triples": n}
