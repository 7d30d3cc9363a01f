"""ip2prefix — longest-prefix-match joins (the reference's hardest operator).

Reference: iyp/post/ip2prefix.py:25-108 builds one radix tree per prefix
label and, for every IP, links it to the most-specific covering prefix per
label (search_best); every prefix is additionally linked to its least-
enclosing covering prefix per label (same-label uses the /len-1 trick to
exclude the node itself); all prefixes get network/prefixlen props.

Spark rewrite (SURVEY §J4/J5): the radix tree becomes a **bucketed interval
join**:

- each prefix → integer [start, end] bounds + prefixlen + af (Arrow UDF);
- probes (IPs or child prefixes) and build side both get a coarse BUCKET
  (v4: the /8 octet, v6: the first hextet); prefixes shorter than the
  bucket width explode into the buckets they span — so the join is an
  EQUI-join on (af, bucket) with the range predicate as a residual filter,
  never a cartesian product (this is what keeps it sub-quadratic at 10^12
  scale; the bucket width is the knob);
- most-specific = row_number over (probe, tree-label) ordered by prefixlen
  desc → rank 1 (W1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..canon import ip_to_int, prefix_bounds
from ..framework import FIXED_FETCH_TIME
from ..store import GraphStore

NAME = "iyp.ip2prefix"
V4_BUCKET = 2 ** 24  # /8
V6_BUCKET = 2 ** 112  # first hextet


def _bucket_width(af_col):
    """Bucket divisor as a decimal literal (2^112 overflows a JVM long)."""
    return F.when(
        af_col == 4, F.lit(str(V4_BUCKET)).cast("decimal(38,0)")
    ).otherwise(F.lit(str(V6_BUCKET)).cast("decimal(38,0)"))


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
        b = nodes.select(
            "label", F.col("key").alias("prefix"), "node_id",
            prefix_bounds(F.col("key")).alias("b"),
        ).select(
            "label", "prefix", "node_id",
            F.col("b.start").alias("start"), F.col("b.end").alias("end"),
            F.col("b.prefixlen").alias("prefixlen"), F.col("b.af").alias("af"),
        ).filter(F.col("start").isNotNull())
        width = _bucket_width(F.col("af"))
        return b.withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    (F.col("start") / width).cast("long"),
                    (F.col("end") / width).cast("long"),
                )
            ),
        )

    def _probe_bucket(self, col_int, af_col):
        return (col_int / _bucket_width(af_col)).cast("long")

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
        ips = self.store.read_nodes("IP").select(
            F.col("key").alias("ip"), ip_to_int(F.col("key")).alias("ip_int")
        ).filter(F.col("ip_int").isNotNull()).withColumn(
            "ip_af", F.when(F.col("ip").contains(":"), 6).otherwise(4)
        ).withColumn("ip_bucket", self._probe_bucket(F.col("ip_int"), F.col("ip_af")))

        cand = ips.join(
            pfx,
            (ips.ip_af == pfx.af)
            & (ips.ip_bucket == pfx.bucket)
            & (ips.ip_int >= pfx.start)
            & (ips.ip_int <= pfx.end),
        )
        w = W.partitionBy("ip", "label").orderBy(F.desc("prefixlen"), F.asc("prefix"))
        ip_links = (
            cand.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select(
                F.xxhash64(F.lit("IP"), F.col("ip")).alias("subj_id"),
                F.lit("PART_OF").alias("pred"),
                F.col("node_id").alias("obj_id"),
                F.lit("IP").alias("subj_label"),
                F.col("ip").alias("subj_key"),
                F.col("label").alias("obj_label"),
                F.col("prefix").alias("obj_key"),
                F.lit(None).cast("map<string,string>").alias("props"),
                ref.alias("reference"),
            )
        )

        # ---- prefix → least-enclosing covering prefix per label (J5) ----
        child = pfx.select(
            F.col("label").alias("c_label"), F.col("prefix").alias("c_prefix"),
            F.col("node_id").alias("c_id"), F.col("start").alias("c_start"),
            F.col("end").alias("c_end"), F.col("prefixlen").alias("c_plen"),
            F.col("af").alias("c_af"), F.col("bucket").alias("c_bucket"),
        ).dropDuplicates(["c_label", "c_prefix", "c_bucket"]).filter(F.col("c_plen") > 0)
        parent = pfx.withColumnRenamed("bucket", "p_bucket")
        cand2 = child.join(
            parent,
            (child.c_af == parent.af)
            & (child.c_bucket == parent.p_bucket)
            & (parent.start <= child.c_start)
            & (parent.end >= child.c_end)
            & (
                # same label: strictly larger prefix (the /len-1 trick, :91-93);
                # cross label: may be the very same prefix (:94-96)
                F.when(child.c_label == parent.label,
                       parent.prefixlen < child.c_plen)
                .otherwise(
                    (parent.prefixlen < child.c_plen)
                    | ((parent.prefixlen == child.c_plen)
                       & (parent.prefix == child.c_prefix))
                )
            ),
        )
        w2 = W.partitionBy("c_label", "c_prefix", "label").orderBy(
            F.desc("prefixlen"), F.asc("prefix")
        )
        pfx_links = (
            cand2.withColumn("rn", F.row_number().over(w2))
            .filter("rn = 1")
            # a prefix's bucket-exploded copies would duplicate links
            .dropDuplicates(["c_label", "c_prefix", "label", "prefix"])
            .select(
                F.col("c_id").alias("subj_id"),
                F.lit("PART_OF").alias("pred"),
                F.col("node_id").alias("obj_id"),
                F.col("c_label").alias("subj_label"),
                F.col("c_prefix").alias("subj_key"),
                F.col("label").alias("obj_label"),
                F.col("prefix").alias("obj_key"),
                F.lit(None).cast("map<string,string>").alias("props"),
                ref.alias("reference"),
            )
        )

        n = self.store.replace_triples(self.NAME, ip_links.unionByName(pfx_links))
        self.store.log_lineage(self.NAME, "materialize", n, 0.0)
        return {"post": self.NAME, "triples": n}
