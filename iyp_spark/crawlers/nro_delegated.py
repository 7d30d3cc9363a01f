"""nro.delegated_stats — RIR delegation records with link-to-existing-only
ASN semantics, AS-range overlap joins, and CIDR decomposition.

Reference: iyp/crawlers/nro/delegated_stats.py:77-197.

- asn records link ONLY pre-existing AS nodes (:13-14, :104-113): value==1
  is a broadcast semi-join against the AS dictionary; value>1 is a range
  overlap join (J6: ``asns JOIN ranges ON start <= asn <= end`` — ranges
  are few, so they broadcast and the big AS side never shuffles);
- ipv4 records whose (start, count) is not CIDR-aligned are decomposed into
  covering prefixes (P11/E2: numpy-free vectorized pandas UDF wrapping
  ipaddress.summarize_address_range — provably equal to the reference's
  lowest-set-bit walk, :33-53 — then explode); aligned records and ipv6
  pass through as `start/len`;
- the record status becomes the predicate itself (ASSIGNED/ALLOCATED/
  AVAILABLE/RESERVED edges to OpaqueID) — a Column-valued pred;
- RIRPrefix nodes get the Prefix label (:180).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..canon import canon_cc, decompose_range_to_cidrs
from ..framework import SparkCrawler


class NroDelegatedStats(SparkCrawler):
    ORG = "NRO"
    URL = "https://ftp.ripe.net/pub/stats/ripencc/nro-stats/latest/nro-delegated-stats"
    NAME = "nro.delegated_stats"
    EXPECTED_PREDS = ["ASSIGNED", "AVAILABLE", "RESERVED", "COUNTRY"]
    NEEDS_EXISTING = True
    WAVE = 3  # reads AS/Country nodes created by wave-2 crawlers (peeringdb.ix)  # links only ASNs already in the graph

    def transform(self, docs: DataFrame):
        line = self.text_span(0)
        parts = F.split(line, r"\|")
        rec = (
            docs.select(line.alias("line"), parts.alias("p"))
            .filter(~F.trim("line").startswith("#") & (F.size("p") >= 8))
            .select(
                F.try_element_at("p", F.lit(1)).alias("registry"),
                canon_cc(F.try_element_at("p", F.lit(2))).alias("cc"),
                F.try_element_at("p", F.lit(3)).alias("type"),
                F.try_element_at("p", F.lit(4)).alias("start"),
                F.try_element_at("p", F.lit(5)).try_cast("long").alias("value"),
                F.upper(F.try_element_at("p", F.lit(7))).alias("status"),
                F.try_element_at("p", F.lit(8)).alias("opaque"),
            )
            .filter(F.col("value").isNotNull())
            .withColumn(
                "link_props", F.create_map(F.lit("registry"), F.col("registry"))
            )
        )
        rec = self.m(rec)

        # --- asn records: link only existing AS nodes (S8 + J6) ---
        existing = self.store.read_nodes("AS").select(
            F.col("key").try_cast("long").alias("asn")
        )
        asn_rec = rec.filter(F.col("type") == "asn").withColumn(
            "start_asn", F.col("start").try_cast("long")
        )
        singles = asn_rec.filter(F.col("value") == 1).join(
            existing, F.col("start_asn") == existing.asn, "inner"
        )
        ranges = asn_rec.filter(F.col("value") > 1)
        in_range = existing.join(
            F.broadcast(ranges),
            (existing.asn >= ranges.start_asn)
            & (existing.asn <= ranges.start_asn + ranges.value - 1),
        )
        linked_as = singles.select(
            "asn", "cc", "status", "opaque", "link_props"
        ).unionByName(in_range.select("asn", "cc", "status", "opaque", "link_props"))
        linked_as = self.m(linked_as)

        # --- ipv4/ipv6 records → RIRPrefix rows ---
        v4 = (
            rec.filter(F.col("type") == "ipv4")
            .withColumn("prefixes", decompose_range_to_cidrs("start", "value"))
            .withColumn("prefix", F.explode("prefixes"))
        )
        v6 = rec.filter(F.col("type") == "ipv6").withColumn(
            "prefix", F.concat_ws("/", F.col("start"), F.col("value"))
        )
        pfx = self.m(
            v4.select("prefix", "cc", "status", "opaque", "link_props").unionByName(
                v6.select("prefix", "cc", "status", "opaque", "link_props")
            )
        )

        cc_rows = linked_as.select("cc").unionByName(pfx.select("cc"))
        opq_rows = linked_as.select("opaque").unionByName(pfx.select("opaque"))
        nodes = [
            self.make_nodes(cc_rows, "Country", "cc"),
            self.make_nodes(opq_rows, "OpaqueID", "opaque"),
            self.make_nodes(pfx, "RIRPrefix", "prefix", extra_labels=["Prefix"]),
        ]
        triples = [
            self.make_triples(linked_as, "COUNTRY", "AS", "asn", "Country", "cc",
                              props_col=F.col("link_props")),
            self.make_triples(linked_as, F.col("status"), "AS", "asn",
                              "OpaqueID", "opaque", props_col=F.col("link_props")),
            self.make_triples(pfx, "COUNTRY", "RIRPrefix", "prefix",
                              "Country", "cc", props_col=F.col("link_props")),
            self.make_triples(pfx, F.col("status"), "RIRPrefix", "prefix",
                              "OpaqueID", "opaque", props_col=F.col("link_props")),
        ]
        return nodes, triples
