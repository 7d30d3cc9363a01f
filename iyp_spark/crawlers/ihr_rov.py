"""ihr.rov — Route Origin Validation state per (prefix, AS).

Reference: iyp/crawlers/ihr/rov.py:55-137. One CSV row per (timebin,
prefix, asn); the reference emits

- ORIGINATE AS(originasn) → BGPPrefix and CATEGORIZED BGPPrefix →
  Tag('RPKI <status>') / Tag('IRR <status>') only for rows where
  asn_id == originasn_id (string-compared, :89),
- DEPENDS_ON BGPPrefix → AS(asn_id) for EVERY row (:118-125),

with the full record as link props. Malformed prefixes are warn-skipped
(:81-84). The three emissions share one parse via melt-free persisted
mentions; the Tag pair is a small explode, not two scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..canon import compress_prefix
from ..framework import SparkCrawler

ROV_SCHEMA = ("id long, timebin string, prefix string, hege double, af int, "
              "visibility double, rpki_status string, irr_status string, "
              "delegated_prefix_status string, delegated_asn_status string, "
              "descr string, moas string, asn_id string, country_id string, "
              "originasn_id string")


class IhrRov(SparkCrawler):
    ORG = "IHR"
    URL = "https://archive.ihr.live/ihr/rov/"
    NAME = "ihr.rov"
    EXPECTED_PREDS = ["ORIGINATE", "CATEGORIZED", "DEPENDS_ON"]

    def transform(self, docs: DataFrame):
        line = self.text_span(0)
        rows = self.m(
            docs.select(F.from_csv(line, ROV_SCHEMA).alias("r"))
            .select("r.*")
            .withColumn("pfx", compress_prefix(F.col("prefix")))
            .filter(F.col("pfx").isNotNull())  # warn-skip (:81-84)
            .withColumn(
                "link_props",
                F.map_filter(
                    F.create_map(
                        # the FULL CSV record, like the reference (:118-125)
                        F.lit("id"), F.col("id").cast("string"),
                        F.lit("timebin"), F.col("timebin"),
                        F.lit("prefix"), F.col("prefix"),
                        F.lit("hege"), F.col("hege").cast("string"),
                        F.lit("af"), F.col("af").cast("string"),
                        F.lit("visibility"),
                        F.col("visibility").cast("string"),
                        F.lit("rpki_status"), F.col("rpki_status"),
                        F.lit("irr_status"), F.col("irr_status"),
                        F.lit("delegated_prefix_status"),
                        F.col("delegated_prefix_status"),
                        F.lit("delegated_asn_status"),
                        F.col("delegated_asn_status"),
                        F.lit("descr"), F.col("descr"),
                        F.lit("moas"), F.col("moas"),
                        F.lit("asn_id"), F.col("asn_id"),
                        F.lit("country_id"), F.col("country_id"),
                        F.lit("originasn_id"), F.col("originasn_id"),
                    ),
                    lambda k, v: v.isNotNull(),
                ),
            )
        )
        # status/origin links only where asn == originasn (string compare, :89)
        own = self.m(
            rows.filter(F.col("asn_id") == F.col("originasn_id"))
            .withColumn("originasn", F.col("originasn_id").try_cast("long"))
            .filter(F.col("originasn").isNotNull())
        )
        tags = own.select(
            "pfx", "link_props",
            F.explode(F.array(
                F.concat(F.lit("RPKI "), F.col("rpki_status")),
                F.concat(F.lit("IRR "), F.col("irr_status")),
            )).alias("tag"),
        )
        deps = rows.withColumn("asn", F.col("asn_id").try_cast("long")).filter(
            F.col("asn").isNotNull()
        )
        nodes = [
            self.make_nodes(deps, "AS", "asn"),
            self.make_nodes(own, "AS", "originasn"),
            self.make_nodes(rows, "BGPPrefix", "pfx", extra_labels=["Prefix"]),
            self.make_nodes(tags, "Tag", "tag"),
        ]
        triples = [
            self.make_triples(own, "ORIGINATE", "AS", "originasn",
                              "BGPPrefix", "pfx",
                              props_col=F.col("link_props")),
            self.make_triples(tags, "CATEGORIZED", "BGPPrefix", "pfx",
                              "Tag", "tag", props_col=F.col("link_props")),
            self.make_triples(deps, "DEPENDS_ON", "BGPPrefix", "pfx",
                              "AS", "asn", props_col=F.col("link_props")),
        ]
        return nodes, triples
