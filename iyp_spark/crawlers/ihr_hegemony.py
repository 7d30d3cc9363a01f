"""ihr.local_hegemony — AS-dependency (hegemony) triples.

Reference: iyp/crawlers/ihr/__init__.py:49-81 (HegemonyCrawler) — CSV
`timebin,originasn,asn,hege`; only the FIRST timebin in the file is kept
(the loop breaks on timebin change, :60-63);
AS(originasn) -DEPENDS_ON{hege, af}-> AS(asn).

Spark plan: the "first timebin" becomes min(timebin) — a broadcast scalar
join (fixtures order timebins ascending, matching file order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..framework import SparkCrawler


class IhrHegemonyBase(SparkCrawler):
    ORG = "IHR"
    AF = 4
    EXPECTED_PREDS = ["DEPENDS_ON"]

    def transform(self, docs: DataFrame):
        line = self.text_span(0)
        parsed = (
            docs.select(F.split(line, ",").alias("p"))
            .filter(F.size("p") == 4)
            .select(
                F.try_element_at("p", F.lit(1)).alias("timebin"),
                F.try_element_at("p", F.lit(2)).try_cast("long").alias("originasn"),
                F.try_element_at("p", F.lit(3)).try_cast("long").alias("asn"),
                F.try_element_at("p", F.lit(4)).try_cast("double").alias("hege"),
            )
            .filter(F.col("originasn").isNotNull() & F.col("asn").isNotNull())
        )
        first_tb = parsed.agg(F.min("timebin").alias("tb0"))
        mentions = self.m(
            parsed.join(F.broadcast(first_tb), parsed.timebin == F.col("tb0"))
            .drop("tb0")
            .withColumn(
                "link_props",
                F.map_filter(
                    F.create_map(
                        F.lit("timebin"), F.col("timebin"),
                        F.lit("originasn"), F.col("originasn").cast("string"),
                        F.lit("asn"), F.col("asn").cast("string"),
                        F.lit("hege"), F.col("hege").cast("string"),
                        F.lit("af"), F.lit(self.AF).cast("string"),
                    ),
                    lambda k, v: v.isNotNull(),
                ),
            )
        )
        all_as = mentions.select(F.col("originasn").alias("a")).unionByName(
            mentions.select(F.col("asn").alias("a"))
        )
        nodes = [self.make_nodes(all_as, "AS", "a")]
        triples = [
            self.make_triples(mentions, "DEPENDS_ON", "AS", "originasn", "AS", "asn",
                              props_col=F.col("link_props"))
        ]
        return nodes, triples


class IhrHegemonyV4(IhrHegemonyBase):
    URL = "https://archive.ihr.live/ihr/hegemony/ipv4/local/%Y/%m/%d/ihr_hegemony_ipv4_local_%Y-%m-%d.csv.lz4"
    NAME = "ihr.local_hegemony_v4"
    AF = 4


class IhrHegemonyV6(IhrHegemonyBase):
    URL = "https://archive.ihr.live/ihr/hegemony/ipv6/local/%Y/%m/%d/ihr_hegemony_ipv6_local_%Y-%m-%d.csv.lz4"
    NAME = "ihr.local_hegemony_v6"
    AF = 6
