"""ripe.roa — RPKI route origin authorizations.

Reference: iyp/crawlers/ripe/roa.py:35-100 — CSV
``url,asn,prefix,max_length,start,end`` (header row skipped): prefix
compressed (malformed skipped), asn strips an 'AS' prefix;
AS -ROUTE_ORIGIN_AUTHORIZATION{uri, maxLength, notBefore, notAfter}->
RPKIPrefix (additionally labeled Prefix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..canon import canon_asn, compress_prefix
from ..framework import SparkCrawler


class RipeRoa(SparkCrawler):
    ORG = "RIPE NCC"
    URL = "https://ftp.ripe.net/rpki/"
    NAME = "ripe.roa"
    EXPECTED_PREDS = ["ROUTE_ORIGIN_AUTHORIZATION"]

    def transform(self, docs: DataFrame):
        p = F.split(self.text_span(0), ",")
        mentions = self.m(
            docs.select(p.alias("p"))
            .filter(F.size("p") == 6)
            .select(
                F.try_element_at("p", F.lit(1)).alias("uri"),
                canon_asn(F.try_element_at("p", F.lit(2))).alias("asn"),
                compress_prefix(F.try_element_at("p", F.lit(3))).alias("prefix"),
                F.try_element_at("p", F.lit(4)).alias("max_length"),
                F.try_element_at("p", F.lit(5)).alias("not_before"),
                F.try_element_at("p", F.lit(6)).alias("not_after"),
            )
            .filter((F.col("uri") != "URI")  # header row (:62-63)
                    & F.col("asn").isNotNull() & F.col("prefix").isNotNull())
            .withColumn(
                "vrp",
                F.map_filter(
                    F.create_map(
                        F.lit("uri"), F.col("uri"),
                        F.lit("maxLength"), F.col("max_length"),
                        F.lit("notBefore"), F.col("not_before"),
                        F.lit("notAfter"), F.col("not_after"),
                    ),
                    lambda k, v: v.isNotNull(),
                ),
            )
        )
        nodes = [
            self.make_nodes(mentions, "AS", "asn"),
            self.make_nodes(mentions, "RPKIPrefix", "prefix",
                            extra_labels=["Prefix"]),
        ]
        triples = [
            self.make_triples(mentions, "ROUTE_ORIGIN_AUTHORIZATION",
                              "AS", "asn", "RPKIPrefix", "prefix",
                              props_col=F.col("vrp"))
        ]
        return nodes, triples
