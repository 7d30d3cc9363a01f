"""bgptools.tags — AS CATEGORIZED triples from bgp.tools tag files.

Reference: iyp/crawlers/bgptools/tags.py:57-94 — per tag file, rows
`ASxxxx,<name>`; asn = int after stripping 'AS'; AS -CATEGORIZED-> Tag
(tag display label). Fixture documents carry the tag label as span 0 and
the CSV row as span 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..canon import canon_asn
from ..framework import SparkCrawler


class BgpToolsTags(SparkCrawler):
    ORG = "BGP.Tools"
    URL = "https://bgp.tools/tags/"
    NAME = "bgptools.tags"
    EXPECTED_PREDS = ["CATEGORIZED"]

    def transform(self, docs: DataFrame):
        mentions = self.m(
            docs.select(
                self.text_span(0).alias("tag"),
                F.split(self.text_span(1), ",").alias("p"),
            )
            .filter(F.size("p") >= 2)
            .select(
                "tag",
                canon_asn(F.try_element_at("p", F.lit(1))).alias("asn"),
            )
            .filter(F.col("asn").isNotNull() & (F.col("tag") != ""))
        )
        nodes = [
            self.make_nodes(mentions, "AS", "asn"),
            self.make_nodes(mentions, "Tag", "tag"),
        ]
        triples = [
            self.make_triples(mentions, "CATEGORIZED", "AS", "asn", "Tag", "tag")
        ]
        return nodes, triples
