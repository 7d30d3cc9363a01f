"""tranco.top1m — DomainName RANK triples against the Tranco list.

Reference: iyp/crawlers/tranco/top1m.py:44-63 — every `rank,domain` row
becomes DomainName -RANK{rank}-> Ranking('Tranco top 1M'); all domains are
created (the singleton Ranking node via get_node, :35).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..framework import SparkCrawler

RANKING = "Tranco top 1M"


class TrancoTop1M(SparkCrawler):
    ORG = "imec-DistriNet"
    URL = "https://tranco-list.eu/top-1m.csv.zip"
    NAME = "tranco.top1m"
    EXPECTED_PREDS = ["RANK"]

    def transform(self, docs: DataFrame):
        line = self.text_span(0)
        mentions = self.m(
            docs.select(F.split(line, ",").alias("p"))
            .filter(F.size("p") == 2)
            .select(
                F.try_element_at("p", F.lit(1)).try_cast("int").alias("rank"),
                F.try_element_at("p", F.lit(2)).alias("domain"),
            )
            .filter(F.col("rank").isNotNull() & F.col("domain").isNotNull())
            .withColumn("ranking", F.lit(RANKING))
            .withColumn(
                "link_props",
                F.create_map(F.lit("rank"), F.col("rank").cast("string")),
            )
        )
        nodes = [
            self.make_nodes(mentions, "DomainName", "domain"),
            self.make_nodes(mentions, "Ranking", "ranking"),
        ]
        triples = [
            self.make_triples(mentions, "RANK", "DomainName", "domain",
                              "Ranking", "ranking", props_col=F.col("link_props"))
        ]
        return nodes, triples
