"""google.crux_top1m_country — Chrome UX Report per-country host rankings.

Reference: iyp/crawlers/google/crux_top1m_country.py:57-149. Per country
the latest monthly dump's rows are (origin, rank); the hostname is the
origin minus scheme and port (:95-97, a pandas str.partition chain → one
regexp_extract). Emits HostName -RANK{rank, origin, country_code}->
Ranking('CrUX top 1M (CC)') and Ranking -COUNTRY-> Country per country
with data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..framework import SparkCrawler

# scheme://host[:port] → host  (str.partition('://') + partition(':'))
_HOST_RE = r"^[^:]*://([^:/]+)"


class GoogleCruxCountry(SparkCrawler):
    ORG = "Google"
    URL = ("https://raw.githubusercontent.com/zakird/crux-top-lists/main/"
           "data/country")
    NAME = "google.crux_top1m_country"
    EXPECTED_PREDS = ["RANK", "COUNTRY"]

    def transform(self, docs: DataFrame):
        cc = self.text_span(0)
        line = self.text_span(1)
        rows = self.m(
            docs.select(
                cc.alias("cc"),
                F.from_csv(line, "origin string, rank long").alias("r"),
            )
            .select("cc", "r.*")
            .filter(F.col("origin").isNotNull())
            .withColumn("hostname", F.regexp_extract("origin", _HOST_RE, 1))
            .filter(F.col("hostname") != "")
            .withColumn("ranking",
                        F.concat(F.lit("CrUX top 1M ("), F.col("cc"),
                                 F.lit(")")))
            .withColumn(
                "link_props",
                F.create_map(
                    F.lit("rank"), F.col("rank").cast("string"),
                    F.lit("origin"), F.col("origin"),
                    F.lit("country_code"), F.col("cc"),
                ),
            )
        )
        per_country = rows.dropDuplicates(["cc"])
        nodes = [
            self.make_nodes(rows, "HostName", "hostname"),
            self.make_nodes(per_country, "Ranking", "ranking"),
            self.make_nodes(per_country, "Country", "cc"),
        ]
        triples = [
            self.make_triples(rows, "RANK", "HostName", "hostname",
                              "Ranking", "ranking",
                              props_col=F.col("link_props")),
            self.make_triples(per_country, "COUNTRY", "Ranking", "ranking",
                              "Country", "cc"),
        ]
        return nodes, triples
