"""apnic.eyeball — per-country eyeball-population AS rankings.

Reference: iyp/crawlers/apnic/eyeball.py:40-84 — per country: a
Ranking('APNIC eyeball estimates (CC)') node COUNTRY-linked to the country;
records sorted by percent desc get rank = index+1 (W1 window); every AS
gets RANK + POPULATION edges; NAME + COUNTRY only the first time an AS is
seen across countries (processed_asn, :70-76 — countries processed in
order, here min(cc) since fixture order is sorted).

Spark plan: row_number windows for both the rank assignment and the
global first-seen dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W

from ..framework import SparkCrawler

REC_SCHEMA = T.StructType([
    T.StructField("as", T.LongType()),
    T.StructField("autnum", T.StringType()),
    T.StructField("percent", T.DoubleType()),
])


class ApnicEyeball(SparkCrawler):
    ORG = "APNIC"
    URL = "https://stats.labs.apnic.net/cgi-bin/aspop"
    NAME = "apnic.eyeball"
    EXPECTED_PREDS = ["POPULATION", "COUNTRY", "RANK", "NAME"]

    def transform(self, docs: DataFrame):
        rec = (
            docs.select(
                self.text_span(0).alias("cc"),
                F.from_json(self.text_span(1), REC_SCHEMA).alias("r"),
            )
            .select(
                "cc",
                F.col("r.as").alias("asn"),
                F.col("r.autnum").alias("autnum"),
                F.col("r.percent").alias("percent"),
            )
            .filter(F.col("asn").isNotNull())
        )
        w_rank = W.partitionBy("cc").orderBy(F.desc("percent"), F.asc("asn"))
        w_first = W.partitionBy("asn").orderBy(F.asc("cc"))
        mentions = self.m(
            rec.withColumn("rank", F.row_number().over(w_rank))
            .withColumn("cc_rn", F.row_number().over(w_first))
            .withColumn(
                "ranking", F.concat(F.lit("APNIC eyeball estimates ("),
                                    F.col("cc"), F.lit(")"))
            )
            .withColumn(
                "link_props",
                F.create_map(
                    F.lit("as"), F.col("asn").cast("string"),
                    F.lit("autnum"), F.col("autnum"),
                    F.lit("percent"), F.col("percent").cast("string"),
                    F.lit("rank"), F.col("rank").cast("string"),
                ),
            )
        )
        first_seen = mentions.filter(F.col("cc_rn") == 1)
        rankings = mentions.select("ranking", "cc").distinct()
        nodes = [
            self.make_nodes(mentions, "AS", "asn"),
            self.make_nodes(mentions, "Name", "autnum"),
            self.make_nodes(mentions, "Country", "cc"),
            self.make_nodes(mentions, "Ranking", "ranking"),
        ]
        triples = [
            self.make_triples(rankings, "COUNTRY", "Ranking", "ranking",
                              "Country", "cc"),
            self.make_triples(first_seen, "NAME", "AS", "asn", "Name", "autnum"),
            self.make_triples(first_seen, "COUNTRY", "AS", "asn", "Country", "cc"),
            self.make_triples(mentions, "RANK", "AS", "asn", "Ranking", "ranking",
                              props_col=F.col("link_props")),
            self.make_triples(mentions, "POPULATION", "AS", "asn", "Country", "cc",
                              props_col=F.col("link_props")),
        ]
        return nodes, triples
