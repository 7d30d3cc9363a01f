"""worldbank.country_pop — population estimates for existing countries.

Reference: iyp/crawlers/worldbank/country_pop.py:25-63 — links ONLY
countries already in the graph (create=False, :37);
Country -POPULATION{value}-> Estimate('World Bank Population Estimate');
entries with null population skipped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..framework import SparkCrawler

REC_SCHEMA = T.StructType([
    T.StructField("country", T.StructType([T.StructField("id", T.StringType())])),
    T.StructField("value", T.LongType()),
])

ESTIMATE = "World Bank Population Estimate"


class WorldBankCountryPop(SparkCrawler):
    ORG = "World Bank"
    URL = "https://api.worldbank.org/v2/country/all/indicator/SP.POP.TOTL"
    NAME = "worldbank.country_pop"
    EXPECTED_PREDS = ["POPULATION"]
    NEEDS_EXISTING = True
    WAVE = 3  # reads AS/Country nodes created by wave-2 crawlers (peeringdb.ix)  # links only pre-existing Country nodes (:37)

    def transform(self, docs: DataFrame):
        rec = (
            docs.select(F.from_json(self.text_span(0), REC_SCHEMA).alias("r"))
            .select(F.col("r.country.id").alias("cc"), F.col("r.value").alias("pop"))
            .filter(F.col("cc").isNotNull() & F.col("pop").isNotNull())
            .dropDuplicates(["cc", "pop"])
        )
        existing = self.existing_keys("Country")
        mentions = self.m(
            rec.join(F.broadcast(existing), rec.cc == existing.key, "leftsemi")
            .withColumn("estimate", F.lit(ESTIMATE))
            .withColumn(
                "link_props",
                F.create_map(F.lit("value"), F.col("pop").cast("string")),
            )
        )
        nodes = [self.make_nodes(mentions, "Estimate", "estimate")]
        triples = [
            self.make_triples(mentions, "POPULATION", "Country", "cc",
                              "Estimate", "estimate", props_col=F.col("link_props"))
        ]
        return nodes, triples
