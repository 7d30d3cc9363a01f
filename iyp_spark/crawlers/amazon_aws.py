"""amazon.aws_ip_ranges — AWS published IP ranges with region → country.

Reference: iyp/crawlers/amazon/aws_ip_ranges.py:41-215. Two inputs:

- the scraped region table (region code, geography column) — here 'region'
  documents; country names resolve through the iso3166 name dimension with
  the reference's manual overrides (COUNTRY_NAME_OVERRIDES) applied first
  and ADDITIONAL_REGIONS appended when absent (:75-112);
- the ip-ranges.json prefix entries — 'v4' / 'v6' documents of
  (prefix, region, service).

Emits GeoPrefix -CATEGORIZED{region}-> Tag(service) for every entry and
GeoPrefix -COUNTRY{region}-> Country once per (prefix, country) pair
(:186-207); prefixes of unmapped regions keep their service link but get
no COUNTRY link. GeoPrefix double-labeled Prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..canon import compress_prefix
from ..data_iso3166 import COUNTRIES
from ..framework import SparkCrawler

# :52-63 — geography strings that don't match an ISO name
COUNTRY_NAME_OVERRIDES = {
    "United States": "US",
    "South Korea": "KR",
    "Taiwan": "TW",
    "UAE": "AE",
}

# :66-74 — regions missing from the documentation table
ADDITIONAL_REGIONS = {
    "cn-north-1": "CN",
    "cn-northwest-1": "CN",
    "eusc-de-east-1": "DE",
    "us-gov-east-1": "US",
    "us-gov-west-1": "US",
}


class AmazonAwsIpRanges(SparkCrawler):
    ORG = "Amazon"
    URL = "https://ip-ranges.amazonaws.com/ip-ranges.json"
    NAME = "amazon.aws_ip_ranges"
    EXPECTED_PREDS = ["CATEGORIZED", "COUNTRY"]

    def _name_dim(self) -> DataFrame:
        rows = [(name.upper(), a2) for a2, (_, name) in COUNTRIES.items()]
        rows += [(k.upper(), v) for k, v in COUNTRY_NAME_OVERRIDES.items()]
        return self.spark.createDataFrame(rows, "cname string, alpha2 string")

    def transform(self, docs: DataFrame):
        kind = self.text_span(0)
        payload = self.text_span(1)

        regions = (
            docs.filter(kind == "region")
            .select(F.from_json(payload, "region string, geography string")
                    .alias("r"))
            .select("r.*")
            .withColumn("cname", F.upper(F.trim("geography")))
            .join(F.broadcast(self._name_dim()), "cname")  # unmatched warn-skip
            .select("region", "alpha2")
        )
        extra = self.spark.createDataFrame(
            sorted(ADDITIONAL_REGIONS.items()), "region string, alpha2 string"
        )
        # documented rows win; ADDITIONAL_REGIONS fill the gaps (:105-110)
        region_map = regions.unionByName(
            extra.join(regions.select("region"), "region", "left_anti")
        )

        entries = self.m(
            docs.filter(kind.isin("v4", "v6"))
            .select(F.from_json(
                payload, "prefix string, region string, service string"
            ).alias("r"))
            .select("r.*")
            .withColumn("pfx", compress_prefix(F.col("prefix")))
            .filter(F.col("pfx").isNotNull())
            .join(F.broadcast(region_map), "region", "left")
            .withColumn(
                "link_props",
                F.create_map(F.lit("region"), F.col("region")),
            )
        )
        with_cc = entries.filter(F.col("alpha2").isNotNull()).dropDuplicates(
            ["pfx", "alpha2"]  # once per (prefix, country) pair (:186-207)
        )
        nodes = [
            self.make_nodes(entries, "GeoPrefix", "pfx",
                            extra_labels=["Prefix"]),
            self.make_nodes(entries, "Tag", "service"),
            self.make_nodes(with_cc, "Country", "alpha2"),
        ]
        triples = [
            self.make_triples(entries, "CATEGORIZED", "GeoPrefix", "pfx",
                              "Tag", "service",
                              props_col=F.col("link_props")),
            self.make_triples(with_cc, "COUNTRY", "GeoPrefix", "pfx",
                              "Country", "alpha2",
                              props_col=F.col("link_props")),
        ]
        return nodes, triples
