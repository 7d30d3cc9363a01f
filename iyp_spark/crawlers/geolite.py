"""maxmind.geolite_country + ipinfo.ip_country — GeoPrefix → Country maps.

Reference: iyp/crawlers/maxmind/geolite_country.py:68-142 and
ipinfo/ip_country.py:27-60.

maxmind is the canonical J3 two-file equi join: the blocks CSVs carry
(network, geoname_id) and the locations CSV maps geoname_id → country
attributes; the reference pd.merge (:102-105) becomes a broadcast join of
the small locations dimension against the blocks scan. Reference filters
preserved declaratively: continent-only locations (null country_iso_code)
drop (:91), registered-country-only blocks (null geoname_id) drop (:100),
and the pandas ``keep_default_na=False`` quirk (Namibia's "NA" must stay a
country code, :85) holds because we null only empty CSV strings.

ipinfo reuses the range→CIDR machinery: each jsonl row carries
(start_ip, end_ip, country) and ``summarize_address_range`` (:43-48) is the
shared Arrow ``canon.summarize_range`` + one explode.

Both emit GeoPrefix COUNTRY Country links with the full source row as
props, and double-label GeoPrefix with Prefix (batch_add_node_label).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..canon import compress_prefix, summarize_range
from ..framework import SparkCrawler

LOC_SCHEMA = ("geoname_id long, locale_code string, continent_code string, "
              "continent_name string, country_iso_code string, "
              "country_name string, is_in_european_union int")
BLOCK_SCHEMA = "network string, geoname_id long"
# Spark CSV's default nullValue is the empty string — exactly the reference's
# keep_default_na=False + na_values=[''] (only '' is missing; 'NA' is Namibia)
_CSV_OPTS: dict = {}


class MaxmindGeoliteCountry(SparkCrawler):
    ORG = "MaxMind"
    URL = ("https://download.maxmind.com/geoip/databases/"
           "GeoLite2-Country-CSV/download?suffix=zip")
    NAME = "maxmind.geolite_country"
    EXPECTED_PREDS = ["COUNTRY"]

    def transform(self, docs: DataFrame):
        kind = self.text_span(0)
        line = self.text_span(1)
        locations = (
            docs.filter(kind == "location")
            .select(F.from_csv(line, LOC_SCHEMA, _CSV_OPTS).alias("r"))
            .select("r.*")
            # continent-only rows (Asia, Europe) are not modeled (:91)
            .filter(F.col("country_iso_code").isNotNull())
            .drop("locale_code")
        )
        blocks = (
            docs.filter(kind.startswith("block"))
            .select(F.from_csv(line, BLOCK_SCHEMA, _CSV_OPTS).alias("r"))
            .select("r.*")
            # registered-country-only rows: delegated stats covers them (:100)
            .filter(F.col("geoname_id").isNotNull())
            .withColumn("prefix", compress_prefix(F.col("network")))
            .filter(F.col("prefix").isNotNull())
        )
        merged = self.m(
            blocks.join(F.broadcast(locations), "geoname_id").withColumn(
                "link_props",
                F.map_filter(
                    F.create_map(
                        F.lit("continent_code"), F.col("continent_code"),
                        F.lit("continent_name"), F.col("continent_name"),
                        F.lit("country_iso_code"), F.col("country_iso_code"),
                        F.lit("country_name"), F.col("country_name"),
                        F.lit("is_in_european_union"),
                        F.col("is_in_european_union").cast("string"),
                    ),
                    lambda k, v: v.isNotNull(),
                ),
            )
        )
        nodes = [
            self.make_nodes(merged, "Country", "country_iso_code"),
            self.make_nodes(merged, "GeoPrefix", "prefix",
                            extra_labels=["Prefix"]),
        ]
        triples = [
            self.make_triples(merged, "COUNTRY", "GeoPrefix", "prefix",
                              "Country", "country_iso_code",
                              props_col=F.col("link_props")),
        ]
        return nodes, triples


class IpinfoIpCountry(SparkCrawler):
    ORG = "IPinfo"
    URL = "https://ipinfo.io/data/free/country.json.gz"
    NAME = "ipinfo.ip_country"
    EXPECTED_PREDS = ["COUNTRY"]

    def transform(self, docs: DataFrame):
        line = self.text_span(0)
        rows = (
            docs.select(
                F.from_json(
                    line,
                    "start_ip string, end_ip string, country string, "
                    "country_name string, continent string, continent_name string",
                ).alias("r")
            )
            .select("r.*")
            .filter(F.col("country").isNotNull())
            .withColumn("cidrs", summarize_range(F.col("start_ip"), F.col("end_ip")))
            .filter(F.col("cidrs").isNotNull())
        )
        mentions = self.m(
            rows.select(
                "country",
                F.explode("cidrs").alias("prefix"),
                F.map_filter(
                    F.create_map(
                        F.lit("start_ip"), F.col("start_ip"),
                        F.lit("end_ip"), F.col("end_ip"),
                        F.lit("country"), F.col("country"),
                        F.lit("country_name"), F.col("country_name"),
                        F.lit("continent"), F.col("continent"),
                        F.lit("continent_name"), F.col("continent_name"),
                    ),
                    lambda k, v: v.isNotNull(),
                ).alias("link_props"),
            )
        )
        nodes = [
            self.make_nodes(mentions, "Country", "country"),
            self.make_nodes(mentions, "GeoPrefix", "prefix",
                            extra_labels=["Prefix"]),
        ]
        triples = [
            self.make_triples(mentions, "COUNTRY", "GeoPrefix", "prefix",
                              "Country", "country",
                              props_col=F.col("link_props")),
        ]
        return nodes, triples
