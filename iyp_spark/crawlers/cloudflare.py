"""Cloudflare Radar family: top100, ranking_bucket, dns_top_ases,
dns_top_locations.

Reference: iyp/crawlers/cloudflare/. The interesting half is the dns_top
pair (dns_top_ases.py / dns_top_locations.py + __init__.py:30-239): the
reference SEEDS its fetch from the graph — DomainNames holding a RANK edge
with rank ≤ 10000 (__init__.py:34-40, the W2 rank-threshold seed scan) —
then links each name's top resolver origins. Here the fetched pages are
document rows and the seed scan is a broadcast semi-join of the page names
against the graph-derived eligible set; pages for names that are not
eligible (no RANK edge, rank > threshold, or rank-less RANK edges like
ranking_bucket's) drop out exactly like names the reference never queried.

- cloudflare.top100 (top100.py:32-72): DomainName -RANK{rank}->
  Ranking('Cloudflare top 100 domains').
- cloudflare.ranking_bucket (ranking_bucket.py:36-119): per-dataset domain
  files → RANK links WITHOUT a rank property (bucket membership only) to
  Ranking('Cloudflare <title>').
- cloudflare.dns_top_ases: DomainName -QUERIED_FROM{clientASN, value}-> AS.
- cloudflare.dns_top_locations: DomainName -QUERIED_FROM{clientCountryAlpha2,
  value}-> Country.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..framework import SparkCrawler

RANK_THRESHOLD = 10000


class CloudflareTop100(SparkCrawler):
    ORG = "Cloudflare"
    URL = ("https://api.cloudflare.com/client/v4/radar/ranking/top?limit=100"
           "&name=top&location=&date=latest&format=json")
    NAME = "cloudflare.top100"
    EXPECTED_PREDS = ["RANK"]

    RANKING = "Cloudflare top 100 domains"

    def transform(self, docs: DataFrame):
        entry = F.from_json(self.text_span(0), "rank long, domain string")
        rows = self.m(
            docs.select(entry.alias("e"))
            .select("e.*")
            .filter(F.col("domain").isNotNull())
            .withColumn("ranking", F.lit(self.RANKING))
            .withColumn(
                "link_props",
                F.create_map(F.lit("rank"), F.col("rank").cast("string")),
            )
        )
        nodes = [
            self.make_nodes(rows, "DomainName", "domain"),
            self.make_nodes(rows, "Ranking", "ranking"),
        ]
        triples = [
            self.make_triples(rows, "RANK", "DomainName", "domain",
                              "Ranking", "ranking",
                              props_col=F.col("link_props")),
        ]
        return nodes, triples


class CloudflareRankingBucket(SparkCrawler):
    ORG = "Cloudflare"
    URL = "https://api.cloudflare.com/client/v4/radar/datasets?limit=10&datasetType=RANKING_BUCKET"  # noqa: E501
    NAME = "cloudflare.ranking_bucket"
    EXPECTED_PREDS = ["RANK"]

    def transform(self, docs: DataFrame):
        meta = F.from_json(self.text_span(0), "id long, title string, "
                                              "description string")
        rows = self.m(
            docs.select(meta.alias("m"), self.text_span(1).alias("body"))
            .select(
                F.concat(F.lit("Cloudflare "), F.col("m.title"))
                .alias("ranking"),
                F.explode(F.split("body", "\n")).alias("domain"),
            )
            .filter(F.trim("domain") != "")
        )
        nodes = [
            self.make_nodes(rows, "DomainName", "domain"),
            self.make_nodes(rows, "Ranking", "ranking"),
        ]
        triples = [
            # bucket membership: RANK with no rank prop (ranking_bucket.py:112-116)
            self.make_triples(rows, "RANK", "DomainName", "domain",
                              "Ranking", "ranking"),
        ]
        return nodes, triples


class _DnsTopCrawler(SparkCrawler):
    """Shared shape of dns_top_ases / dns_top_locations."""

    NEEDS_EXISTING = True
    WAVE = 3  # umbrella (wave 2) contributes ranked DomainNames
    EXPECTED_PREDS = ["QUERIED_FROM"]
    ENTRY_SCHEMA = ""

    def _eligible_names(self) -> DataFrame:
        """The seed scan (__init__.py:34-40): DomainNames with a RANK edge
        whose rank ≤ RANK_THRESHOLD. Rank-less RANK edges (NULL prop) fail
        the ≤ comparison in Cypher and here alike."""
        return (
            self.store.read_triples()
            .filter((F.col("pred") == "RANK")
                    & (F.col("subj_label") == "DomainName"))
            .select(F.col("subj_key").alias("name"),
                    F.col("props")["rank"].try_cast("long").alias("rank"))
            .filter(F.col("rank") <= RANK_THRESHOLD)
            .select("name")
            .distinct()
        )

    def links(self, rows: DataFrame):
        raise NotImplementedError

    def transform(self, docs: DataFrame):
        name = self.text_span(0)
        payload = self.text_span(1)
        pages = (
            docs.select(name.alias("name"),
                        F.from_json(payload, self.ENTRY_SCHEMA).alias("es"))
            # only names fetched for eligible (top-ranked) DomainNames
            .join(F.broadcast(self._eligible_names()), "name")
            .select("name", F.explode("es").alias("e"))
        )
        return self.links(self.m(pages))


class CloudflareDnsTopAses(_DnsTopCrawler):
    ORG = "Cloudflare"
    URL = "https://api.cloudflare.com/client/v4/radar/dns/top/ases/"
    NAME = "cloudflare.dns_top_ases"
    ENTRY_SCHEMA = "array<struct<clientASN:long,clientASName:string,value:string>>"

    def links(self, rows: DataFrame):
        rows = rows.filter(F.col("e.clientASN").isNotNull()).select(
            "name",
            F.col("e.clientASN").alias("asn"),
            F.map_filter(
                F.create_map(
                    F.lit("clientASN"), F.col("e.clientASN").cast("string"),
                    F.lit("clientASName"), F.col("e.clientASName"),
                    # entry['value'] = float(entry['value']) (dns_top_ases.py:42)
                    F.lit("value"), F.col("e.value").try_cast("double").cast("string"),
                ),
                lambda k, v: v.isNotNull(),
            ).alias("link_props"),
        )
        nodes = [self.make_nodes(rows, "AS", "asn")]
        triples = [
            self.make_triples(rows, "QUERIED_FROM", "DomainName", "name",
                              "AS", "asn", props_col=F.col("link_props")),
        ]
        return nodes, triples


class CloudflareDnsTopLocations(_DnsTopCrawler):
    ORG = "Cloudflare"
    URL = "https://api.cloudflare.com/client/v4/radar/dns/top/locations/"
    NAME = "cloudflare.dns_top_locations"
    ENTRY_SCHEMA = "array<struct<clientCountryAlpha2:string,clientCountryName:string,value:string>>"  # noqa: E501

    def links(self, rows: DataFrame):
        rows = rows.filter(F.col("e.clientCountryAlpha2").isNotNull()).select(
            "name",
            F.col("e.clientCountryAlpha2").alias("cc"),
            F.map_filter(
                F.create_map(
                    F.lit("clientCountryAlpha2"), F.col("e.clientCountryAlpha2"),
                    F.lit("clientCountryName"), F.col("e.clientCountryName"),
                    F.lit("value"), F.col("e.value").try_cast("double").cast("string"),
                ),
                lambda k, v: v.isNotNull(),
            ).alias("link_props"),
        )
        nodes = [self.make_nodes(rows, "Country", "cc")]
        triples = [
            self.make_triples(rows, "QUERIED_FROM", "DomainName", "name",
                              "Country", "cc", props_col=F.col("link_props")),
        ]
        return nodes, triples
