"""cisco.umbrella_top1m — RANK triples with domain/host disambiguation.

Reference: iyp/crawlers/cisco/umbrella_top1m.py:59-122. Umbrella mixes
registered domains and hostnames; preference order (P10 conditional
typing): (1) name already a DomainName node, (2) already a HostName node,
(3) classify: name equals its registered domain → DomainName, else
HostName. Invalid lines (`rank,domain` unpacking fails) are skipped.

Spark plan: two broadcast left-semi-style joins against the node
dictionary (S8 seed scan), then PSL registered-domain classification
(psl.with_registered_domain — broadcast suffix-rule joins matching the
reference's tldextract, :99-104). Depends on crawlers that create
DomainName nodes having run first (the reference has the same config-order
dependency, config.json.example:56-135) — declared via NEEDS_EXISTING so
the batched runner schedules it in the second wave.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..framework import SparkCrawler
from ..psl import with_registered_domain

RANKING = "Cisco Umbrella Top 1 million"


class CiscoUmbrella(SparkCrawler):
    ORG = "Cisco"
    URL = "https://s3-us-west-1.amazonaws.com/umbrella-static/top-1m.csv.zip"
    NAME = "cisco.umbrella_top1m"
    EXPECTED_PREDS = ["RANK"]
    NEEDS_EXISTING = True

    def transform(self, docs: DataFrame):
        line = self.text_span(0)
        parsed = (
            docs.select(F.split(line, ",").alias("p"))
            .filter(F.size("p") == 2)  # ValueError rows skipped (ref :66-69)
            .select(
                F.try_element_at("p", F.lit(1)).try_cast("int").alias("rank"),
                F.try_element_at("p", F.lit(2)).alias("name"),
            )
            .filter(F.col("rank").isNotNull() & (F.col("name") != ""))
        )
        dom = self.existing_keys("DomainName").withColumn("is_dom", F.lit(True))
        host = self.existing_keys("HostName").withColumn("is_host", F.lit(True))
        mentions = self.m(
            with_registered_domain(
                parsed.join(F.broadcast(dom), parsed.name == dom.key, "left")
                .drop("key")
                .join(F.broadcast(host), parsed.name == host.key, "left")
                .drop("key"),
                "name",
            )
            .withColumn(
                "label",
                F.when(F.col("is_dom"), F.lit("DomainName"))
                .when(F.col("is_host"), F.lit("HostName"))
                # PSL classification (ref tldextract, :100-105): the name IS
                # its registered domain → DomainName (example.co.uk included;
                # a bare public suffix or unknown TLD → HostName)
                .when(F.col("name") == F.col("registered_domain"),
                      F.lit("DomainName"))
                .otherwise(F.lit("HostName")),
            )
            .drop("registered_domain", "public_suffix")
            .withColumn("ranking", F.lit(RANKING))
            .withColumn(
                "link_props",
                F.create_map(F.lit("rank"), F.col("rank").cast("string")),
            )
        )
        doms = mentions.filter(F.col("label") == "DomainName")
        hosts = mentions.filter(F.col("label") == "HostName")
        nodes = [
            self.make_nodes(doms, "DomainName", "name"),
            self.make_nodes(hosts, "HostName", "name"),
            self.make_nodes(mentions, "Ranking", "ranking"),
        ]
        triples = [
            self.make_triples(doms, "RANK", "DomainName", "name",
                              "Ranking", "ranking", props_col=F.col("link_props")),
            self.make_triples(hosts, "RANK", "HostName", "name",
                              "Ranking", "ranking", props_col=F.col("link_props")),
        ]
        return nodes, triples
