"""iana.root_zone — RESOLVES_TO / MANAGED_BY from the DNS root zone file.

Reference: iyp/crawlers/iana/root_zone.py:30-105 — whitespace records
``NAME TTL CLASS TYPE RDATA``: keep IN-class A/AAAA/NS; root-dot strip on
names (the root '.' itself skipped); NS targets become DomainName nodes
additionally labeled AuthoritativeNameServer (unlike openintel where name
servers are HostName-keyed); IPv6 RDATA is compressed (the root zone file
does no zero compression, :66-70).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..canon import compress_ip
from ..framework import SparkCrawler


class IanaRootZone(SparkCrawler):
    ORG = "IANA"
    URL = "https://www.internic.net/domain/root.zone"
    NAME = "iana.root_zone"
    EXPECTED_PREDS = ["RESOLVES_TO", "MANAGED_BY"]

    def transform(self, docs: DataFrame):
        p = F.split(F.trim(self.text_span(0)), r"\s+")
        rec = (
            docs.select(p.alias("p"))
            .filter(F.size("p") >= 5)
            .select(
                F.regexp_replace(F.try_element_at("p", F.lit(1)), r"\.$", "").alias("name"),
                F.try_element_at("p", F.lit(3)).alias("cls"),
                F.try_element_at("p", F.lit(4)).alias("rtype"),
                F.try_element_at("p", F.lit(5)).alias("rdata"),
            )
            .filter((F.col("cls") == "IN") & F.col("rtype").isin("A", "AAAA", "NS")
                    & (F.col("name") != ""))
        )
        ns = self.m(
            rec.filter(F.col("rtype") == "NS")
            .withColumn("nsdname", F.regexp_replace("rdata", r"\.$", ""))
            .filter(F.col("nsdname") != "")
        )
        addr = self.m(
            rec.filter(F.col("rtype").isin("A", "AAAA"))
            .withColumn("ip", compress_ip(F.col("rdata")))
            .filter(F.col("ip").isNotNull())
        )
        all_domains = (
            rec.select("name").unionByName(ns.select(F.col("nsdname").alias("name")))
        )
        nodes = [
            self.make_nodes(all_domains, "DomainName", "name"),
            self.make_nodes(ns, "DomainName", "nsdname",
                            extra_labels=["AuthoritativeNameServer"]),
            self.make_nodes(addr, "IP", "ip"),
        ]
        triples = [
            self.make_triples(addr.dropDuplicates(["name", "ip"]), "RESOLVES_TO",
                              "DomainName", "name", "IP", "ip"),
            self.make_triples(ns.dropDuplicates(["name", "nsdname"]), "MANAGED_BY",
                              "DomainName", "name", "DomainName", "nsdname"),
        ]
        return nodes, triples
