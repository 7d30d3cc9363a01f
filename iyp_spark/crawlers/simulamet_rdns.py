"""simulamet.rirdata_rdns — reverse-DNS delegations from rir-data.org.

Reference: iyp/crawlers/simulamet/rirdata_rdns.py:29-168. JSONL lines that
are a dict OR a list of dicts (multiple sources per prefix, :35-40) —
normalized with the from_json(array) ∪ array(from_json(struct)) coalesce;
entries without an NS rdataset skip (:42-43); (nameserver × prefix)
cross-explode, root dot stripped, prefixes compressed, rows deduped
(:53-55); RDNSPrefix -MANAGED_BY{source, ttl}-> HostName with the
AuthoritativeNameServer extra label (:149-163).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..canon import compress_prefix
from ..framework import SparkCrawler

ENTRY = T.StructType([
    T.StructField("source", T.StringType()),
    T.StructField("prefixes", T.ArrayType(T.StringType())),
    T.StructField("rdns", T.StructType([
        T.StructField("ttl", T.LongType()),
        T.StructField("rdatasets", T.MapType(T.StringType(),
                                             T.ArrayType(T.StringType()))),
    ])),
])


class SimulametRirdataRdns(SparkCrawler):
    ORG = "SimulaMet"
    URL = "https://rir-data.org/"
    NAME = "simulamet.rirdata_rdns"
    EXPECTED_PREDS = ["MANAGED_BY"]

    def transform(self, docs: DataFrame):
        line = self.text_span(0)
        arr = F.coalesce(
            F.from_json(line, T.ArrayType(ENTRY)),
            F.array(F.from_json(line, ENTRY)),
        )
        rows = self.m(
            docs.select(F.explode(arr).alias("e"))
            .select("e.*")
            .filter(F.col("rdns.rdatasets")["NS"].isNotNull())  # :42-43
            .select(
                "source",
                F.col("rdns.ttl").alias("ttl"),
                F.explode("prefixes").alias("raw_prefix"),
                F.col("rdns.rdatasets")["NS"].alias("nses"),
            )
            .filter(F.col("raw_prefix").isNotNull()
                    & (F.col("raw_prefix") != ""))
            .select("source", "ttl", "raw_prefix",
                    F.explode("nses").alias("raw_ns"))
            .filter(F.col("raw_ns").isNotNull() & (F.col("raw_ns") != ""))
            # str[:-1] root-dot strip (:141) — case PRESERVED, unlike the
            # openintel path which lowercases
            .withColumn("auth_ns",
                        F.regexp_replace(F.col("raw_ns"), r"\.$", ""))
            .withColumn("prefix", compress_prefix(F.col("raw_prefix")))
            .filter(F.col("prefix").isNotNull())
            .dropDuplicates(["auth_ns", "prefix", "ttl", "source"])  # :53-55
            .withColumn(
                "link_props",
                F.create_map(
                    F.lit("source"), F.col("source"),
                    F.lit("ttl"), F.col("ttl").cast("string"),
                ),
            )
        )
        nodes = [
            self.make_nodes(rows, "HostName", "auth_ns",
                            extra_labels=["AuthoritativeNameServer"]),
            self.make_nodes(rows, "RDNSPrefix", "prefix",
                            extra_labels=["Prefix"]),
        ]
        triples = [
            self.make_triples(rows, "MANAGED_BY", "RDNSPrefix", "prefix",
                              "HostName", "auth_ns",
                              props_col=F.col("link_props")),
        ]
        return nodes, triples
