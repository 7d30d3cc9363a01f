"""bgptools.anycast_prefixes_v4/v6, caida.as_relationships_v4/v6, and
bgpkit.peerstats.

- bgptools anycast (bgptools/__init__.py:12-59): two-column CSV
  (prefix, probed_ip) → BGPPrefix -CATEGORIZED{probed_ip}-> Tag('Anycast')
  singleton (K3); malformed prefixes warn-skip.
- caida as_relationships (caida/__init__.py:13-70): '#'-comment-skipped
  pipe lines left|right|kind → AS -PEERS_WITH{rel, af}-> AS.
- bgpkit.peerstats (bgpkit/peerstats.py:25-100): one doc per collector's
  bz2 JSON stats; AS -PEERS_WITH{peer props}-> BGPCollector, collector
  nodes carry the project prop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..canon import compress_prefix
from ..framework import SparkCrawler


class _AnycastPrefixes(SparkCrawler):
    ORG = "bgp.tools"
    URL = "https://github.com/bgptools/anycast-prefixes"
    EXPECTED_PREDS = ["CATEGORIZED"]

    def transform(self, docs: DataFrame):
        line = self.text_span(0)
        rows = self.m(
            docs.select(
                F.from_csv(line, "prefix string, probed_ip string").alias("r")
            )
            .select("r.*")
            .withColumn("pfx", compress_prefix(F.col("prefix")))
            .filter(F.col("pfx").isNotNull())  # warn-skip (:35-39)
            .withColumn("tag", F.lit("Anycast"))
            .withColumn(
                "link_props",
                F.create_map(F.lit("probed_ip"), F.col("probed_ip")),
            )
        )
        nodes = [
            self.make_nodes(rows, "BGPPrefix", "pfx", extra_labels=["Prefix"]),
            self.make_nodes(rows, "Tag", "tag"),
        ]
        triples = [
            self.make_triples(rows, "CATEGORIZED", "BGPPrefix", "pfx",
                              "Tag", "tag", props_col=F.col("link_props")),
        ]
        return nodes, triples


class BgpToolsAnycastV4(_AnycastPrefixes):
    NAME = "bgptools.anycast_prefixes_v4"


class BgpToolsAnycastV6(_AnycastPrefixes):
    NAME = "bgptools.anycast_prefixes_v6"


class _CaidaAsRel(SparkCrawler):
    ORG = "CAIDA"
    URL = "https://publicdata.caida.org/datasets/as-relationships/serial-1/"
    EXPECTED_PREDS = ["PEERS_WITH"]
    AF = 4

    def transform(self, docs: DataFrame):
        line = self.text_span(0)
        parts = F.split(F.trim(line), r"\|")
        rows = self.m(
            docs.filter(~F.trim(line).startswith("#"))
            .select(
                F.try_element_at(parts, F.lit(1)).try_cast("long").alias("left_asn"),
                F.try_element_at(parts, F.lit(2)).try_cast("long").alias("right_asn"),
                F.try_element_at(parts, F.lit(3)).try_cast("long").alias("rel"),
            )
            .filter(F.col("left_asn").isNotNull()
                    & F.col("right_asn").isNotNull())
            .withColumn(
                "link_props",
                F.create_map(
                    F.lit("rel"), F.col("rel").cast("string"),
                    F.lit("af"), F.lit(str(self.AF)),
                ),
            )
        )
        nodes = [
            self.make_nodes(rows, "AS", "left_asn"),
            self.make_nodes(rows, "AS", "right_asn"),
        ]
        triples = [
            self.make_triples(rows, "PEERS_WITH", "AS", "left_asn",
                              "AS", "right_asn",
                              props_col=F.col("link_props")),
        ]
        return nodes, triples


class CaidaAsRelationshipsV4(_CaidaAsRel):
    NAME = "caida.as_relationships_v4"
    AF = 4


class CaidaAsRelationshipsV6(_CaidaAsRel):
    NAME = "caida.as_relationships_v6"
    AF = 6


PEERSTATS_SCHEMA = T.StructType([
    T.StructField("collector", T.StringType()),
    T.StructField("project", T.StringType()),
    T.StructField("peers", T.MapType(T.StringType(), T.StructType([
        T.StructField("asn", T.LongType()),
        T.StructField("num_v4_pfxs", T.LongType()),
        T.StructField("num_v6_pfxs", T.LongType()),
        T.StructField("num_connected_asns", T.LongType()),
    ]))),
])


class BgpkitPeerstats(SparkCrawler):
    ORG = "BGPKIT"
    URL = "https://data.bgpkit.com/peer-stats/"
    NAME = "bgpkit.peerstats"
    EXPECTED_PREDS = ["PEERS_WITH"]

    def transform(self, docs: DataFrame):
        payload = self.text_span(0)
        rows = self.m(
            docs.select(F.from_json(payload, PEERSTATS_SCHEMA).alias("r"))
            .select(
                F.col("r.collector").alias("collector"),
                F.col("r.project").alias("project"),
                F.explode(F.map_values("r.peers")).alias("p"),
            )
            .filter(F.col("p.asn").isNotNull())
            .withColumn(
                "link_props",
                F.map_filter(
                    F.create_map(
                        F.lit("asn"), F.col("p.asn").cast("string"),
                        F.lit("num_v4_pfxs"),
                        F.col("p.num_v4_pfxs").cast("string"),
                        F.lit("num_v6_pfxs"),
                        F.col("p.num_v6_pfxs").cast("string"),
                        F.lit("num_connected_asns"),
                        F.col("p.num_connected_asns").cast("string"),
                    ),
                    lambda k, v: v.isNotNull(),
                ),
            )
            .withColumn(
                "collector_props",
                F.create_map(F.lit("project"), F.col("project")),
            )
        )
        nodes = [
            self.make_nodes(rows.dropDuplicates(["collector"]), "BGPCollector",
                            "collector", props_col="collector_props"),
            self.make_nodes(rows, "AS", "p.asn"),
        ]
        triples = [
            self.make_triples(rows, "PEERS_WITH", "AS", "p.asn",
                              "BGPCollector", "collector",
                              props_col=F.col("link_props")),
        ]
        return nodes, triples
