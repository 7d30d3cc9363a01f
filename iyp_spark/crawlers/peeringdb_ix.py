"""peeringdb.ix — IXPs, peering LANs, and IXP memberships.

Reference: iyp/crawlers/peeringdb/ix.py:113-308. The hardest linking
semantics in the reference (SURVEY §7.2 step 5):

- organizations are resolved through the EXTERNAL_ID indirection (J2):
  batch_get_node_extid('PeeringdbOrgID') builds extid → node; here that is
  a broadcast join against the EXTERNAL_ID triples written by peeringdb.org
  (hence NEEDS_EXISTING → second wave);
- nested ixlan_set / ixpfx_set / net_set unnest (E1) becomes explode chains;
- membership dedup per (net, ix) and once-per-ASN net attributes
  (processed_net / processed_membership sets, :239-300) become
  dropDuplicates;
- facilities are not crawled, so ix LOCATED_IN links are absent (the
  reference error-logs and skips them the same way, :348-354).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..canon import compress_prefix
from ..framework import SparkCrawler

IX_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("org_id", T.LongType()),
    T.StructField("country", T.StringType()),
    T.StructField("website", T.StringType()),
    T.StructField("fac_set", T.ArrayType(T.StructType([
        T.StructField("id", T.LongType()),
    ]))),
    T.StructField("ixlan_set", T.ArrayType(T.StructType([
        T.StructField("id", T.LongType()),
    ]))),
])

LAN_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("ixpfx_set", T.ArrayType(T.StructType([
        T.StructField("prefix", T.StringType()),
    ]))),
    T.StructField("net_set", T.ArrayType(T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("asn", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("website", T.StringType()),
        T.StructField("org_id", T.LongType()),
    ]))),
])


class PeeringdbIx(SparkCrawler):
    ORG = "PeeringDB"
    URL = "https://peeringdb.com/api/ix"
    NAME = "peeringdb.ix"
    EXPECTED_PREDS = ["MANAGED_BY", "COUNTRY", "WEBSITE", "EXTERNAL_ID",
                      "NAME", "MEMBER_OF"]
    NEEDS_EXISTING = True

    def _org_extid_map(self) -> DataFrame:
        """J2: extid → Organization key via the EXTERNAL_ID alias edges."""
        return (
            self.store.read_triples()
            .filter((F.col("pred") == "EXTERNAL_ID")
                    & (F.col("obj_label") == "PeeringdbOrgID"))
            .select(
                F.col("obj_key").try_cast("long").alias("org_extid"),
                F.col("subj_key").alias("org"),
            )
            .dropDuplicates(["org_extid"])
        )

    def transform(self, docs: DataFrame):
        kind = self.text_span(0)
        payload = self.text_span(1)
        ix = self.m(
            docs.filter(kind == "ix")
            .select(F.from_json(payload, IX_SCHEMA).alias("r"))
            .select("r.*")
            .withColumnRenamed("name", "ix_name")
            .filter(F.col("ix_name").isNotNull())
        )
        lan = self.m(
            docs.filter(kind == "ixlan")
            .select(F.from_json(payload, LAN_SCHEMA).alias("r"))
            .select(F.col("r.id").alias("lan_id"), F.col("r.ixpfx_set").alias("ixpfx_set"),
                    F.col("r.net_set").alias("net_set"))
        )
        orgs = self._org_extid_map()

        ix_org = ix.join(F.broadcast(orgs), ix.org_id == orgs.org_extid, "left")
        managed = ix_org.filter(F.col("org").isNotNull())
        in_country = ix.filter(F.col("country") != "")
        sited = ix.filter(F.col("website") != "")

        # ix → lan join (dangling ixlan ids drop out, ref :203-206)
        ix_lan = self.m(
            ix.select("ix_name", F.explode("ixlan_set").alias("lanref"))
            .join(lan, F.col("lanref.id") == lan.lan_id)
        )
        prefixes = (
            ix_lan.select("ix_name", F.explode("ixpfx_set").alias("pfx"))
            .withColumn("prefix", compress_prefix(F.col("pfx.prefix")))
            .filter(F.col("prefix").isNotNull())
        )
        members = self.m(
            ix_lan.select("ix_name", F.explode("net_set").alias("net"))
            .select(
                "ix_name",
                F.col("net.asn").alias("asn"),
                F.col("net.id").alias("net_extid"),
                F.col("net.name").alias("net_name"),
                F.col("net.website").alias("net_website"),
                F.col("net.org_id").alias("net_org_id"),
            )
            .filter(F.col("asn").isNotNull())
            .withColumn(
                "flat_net",
                F.map_filter(
                    F.create_map(
                        F.lit("id"), F.col("net_extid").cast("string"),
                        F.lit("asn"), F.col("asn").cast("string"),
                        F.lit("name"), F.col("net_name"),
                        F.lit("website"), F.col("net_website"),
                        F.lit("org_id"), F.col("net_org_id").cast("string"),
                    ),
                    lambda k, v: v.isNotNull(),
                ),
            )
        )
        membership = members.dropDuplicates(["asn", "ix_name"])  # ref :268-300
        nets_once = members.dropDuplicates(["asn"])  # processed_net, ref :276
        nets_sited = nets_once.filter(F.col("net_website") != "")
        nets_org = nets_once.join(
            F.broadcast(orgs), nets_once.net_org_id == orgs.org_extid
        )

        nodes = [
            self.make_nodes(ix, "IXP", "ix_name"),
            self.make_nodes(ix, "PeeringdbIXID", "id"),
            self.make_nodes(ix, "Name", "ix_name"),
            self.make_nodes(sited, "URL", "website"),
            self.make_nodes(in_country, "Country", "country"),
            self.make_nodes(prefixes, "PeeringLAN", "prefix",
                            extra_labels=["Prefix"]),
            self.make_nodes(members, "AS", "asn"),
            self.make_nodes(nets_once, "PeeringdbNetID", "net_extid"),
            self.make_nodes(nets_once, "Name", "net_name"),
            self.make_nodes(nets_sited, "URL", "net_website"),
        ]
        triples = [
            self.make_triples(managed, "MANAGED_BY", "IXP", "ix_name",
                              "Organization", "org"),
            self.make_triples(in_country, "COUNTRY", "IXP", "ix_name",
                              "Country", "country"),
            self.make_triples(sited, "WEBSITE", "IXP", "ix_name", "URL", "website"),
            self.make_triples(ix, "EXTERNAL_ID", "IXP", "ix_name",
                              "PeeringdbIXID", "id"),
            self.make_triples(ix, "NAME", "IXP", "ix_name", "Name", "ix_name"),
            self.make_triples(prefixes, "MANAGED_BY", "PeeringLAN", "prefix",
                              "IXP", "ix_name"),
            self.make_triples(membership, "MEMBER_OF", "AS", "asn", "IXP", "ix_name",
                              props_col=F.col("flat_net")),
            self.make_triples(nets_once, "NAME", "AS", "asn", "Name", "net_name",
                              props_col=F.col("flat_net")),
            self.make_triples(nets_once, "EXTERNAL_ID", "AS", "asn",
                              "PeeringdbNetID", "net_extid",
                              props_col=F.col("flat_net")),
            self.make_triples(nets_sited, "WEBSITE", "AS", "asn",
                              "URL", "net_website", props_col=F.col("flat_net")),
            self.make_triples(nets_org, "MANAGED_BY", "AS", "asn",
                              "Organization", "org", props_col=F.col("flat_net")),
        ]
        return nodes, triples
