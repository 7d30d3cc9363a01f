"""inetintel.as_org — AS/Organization sibling relationships (J8 pairwise
self-join) + AS websites.

Reference: iyp/crawlers/inetintel/as_org.py:46-119. Per dataset org id:
all unordered ASN pairs become AS -SIBLING_OF-> AS; PDB.Org names that
already exist as Organization nodes (create=False! :71) pair up into
Organization -SIBLING_OF-> Organization; Website yields AS -WEBSITE-> URL.

Spark plan: the itertools.combinations-per-group becomes a self-join on the
org id with ``left < right`` (emitted in sorted order — the reference's
direction depends on set iteration order, which is not reproducible, and
SIBLING_OF is symmetric). Organizations resolve via a broadcast semi-join
against the dictionary (S8) — hence second wave.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..framework import SparkCrawler

REC_SCHEMA = T.StructType([
    T.StructField("OrgID", T.StringType()),
    T.StructField("PDB.Org", T.StringType()),
    T.StructField("Website", T.StringType()),
])


class InetIntelAsOrg(SparkCrawler):
    ORG = "Internet Intelligence Lab"
    URL = "https://github.com/InetIntel/Dataset-AS-to-Organization-Mapping"
    NAME = "inetintel.as_org"
    EXPECTED_PREDS = ["SIBLING_OF", "WEBSITE"]
    NEEDS_EXISTING = True

    def transform(self, docs: DataFrame):
        rec = self.m(
            docs.select(
                self.text_span(0).try_cast("long").alias("asn"),
                F.from_json(self.text_span(1), REC_SCHEMA).alias("r"),
            )
            .select(
                "asn",
                F.col("r.OrgID").alias("org_id"),
                F.col("r.`PDB.Org`").alias("pdb_org"),
                F.col("r.Website").alias("website"),
            )
            .filter(F.col("asn").isNotNull())
        )
        # J8: unordered ASN pairs within each org id
        a = rec.select("org_id", F.col("asn").alias("a0"))
        b = rec.select("org_id", F.col("asn").alias("a1"))
        as_pairs = (
            a.join(b, "org_id")
            .filter(F.col("a0") < F.col("a1"))
            .dropDuplicates(["a0", "a1"])
        )
        # Organization siblings: only PDB orgs that already exist (ref :71)
        existing_orgs = self.existing_keys("Organization")
        org_members = (
            rec.filter(F.col("pdb_org").isNotNull() & (F.col("pdb_org") != ""))
            .join(F.broadcast(existing_orgs), rec.pdb_org == F.col("key"), "leftsemi")
            .select("org_id", "pdb_org")
            .dropDuplicates()
        )
        o1 = org_members.select("org_id", F.col("pdb_org").alias("o0"))
        o2 = org_members.select("org_id", F.col("pdb_org").alias("o1"))
        org_pairs = (
            o1.join(o2, "org_id")
            .filter(F.col("o0") < F.col("o1"))
            .dropDuplicates(["o0", "o1"])
        )
        sited = rec.filter(F.col("website").isNotNull() & (F.col("website") != ""))
        nodes = [
            self.make_nodes(as_pairs.select(F.col("a0").alias("x")).unionByName(
                as_pairs.select(F.col("a1").alias("x"))
            ).unionByName(sited.select(F.col("asn").alias("x"))), "AS", "x"),
            self.make_nodes(sited, "URL", "website"),
        ]
        triples = [
            self.make_triples(as_pairs, "SIBLING_OF", "AS", "a0", "AS", "a1"),
            self.make_triples(org_pairs, "SIBLING_OF", "Organization", "o0",
                              "Organization", "o1"),
            self.make_triples(sited, "WEBSITE", "AS", "asn", "URL", "website"),
        ]
        return nodes, triples
