"""manrs.members — MANRS participant list.

Reference: iyp/crawlers/manrs/members.py:20-134. Naive comma-split CSV
(org, areas, asns, act1..act4), header skipped, organizations without
ASNs skipped (:78-80); ';'-multi-valued ASNs and service areas explode;

- AS -MEMBER_OF-> Organization('MANRS') (K3 singleton, :23-26);
- AS -COUNTRY-> Country per service area (:82-86);
- AS -IMPLEMENT-> ManrsAction(label) for each 'Yes' action column
  (:87-89), the four action nodes carrying their description prop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..framework import SparkCrawler

ACTIONS = [
    ("MANRS Action 1: Filtering",
     "Prevent propagation of incorrect routing information"),
    ("MANRS Action 2: Anti-spoofing",
     "Prevent traffic with spoofed source IP addresses"),
    ("MANRS Action 3: Coordination",
     "Facilitate global operational communication and coordination"),
    ("MANRS Action 4: Global Validation",
     "Facilitate routing information on a global scale"),
]


class ManrsMembers(SparkCrawler):
    ORG = "MANRS"
    URL = "https://www.manrs.org/wp-json/manrs/v1/csv/4"
    NAME = "manrs.members"
    EXPECTED_PREDS = ["MEMBER_OF", "COUNTRY", "IMPLEMENT"]

    def transform(self, docs: DataFrame):
        line = self.text_span(0)
        parts = F.split(line, ",")  # naive split, like the reference (:76)
        rows = self.m(
            docs.select(
                F.trim(F.try_element_at(parts, F.lit(1))).alias("org"),
                F.trim(F.try_element_at(parts, F.lit(2))).alias("areas"),
                F.trim(F.try_element_at(parts, F.lit(3))).alias("asns"),
                *[F.trim(F.try_element_at(parts, F.lit(4 + i))).alias(f"act{i + 1}") for i in range(4)],
            )
            .filter(F.col("org") != "Organization")  # header (:73-75)
            .filter(F.col("asns") != "")  # no ASN → skip (:78-80)
            .select("*", F.explode(F.split("asns", ";")).alias("asn_s"))
            .withColumn("asn", F.trim("asn_s").try_cast("long"))
            .filter(F.col("asn").isNotNull())
            .withColumn("manrs", F.lit("MANRS"))
        )
        countries = rows.select(
            "asn", "manrs", F.explode(F.split("areas", ";")).alias("cc_raw")
        ).withColumn("cc", F.trim("cc_raw")).filter(F.col("cc") != "")
        impl = rows.select(
            "asn",
            F.explode(
                F.array(*[
                    F.when(F.col(f"act{i + 1}") == "Yes", F.lit(label))
                    for i, (label, _) in enumerate(ACTIONS)
                ])
            ).alias("action"),
        ).filter(F.col("action").isNotNull())
        actions_dim = self.spark.createDataFrame(
            ACTIONS, "action string, description string"
        ).withColumn(
            "props",
            F.create_map(F.lit("description"), F.col("description")),
        )
        nodes = [
            self.make_nodes(rows, "AS", "asn"),
            self.make_nodes(rows.limit(1), "Organization", "manrs"),
            self.make_nodes(countries, "Country", "cc"),
            self.make_nodes(actions_dim, "ManrsAction", "action",
                            props_col="props"),
        ]
        triples = [
            self.make_triples(rows.dropDuplicates(["asn"]), "MEMBER_OF",
                              "AS", "asn", "Organization", "manrs"),
            self.make_triples(countries.dropDuplicates(["asn", "cc"]),
                              "COUNTRY", "AS", "asn", "Country", "cc"),
            self.make_triples(impl.dropDuplicates(["asn", "action"]),
                              "IMPLEMENT", "AS", "asn",
                              "ManrsAction", "action"),
        ]
        return nodes, triples
