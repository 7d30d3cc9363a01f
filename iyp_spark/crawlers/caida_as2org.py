"""caida.as2org — AS-to-Organization mapping with external CAIDA org ids.

Reference: iyp/crawlers/caida/as2org.py:76-163. Two line formats in one
file — org lines `org_id|changed|org_name|country|source` (5 fields) and
AS lines `aut|changed|aut_name|org_id|opaque_id|source` (6 fields); the
reference switches mode on header comment lines, the field count is the
stateless (and distribution-friendly) equivalent. Semantics reproduced:

- `@del` org ids skipped on both sides (:99-105,120-122);
- Organization is keyed by NAME; several org ids may map to one name
  (EXTERNAL_ID per id; COUNTRY per (name, country) with the contributing
  org_ids as props, :149-160);
- asn → org_id is a dict, so the LAST line per ASN wins (:123) — a
  row_number window over document order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..framework import SparkCrawler


class CaidaAs2Org(SparkCrawler):
    ORG = "CAIDA"
    URL = "https://publicdata.caida.org/datasets/as-organizations/"
    NAME = "caida.as2org"
    EXPECTED_PREDS = ["MANAGED_BY", "NAME", "COUNTRY", "EXTERNAL_ID"]

    def transform(self, docs: DataFrame):
        parts = F.split(self.text_span(0), r"\|")
        base = docs.select("doc_id", parts.alias("p")).filter(
            ~self.text_span(0).startswith("#")
        )
        orgs = self.m(
            base.filter(F.size("p") == 5)
            .select(
                F.try_element_at("p", F.lit(1)).alias("org_id"),
                F.try_element_at("p", F.lit(3)).alias("org"),
                F.try_element_at("p", F.lit(4)).alias("cc"),
            )
            .filter(~F.col("org_id").startswith("@del"))
        )
        as_lines = base.filter(F.size("p") == 6).select(
            "doc_id",
            F.try_element_at("p", F.lit(1)).try_cast("long").alias("asn"),
            F.try_element_at("p", F.lit(4)).alias("org_id"),
        ).filter(F.col("asn").isNotNull() & ~F.col("org_id").startswith("@del"))
        # dict semantics: last line per ASN wins (document order)
        w = W.partitionBy("asn").orderBy(F.desc("doc_id"))
        asn_org = self.m(
            as_lines.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .join(
                F.broadcast(orgs.dropDuplicates(["org_id"]).select("org_id", "org")),
                "org_id",
            )
            .withColumn(
                "link_props", F.create_map(F.lit("org_id"), F.col("org_id"))
            )
        )
        org_ids_per_name = orgs.groupBy("org").agg(
            F.array_sort(F.collect_set("org_id")).alias("org_ids")
        ).withColumn(
            "name_props",
            F.create_map(
                F.lit("org_ids"), F.array_join(F.col("org_ids"), ";")
            ),
        )
        org_cc = orgs.groupBy("org", "cc").agg(
            F.array_sort(F.collect_set("org_id")).alias("org_ids")
        ).withColumn(
            "cc_props",
            F.create_map(F.lit("org_ids"), F.array_join(F.col("org_ids"), ";")),
        )
        nodes = [
            self.make_nodes(orgs, "Organization", "org"),
            self.make_nodes(orgs, "Name", "org"),
            self.make_nodes(orgs, "CaidaOrgID", "org_id"),
            self.make_nodes(orgs, "Country", "cc"),
            self.make_nodes(asn_org, "AS", "asn"),
        ]
        triples = [
            self.make_triples(asn_org, "MANAGED_BY", "AS", "asn",
                              "Organization", "org", props_col=F.col("link_props")),
            self.make_triples(org_ids_per_name, "NAME", "Organization", "org",
                              "Name", "org", props_col=F.col("name_props")),
            self.make_triples(orgs.dropDuplicates(["org", "org_id"]), "EXTERNAL_ID",
                              "Organization", "org", "CaidaOrgID", "org_id"),
            self.make_triples(org_cc, "COUNTRY", "Organization", "org",
                              "Country", "cc", props_col=F.col("cc_props")),
        ]
        return nodes, triples
