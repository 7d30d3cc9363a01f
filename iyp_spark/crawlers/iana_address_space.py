"""iana.address_space — IANA v4/v6 allocation registries + special-purpose
registries.

Reference: iyp/crawlers/iana/address_space.py:37-185. Four CSV sources in
one crawler; here each line is a document tagged v4 / v6 / special:

- general (v4/v6, :58-118): the v4 '001/8' → '1.0.0.0/8' rewrite (:73-76)
  is a split + cast; Designation → Organization normalization (:43-56:
  'IANA - x' → IANA, 'Administered by x' → x, Multicast/Future use → IANA)
  is a when-ladder; the Status column ('Status [1]' for v4) is a
  data-driven predicate (ALLOCATED / RESERVED / LEGACY) via a pred Column;
- special (:130-185): footnote suffixes ('192.0.0.0/24 [2]') stripped, the
  one dual-prefix cell ('192.0.0.170/32, 192.0.0.171/32') exploded to two
  rows, boolean columns parsed with the N/A-and-footnote ladder
  (_parse_bool_property, :120-128), all rows RESERVED → Organization IANA.

IANAPrefix nodes double-labeled Prefix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..canon import compress_prefix
from ..framework import SparkCrawler

GENERAL_SCHEMA = ("prefix string, designation string, date string, "
                  "status string")
SPECIAL_SCHEMA = ("address_block string, name string, rfc string, "
                  "allocation_date string, source string, destination string, "
                  "forwardable string, globally_reachable string, "
                  "reserved_by_protocol string")

DUAL_CELL = "192.0.0.170/32, 192.0.0.171/32"


def normalize_designation(d: Column) -> Column:
    """The _normalize_organization_name ladder (:43-56)."""
    return (
        F.when(d.startswith("IANA - "), F.lit("IANA"))
        .when(d.startswith("Administered by "),
              F.replace(d, F.lit("Administered by "), F.lit("")))
        .when(d.isin("Multicast", "Future use"), F.lit("IANA"))
        .otherwise(d)
    )


def parse_bool_prop(v: Column) -> Column:
    """'N/A' (with or without footnote) → null; strip footnote; == 'True'
    (:120-128), stringified for the props map."""
    stripped = F.split(v, " ")[0]
    return F.when(
        v.isNull() | v.startswith("N/A"), F.lit(None).cast("string")
    ).otherwise((stripped == "True").cast("string"))


class IanaAddressSpace(SparkCrawler):
    ORG = "IANA"
    URL = "https://www.iana.org/assignments/"
    NAME = "iana.address_space"
    EXPECTED_PREDS = ["ALLOCATED", "RESERVED", "LEGACY"]

    def transform(self, docs: DataFrame):
        kind = self.text_span(0)
        line = self.text_span(1)

        general = self.m(
            docs.filter(kind.isin("v4", "v6"))
            .select(kind.alias("kind"),
                    F.from_csv(line, GENERAL_SCHEMA).alias("r"))
            .select("kind", "r.*")
            .filter(F.col("prefix").isNotNull()
                    & F.col("status").isin("ALLOCATED", "RESERVED", "LEGACY"))
            .withColumn(
                "pfx",
                F.when(
                    F.col("kind") == "v4",
                    F.concat(F.split("prefix", "/")[0].try_cast("int"),
                             F.lit(".0.0.0/"), F.try_element_at(F.split("prefix", "/"), F.lit(2))),
                ).otherwise(F.col("prefix")),
            )
            .withColumn("pfx", compress_prefix(F.col("pfx")))  # ip_network().compressed
            .filter(F.col("pfx").isNotNull())
            .withColumn("org", normalize_designation(F.col("designation")))
            .withColumn(
                "link_props",
                F.create_map(
                    F.lit("Designation"), F.col("designation"),
                    F.lit("Date"), F.col("date"),
                ),
            )
        )

        special = self.m(
            docs.filter(kind == "special")
            .select(F.from_csv(line, SPECIAL_SCHEMA).alias("r"))
            .select("r.*")
            .filter(F.col("address_block").isNotNull())
            .withColumn(
                "pfx",
                F.explode(
                    F.when(
                        F.col("address_block") == DUAL_CELL,
                        F.array(F.lit("192.0.0.170/32"),
                                F.lit("192.0.0.171/32")),
                    ).otherwise(
                        F.array(F.split("address_block", " ")[0])
                    )
                ),
            )
            .withColumn("pfx", compress_prefix(F.col("pfx")))
            .filter(F.col("pfx").isNotNull())
            .withColumn(
                "link_props",
                F.map_filter(
                    F.create_map(
                        F.lit("Name"), F.col("name"),
                        F.lit("RFC"), F.col("rfc"),
                        F.lit("Allocation Date"), F.col("allocation_date"),
                        F.lit("Source"), parse_bool_prop(F.col("source")),
                        F.lit("Destination"),
                        parse_bool_prop(F.col("destination")),
                        F.lit("Forwardable"),
                        parse_bool_prop(F.col("forwardable")),
                        F.lit("Globally Reachable"),
                        parse_bool_prop(F.col("globally_reachable")),
                        F.lit("Reserved-by-Protocol"),
                        parse_bool_prop(F.col("reserved_by_protocol")),
                    ),
                    lambda k, v: v.isNotNull(),
                ),
            )
            .withColumn("org", F.lit("IANA"))
        )

        nodes = [
            self.make_nodes(general, "IANAPrefix", "pfx",
                            extra_labels=["Prefix"]),
            self.make_nodes(special, "IANAPrefix", "pfx",
                            extra_labels=["Prefix"]),
            self.make_nodes(general, "Organization", "org"),
            self.make_nodes(special, "Organization", "org"),
        ]
        triples = [
            self.make_triples(general, F.col("status"), "IANAPrefix", "pfx",
                              "Organization", "org",
                              props_col=F.col("link_props")),
            self.make_triples(special, "RESERVED", "IANAPrefix", "pfx",
                              "Organization", "org",
                              props_col=F.col("link_props")),
        ]
        return nodes, triples
