"""Flat one-file linker crawlers: bgptools.as_names, emileaben.as_names,
virginiatech.rovista, citizenlab.urldb.

Each is a single scan → filter → two-or-three-column link emission; the
reference versions differ only in format and skip rules:

- bgptools.as_names (bgptools/as_names.py:35-85): CSV (asn, name, class);
  'AS'-prefix required, ERR_AS_NAME_NOT_FOUND names and 'Unknown' classes
  skipped per-link (an AS with neither gets no node at all);
- emileaben.as_names (emileaben/as_names.py:27-60): pipe-split
  asn|contributor|name → NAME links with a contributor prop;
- virginiatech.rovista (virginiatech/rovista.py:29-72): paginated JSON;
  ratio > 0.5 → Tag 'Validating RPKI ROV' else 'Not Validating RPKI ROV'
  (K3 singletons), ratio as link prop;
- citizenlab.urldb (citizenlab/urldb.py:26-71): per-country CSVs,
  URL -CATEGORIZED-> Tag(category_description), pair-deduped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..framework import SparkCrawler


class BgpToolsAsNames(SparkCrawler):
    ORG = "BGP.Tools"
    URL = "https://bgp.tools/asns.csv"
    NAME = "bgptools.as_names"
    EXPECTED_PREDS = ["NAME", "CATEGORIZED"]

    def transform(self, docs: DataFrame):
        line = self.text_span(0)
        rows = self.m(
            docs.select(
                F.from_csv(line, "asn string, name string, class string")
                .alias("r")
            )
            .select("r.*")
            # asn field must start with 'AS' (:57-60)
            .filter(F.col("asn").startswith("AS"))
            .withColumn("asnum", F.substring("asn", 3, 12).try_cast("long"))
            .filter(F.col("asnum").isNotNull())
        )
        named = rows.filter(F.col("name") != "ERR_AS_NAME_NOT_FOUND")
        tagged = rows.filter(F.col("class") != "Unknown")
        nodes = [
            self.make_nodes(named, "AS", "asnum"),
            self.make_nodes(tagged, "AS", "asnum"),
            self.make_nodes(named, "Name", "name"),
            self.make_nodes(tagged, "Tag", "class"),
        ]
        triples = [
            self.make_triples(named, "NAME", "AS", "asnum", "Name", "name"),
            self.make_triples(tagged, "CATEGORIZED", "AS", "asnum",
                              "Tag", "class"),
        ]
        return nodes, triples


class EmileabenAsNames(SparkCrawler):
    ORG = "emileaben"
    URL = ("https://raw.githubusercontent.com/emileaben/asnames/main/"
           "asnames.csv")
    NAME = "emileaben.as_names"
    EXPECTED_PREDS = ["NAME"]

    def transform(self, docs: DataFrame):
        line = self.text_span(0)
        parts = F.split(F.trim(self.text_span(0)), r"\|")
        rows = self.m(
            docs.select(
                F.try_element_at(parts, F.lit(1)).try_cast("long").alias("asn"),
                F.try_element_at(parts, F.lit(2)).alias("contributor"),
                F.try_element_at(parts, F.lit(3)).alias("name"),
            )
            .filter(F.col("asn").isNotNull() & F.col("name").isNotNull())
            .withColumn(
                "link_props",
                F.create_map(F.lit("contributor"), F.col("contributor")),
            )
        )
        _ = line
        nodes = [
            self.make_nodes(rows, "AS", "asn"),
            self.make_nodes(rows, "Name", "name"),
        ]
        triples = [
            self.make_triples(rows, "NAME", "AS", "asn", "Name", "name",
                              props_col=F.col("link_props")),
        ]
        return nodes, triples


VALID_TAG = "Validating RPKI ROV"
NOT_VALID_TAG = "Not Validating RPKI ROV"


class VirginiaTechRovista(SparkCrawler):
    ORG = "Virginia Tech"
    URL = "https://api.rovista.netsecurelab.org/rovista/api/overview"
    NAME = "virginiatech.rovista"
    EXPECTED_PREDS = ["CATEGORIZED"]

    def transform(self, docs: DataFrame):
        payload = self.text_span(0)
        rows = self.m(
            docs.select(
                F.explode(
                    F.from_json(payload,
                                "data array<struct<asn:long,ratio:double>>")
                    ["data"]
                ).alias("e")
            )
            .select("e.*")
            .filter(F.col("asn").isNotNull())
            .withColumn(
                "tag",
                F.when(F.col("ratio") > 0.5, F.lit(VALID_TAG))
                .otherwise(F.lit(NOT_VALID_TAG)),
            )
            .withColumn(
                "link_props",
                F.create_map(F.lit("ratio"), F.col("ratio").cast("string")),
            )
        )
        nodes = [
            self.make_nodes(rows, "AS", "asn"),
            self.make_nodes(rows, "Tag", "tag"),
        ]
        triples = [
            self.make_triples(rows, "CATEGORIZED", "AS", "asn", "Tag", "tag",
                              props_col=F.col("link_props")),
        ]
        return nodes, triples


class CitizenLabUrldb(SparkCrawler):
    ORG = "Citizen Lab"
    URL = ("https://raw.githubusercontent.com/citizenlab/test-lists/master/"
           "lists/")
    NAME = "citizenlab.urldb"
    EXPECTED_PREDS = ["CATEGORIZED"]

    def transform(self, docs: DataFrame):
        line = self.text_span(1)
        rows = self.m(
            docs.select(
                F.from_csv(
                    line,
                    "url string, category_code string, "
                    "category_description string, date_added string, "
                    "source string, notes string",
                ).alias("r")
            )
            .select(F.col("r.url").alias("url"),
                    F.col("r.category_description").alias("category"))
            .filter(F.col("url").isNotNull() & F.col("category").isNotNull())
            .dropDuplicates(["url", "category"])  # relationship_pairs set
        )
        nodes = [
            self.make_nodes(rows, "URL", "url"),
            self.make_nodes(rows, "Tag", "category"),
        ]
        triples = [
            self.make_triples(rows, "CATEGORIZED", "URL", "url",
                              "Tag", "category"),
        ]
        return nodes, triples
