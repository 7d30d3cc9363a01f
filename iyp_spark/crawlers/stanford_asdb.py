"""stanford.asdb — AS categorization with a two-layer tag hierarchy.

Reference: iyp/crawlers/stanford/asdb.py:50-118 — line
`ASxxx,cat1,sub1,cat2,sub2,...`: even positions are layer-1 categories
(always kept), odd positions layer-2 subcategories (dropped when empty or
'Other'/'other'); each kept subcategory also yields
Tag(sub) -PART_OF-> Tag(parent). Mentions are set-deduplicated
(reference accumulates into sets, :47-90).

Spark plan: split + posexplode (E1) + positional parent lookup
(element_at with a column index) — all native.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..canon import canon_asn
from ..framework import SparkCrawler


class StanfordAsdb(SparkCrawler):
    ORG = "Stanford"
    URL = "https://asdb.stanford.edu/data/latest.csv"
    NAME = "stanford.asdb"
    EXPECTED_PREDS = ["CATEGORIZED", "PART_OF"]

    def transform(self, docs: DataFrame):
        parts = F.split(self.text_span(0), ",")
        base = docs.select(
            canon_asn(F.try_element_at(parts, F.lit(1))).alias("asn"),
            F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))).alias("cats"),
        ).filter(F.col("asn").isNotNull())
        exploded = self.m(
            base.select(
                "asn", "cats", F.posexplode("cats").alias("pos", "category")
            ).filter(F.col("category") != "")
        )
        layer1 = exploded.filter(F.col("pos") % 2 == 0).withColumn("layer", F.lit(1))
        layer2 = (
            exploded.filter(
                (F.col("pos") % 2 == 1)
                & (~F.lower("category").isin("other"))
            )
            .withColumn("parent", F.try_element_at("cats", F.col("pos")))  # cats[pos-1], 1-based
            .filter(F.col("parent") != "")
            .withColumn("layer", F.lit(2))
        )
        categorized = (
            layer1.select("asn", "category", "layer")
            .unionByName(layer2.select("asn", "category", "layer"))
            .dropDuplicates(["asn", "category", "layer"])  # ref set semantics :90
            .withColumn(
                "link_props",
                F.create_map(F.lit("layer"), F.col("layer").cast("string")),
            )
        )
        part_of = layer2.select("category", "parent").distinct()
        all_tags = categorized.select(F.col("category").alias("t")).unionByName(
            part_of.select(F.col("parent").alias("t"))
        )
        nodes = [
            self.make_nodes(categorized, "AS", "asn"),
            self.make_nodes(all_tags, "Tag", "t"),
        ]
        triples = [
            self.make_triples(categorized, "CATEGORIZED", "AS", "asn",
                              "Tag", "category", props_col=F.col("link_props")),
            self.make_triples(part_of, "PART_OF", "Tag", "category", "Tag", "parent"),
        ]
        return nodes, triples
