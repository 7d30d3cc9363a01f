"""bgpkit.as2rel — AS-to-AS PEERS_WITH relationships.

Reference: iyp/crawlers/bgpkit/__init__.py:29-47 (AS2RelCrawler) — each
record {asn1, asn2, rel, peers_count} becomes
AS(asn1)-[PEERS_WITH {rel, peers_count, af}]->AS(asn2); the af comes from
the subclass (pfx2asn v4/v6 split, bgpkit/as2rel_v4.py / as2rel_v6.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..framework import SparkCrawler

RECORD_SCHEMA = T.StructType([
    T.StructField("asn1", T.LongType()),
    T.StructField("asn2", T.LongType()),
    T.StructField("rel", T.IntegerType()),
    T.StructField("peers_count", T.IntegerType()),
])


class BgpkitAs2RelBase(SparkCrawler):
    ORG = "BGPKIT"
    AF = 4
    EXPECTED_PREDS = ["PEERS_WITH"]

    def transform(self, docs: DataFrame):
        rec = docs.select(
            F.from_json(self.text_span(0), RECORD_SCHEMA).alias("r")
        ).select("r.*").filter(
            F.col("asn1").isNotNull() & F.col("asn2").isNotNull()
        ).withColumn(
            "link_props",
            F.map_filter(
                F.create_map(
                    F.lit("asn1"), F.col("asn1").cast("string"),
                    F.lit("asn2"), F.col("asn2").cast("string"),
                    F.lit("rel"), F.col("rel").cast("string"),
                    F.lit("peers_count"), F.col("peers_count").cast("string"),
                    F.lit("af"), F.lit(self.AF).cast("string"),
                ),
                lambda k, v: v.isNotNull(),
            ),
        )
        rec = self.m(rec)
        all_as = rec.select(F.col("asn1").alias("asn")).unionByName(
            rec.select(F.col("asn2").alias("asn"))
        )
        nodes = [self.make_nodes(all_as, "AS", "asn")]
        triples = [
            self.make_triples(
                rec, "PEERS_WITH", "AS", "asn1", "AS", "asn2",
                props_col=F.col("link_props"),
            )
        ]
        return nodes, triples


class BgpkitAs2RelV4(BgpkitAs2RelBase):
    URL = "https://data.bgpkit.com/as2rel/as2rel-v4-latest.json.bz2"
    NAME = "bgpkit.as2rel_v4"
    AF = 4


class BgpkitAs2RelV6(BgpkitAs2RelBase):
    URL = "https://data.bgpkit.com/as2rel/as2rel-v6-latest.json.bz2"
    NAME = "bgpkit.as2rel_v6"
    AF = 6
