"""utwente.laces_v4/v6 — LACeS anycast census.

Reference: iyp/crawlers/utwente/__init__.py:12-140. Parquet rows of
(prefix, backing_prefix, GCD_ICMPv<af>, locations[]); rows with
GCD ≤ 1 drop (:35-36). Emits

- BGPPrefix(backing_prefix) -CATEGORIZED-> Tag('Anycast'), deduped;
- per location: GeoPrefix(prefix) -LOCATED_IN{location metadata}->
  Point('lon,lat') and, when the location has a country mapping,
  GeoPrefix -COUNTRY-> Country (:70-104).

Malformed prefixes warn-skip on either column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..canon import compress_prefix
from ..framework import SparkCrawler

LACES_SCHEMA = T.StructType([
    T.StructField("prefix", T.StringType()),
    T.StructField("backing_prefix", T.StringType()),
    T.StructField("gcd", T.LongType()),
    T.StructField("locations", T.ArrayType(T.StructType([
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("country_code", T.StringType()),
        T.StructField("city", T.StringType()),
    ]))),
])


class _UtwenteLaces(SparkCrawler):
    ORG = "University of Twente"
    URL = "https://github.com/ut-dacs/anycast-census"
    EXPECTED_PREDS = ["CATEGORIZED", "COUNTRY", "LOCATED_IN"]

    def transform(self, docs: DataFrame):
        payload = self.text_span(0)
        rows = self.m(
            docs.select(F.from_json(payload, LACES_SCHEMA).alias("r"))
            .select("r.*")
            .filter(F.col("gcd") > 1)  # high-confidence anycast only (:35-36)
            .withColumn("pfx", compress_prefix(F.col("prefix")))
            .withColumn("backing", compress_prefix(F.col("backing_prefix")))
            .filter(F.col("pfx").isNotNull() & F.col("backing").isNotNull())
            .withColumn("tag", F.lit("Anycast"))
        )
        backing = rows.dropDuplicates(["backing"])
        locs = self.m(
            rows.select("pfx", F.explode("locations").alias("loc"))
            .withColumn(
                "point",
                F.concat(F.col("loc.lon").cast("string"), F.lit(","),
                         F.col("loc.lat").cast("string")),
            )
            .withColumn(
                "link_props",
                F.map_filter(
                    F.create_map(
                        F.lit("country_code"), F.col("loc.country_code"),
                        F.lit("city"), F.col("loc.city"),
                    ),
                    lambda k, v: v.isNotNull() & (v != ""),
                ),
            )
        )
        with_cc = locs.filter(F.col("loc.country_code").isNotNull()
                              & (F.col("loc.country_code") != ""))
        nodes = [
            self.make_nodes(backing, "BGPPrefix", "backing",
                            extra_labels=["Prefix"]),
            self.make_nodes(backing, "Tag", "tag"),
            self.make_nodes(locs, "GeoPrefix", "pfx", extra_labels=["Prefix"]),
            self.make_nodes(locs, "Point", "point"),
            self.make_nodes(with_cc, "Country", "loc.country_code"),
        ]
        triples = [
            self.make_triples(backing, "CATEGORIZED", "BGPPrefix", "backing",
                              "Tag", "tag"),
            self.make_triples(locs, "LOCATED_IN", "GeoPrefix", "pfx",
                              "Point", "point",
                              props_col=F.col("link_props")),
            self.make_triples(with_cc, "COUNTRY", "GeoPrefix", "pfx",
                              "Country", "loc.country_code",
                              props_col=F.col("link_props")),
        ]
        return nodes, triples


class UtwenteLacesV4(_UtwenteLaces):
    NAME = "utwente.laces_v4"


class UtwenteLacesV6(_UtwenteLaces):
    NAME = "utwente.laces_v6"
