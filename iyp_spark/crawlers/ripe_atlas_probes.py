"""ripe.atlas_probes — RIPE Atlas probe inventory.

Reference: iyp/crawlers/ripe/atlas_probes.py:69-204. Cursor-paginated API
pages are document rows ({"results": [probe...]}); per probe:

- duplicate probe ids (connectivity changed mid-fetch, :95-98) collapse to
  one row;
- address_v6 compressed (:103-106), address_v4 taken as-is;
- IP(address) -ASSIGNED-> AtlasProbe for each present address (:163-172);
- AtlasProbe -LOCATED_IN{af}-> AS for each present asn (:174-184);
- AtlasProbe -COUNTRY-> Country only for ISO-3166 codes (:116-121);
- AtlasProbe -LOCATED_IN-> Point('lon,lat') with the out-of-range
  coordinate guard (:128-137) — 0,0 null island is kept, matching the
  reference's bounds-only check;
- the probe's FlatterDict_-flattened record becomes the AtlasProbe node's
  props (:146-148).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..canon import compress_ip, is_valid_cc
from ..framework import SparkCrawler

PROBE = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("address_v4", T.StringType()),
    T.StructField("address_v6", T.StringType()),
    T.StructField("asn_v4", T.LongType()),
    T.StructField("asn_v6", T.LongType()),
    T.StructField("country_code", T.StringType()),
    T.StructField("is_anchor", T.BooleanType()),
    T.StructField("is_public", T.BooleanType()),
    T.StructField("status", T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ])),
    T.StructField("geometry", T.StructType([
        T.StructField("type", T.StringType()),
        T.StructField("coordinates", T.ArrayType(T.DoubleType())),
    ])),
    T.StructField("tags", T.ArrayType(T.StructType([
        T.StructField("slug", T.StringType()),
    ]))),
])

PAGE_SCHEMA = T.StructType([T.StructField("results", T.ArrayType(PROBE))])


class RipeAtlasProbes(SparkCrawler):
    ORG = "RIPE NCC"
    URL = "https://atlas.ripe.net/api/v2/probes"
    NAME = "ripe.atlas_probes"
    EXPECTED_PREDS = ["ASSIGNED", "LOCATED_IN", "COUNTRY"]

    def transform(self, docs: DataFrame):
        payload = self.text_span(0)
        lon = F.try_element_at(F.col("geometry.coordinates"), F.lit(1))
        lat = F.try_element_at(F.col("geometry.coordinates"), F.lit(2))
        probes = self.m(
            docs.select(
                F.explode(F.from_json(payload, PAGE_SCHEMA)["results"])
                .alias("p")
            )
            .select("p.*")
            .filter(F.col("id").isNotNull())
            .dropDuplicates(["id"])  # :95-98
            .withColumn("v6", compress_ip(F.col("address_v6")))  # :103-106
            .withColumn(
                "point",
                F.when(
                    F.col("geometry").isNotNull()
                    & (F.size("geometry.coordinates") == 2)
                    & lon.between(-180.0, 180.0)
                    & lat.between(-90.0, 90.0),
                    F.concat(lon.cast("string"), F.lit(","),
                             lat.cast("string")),
                ),
            )
            .withColumn(
                "probe_props",
                F.map_filter(
                    F.create_map(
                        F.lit("id"), F.col("id").cast("string"),
                        F.lit("address_v4"), F.col("address_v4"),
                        F.lit("address_v6"), F.col("v6"),
                        F.lit("asn_v4"), F.col("asn_v4").cast("string"),
                        F.lit("asn_v6"), F.col("asn_v6").cast("string"),
                        F.lit("country_code"), F.col("country_code"),
                        F.lit("is_anchor"), F.col("is_anchor").cast("string"),
                        F.lit("is_public"), F.col("is_public").cast("string"),
                        F.lit("status_id"),
                        F.col("status.id").cast("string"),
                        F.lit("status_name"), F.col("status.name"),
                        F.lit("tags_0_slug"),
                        F.try_element_at(F.col("tags.slug"), F.lit(1)),
                    ),
                    lambda k, v: v.isNotNull(),
                ),
            )
        )
        v4 = probes.filter(F.col("address_v4").isNotNull()
                           & (F.col("address_v4") != ""))
        v6 = probes.filter(F.col("v6").isNotNull())
        as4 = probes.filter(F.col("asn_v4").isNotNull() & (F.col("asn_v4") != 0))
        as6 = probes.filter(F.col("asn_v6").isNotNull() & (F.col("asn_v6") != 0))
        cc = probes.filter(is_valid_cc(F.col("country_code")))
        located = probes.filter(F.col("point").isNotNull())

        af = lambda n: F.create_map(F.lit("af"), F.lit(str(n)))  # noqa: E731
        nodes = [
            self.make_nodes(probes, "AtlasProbe", "id",
                            props_col="probe_props"),
            self.make_nodes(v4, "IP", "address_v4"),
            self.make_nodes(v6, "IP", "v6"),
            self.make_nodes(as4, "AS", "asn_v4"),
            self.make_nodes(as6, "AS", "asn_v6"),
            self.make_nodes(cc, "Country", "country_code"),
            self.make_nodes(located, "Point", "point"),
        ]
        triples = [
            self.make_triples(v4, "ASSIGNED", "IP", "address_v4",
                              "AtlasProbe", "id"),
            self.make_triples(v6, "ASSIGNED", "IP", "v6", "AtlasProbe", "id"),
            self.make_triples(as4, "LOCATED_IN", "AtlasProbe", "id",
                              "AS", "asn_v4", props_col=af(4)),
            self.make_triples(as6, "LOCATED_IN", "AtlasProbe", "id",
                              "AS", "asn_v6", props_col=af(6)),
            self.make_triples(cc, "COUNTRY", "AtlasProbe", "id",
                              "Country", "country_code"),
            self.make_triples(located, "LOCATED_IN", "AtlasProbe", "id",
                              "Point", "point"),
        ]
        return nodes, triples
