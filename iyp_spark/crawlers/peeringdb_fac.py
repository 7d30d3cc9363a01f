"""peeringdb.fac — colocation facilities.

Reference: iyp/crawlers/peeringdb/fac.py:52-166. Facility keyed by stripped
name; NAME / WEBSITE / COUNTRY / LOCATED_IN(Point) / EXTERNAL_ID
(PeeringdbFacID, with the FlatDict'd record as props incl. the
social_media_<service> flatten, ix.py:49-59) / MANAGED_BY through the
PeeringdbOrgID indirection. The falsy lat/lng guard (0 coordinates are
treated as absent, :76-78) and the ISO country filter (:73-74) are kept.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..canon import is_valid_cc
from ..framework import SparkCrawler

FAC_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("org_id", T.LongType()),
    T.StructField("website", T.StringType()),
    T.StructField("country", T.StringType()),
    T.StructField("city", T.StringType()),
    T.StructField("latitude", T.DoubleType()),
    T.StructField("longitude", T.DoubleType()),
    T.StructField("social_media", T.ArrayType(T.StructType([
        T.StructField("service", T.StringType()),
        T.StructField("identifier", T.StringType()),
    ]))),
])


class PeeringdbFac(SparkCrawler):
    ORG = "PeeringDB"
    URL = "https://peeringdb.com/api/fac"
    NAME = "peeringdb.fac"
    EXPECTED_PREDS = ["NAME", "WEBSITE", "COUNTRY", "EXTERNAL_ID",
                      "MANAGED_BY", "LOCATED_IN"]
    NEEDS_EXISTING = True  # PeeringdbOrgID extid map from peeringdb.org

    def _org_extid_map(self) -> DataFrame:
        return (
            self.store.read_triples()
            .filter((F.col("pred") == "EXTERNAL_ID")
                    & (F.col("obj_label") == "PeeringdbOrgID"))
            .select(F.col("obj_key").try_cast("long").alias("org_extid"),
                    F.col("subj_key").alias("org"))
            .dropDuplicates(["org_extid"])
        )

    def transform(self, docs: DataFrame):
        payload = self.text_span(0)
        social = F.map_from_entries(
            F.transform(
                F.coalesce(F.col("social_media"),
                           F.array().cast(FAC_SCHEMA["social_media"].dataType)),
                lambda e: F.struct(
                    F.concat(F.lit("social_media_"), e["service"]).alias("k"),
                    e["identifier"].alias("v"),
                ),
            )
        )
        fac = self.m(
            docs.select(F.from_json(payload, FAC_SCHEMA).alias("r"))
            .select("r.*")
            .filter(F.col("name").isNotNull())
            .withColumn("fac", F.trim("name"))
            .withColumn("site", F.when(F.col("website") != "",
                                       F.trim("website")))
            .withColumn(
                "point",
                F.when(
                    # falsy check: 0.0 / null lat or lng → no Point (:76-78)
                    F.col("latitude").isNotNull() & (F.col("latitude") != 0.0)
                    & F.col("longitude").isNotNull()
                    & (F.col("longitude") != 0.0),
                    F.concat(F.col("longitude").cast("string"), F.lit(","),
                             F.col("latitude").cast("string")),
                ),
            )
            .withColumn(
                "flat_fac",
                F.map_filter(
                    F.map_concat(
                        F.create_map(
                            F.lit("id"), F.col("id").cast("string"),
                            F.lit("name"), F.col("name"),
                            F.lit("org_id"), F.col("org_id").cast("string"),
                            F.lit("website"), F.col("website"),
                            F.lit("country"), F.col("country"),
                            F.lit("city"), F.col("city"),
                            F.lit("latitude"),
                            F.col("latitude").cast("string"),
                            F.lit("longitude"),
                            F.col("longitude").cast("string"),
                        ),
                        social,
                    ),
                    lambda k, v: v.isNotNull(),
                ),
            )
        )
        sited = fac.filter(F.col("site").isNotNull())
        cc = fac.filter(is_valid_cc(F.col("country")))
        located = fac.filter(F.col("point").isNotNull())
        managed = fac.join(F.broadcast(self._org_extid_map()),
                           fac.org_id == F.col("org_extid"))

        nodes = [
            self.make_nodes(fac, "Facility", "fac"),
            self.make_nodes(fac, "Name", "fac"),
            self.make_nodes(fac, "PeeringdbFacID", "id"),
            self.make_nodes(sited, "URL", "site"),
            self.make_nodes(cc, "Country", "country"),
            self.make_nodes(located, "Point", "point"),
        ]
        triples = [
            self.make_triples(fac, "NAME", "Facility", "fac", "Name", "fac"),
            self.make_triples(fac, "EXTERNAL_ID", "Facility", "fac",
                              "PeeringdbFacID", "id",
                              props_col=F.col("flat_fac")),
            self.make_triples(sited, "WEBSITE", "Facility", "fac",
                              "URL", "site"),
            self.make_triples(cc, "COUNTRY", "Facility", "fac",
                              "Country", "country"),
            self.make_triples(located, "LOCATED_IN", "Facility", "fac",
                              "Point", "point"),
            self.make_triples(managed, "MANAGED_BY", "Facility", "fac",
                              "Organization", "org"),
        ]
        return nodes, triples
