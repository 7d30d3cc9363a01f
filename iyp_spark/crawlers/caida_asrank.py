"""caida.asrank — AS NAME / COUNTRY / RANK / LOCATED_IN from ASRank records.

Reference: iyp/crawlers/caida/asrank.py:56-116. Per node: NAME only when
asnName non-empty, COUNTRY only when country.iso non-empty, LOCATED_IN only
when latitude AND longitude are truthy (so 0.0 behaves like absent — we
reproduce that quirk), RANK to the singleton Ranking('CAIDA ASRank') with
the flatdict-flattened record as props (':' delimiter, nulls dropped —
iyp/__init__.py:73-75).

Spark plan: from_json over the text span (native), flatten = explicit
column list (the schema is static here, unlike the reference's runtime
flatdict), media span (logo blob) ignored by this crawler but preserved by
the span-fidelity invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..canon import canon_cc
from ..framework import SparkCrawler

RECORD_SCHEMA = T.StructType([
    T.StructField("asn", T.StringType()),
    T.StructField("asnName", T.StringType()),
    T.StructField("rank", T.IntegerType()),
    T.StructField("country", T.StructType([T.StructField("iso", T.StringType())])),
    T.StructField("latitude", T.DoubleType()),
    T.StructField("longitude", T.DoubleType()),
])


class CaidaAsRank(SparkCrawler):
    ORG = "CAIDA"
    URL = "https://api.asrank.caida.org/v2/graphql"
    NAME = "caida.asrank"
    EXPECTED_PREDS = ["NAME", "COUNTRY", "RANK", "LOCATED_IN"]

    def transform(self, docs: DataFrame):
        rec = docs.select(
            F.from_json(self.text_span(0), RECORD_SCHEMA).alias("r")
        ).select(
            F.col("r.asn").try_cast("long").alias("asn"),
            F.col("r.asnName").alias("name"),
            F.col("r.rank").alias("rank"),
            canon_cc(F.col("r.country.iso")).alias("cc"),
            F.col("r.latitude").alias("lat"),
            F.col("r.longitude").alias("lon"),
        ).filter(F.col("asn").isNotNull())
        rec = self.m(rec)

        named = rec.filter(F.col("name").isNotNull() & (F.col("name") != ""))
        in_country = rec.filter(F.col("cc").isNotNull() & (F.col("cc") != ""))
        located = rec.filter(
            F.col("lat").isNotNull() & F.col("lon").isNotNull()
            & (F.col("lat") != 0.0) & (F.col("lon") != 0.0)
        ).withColumn("position", F.concat_ws(",", F.col("lon"), F.col("lat")))
        ranking = rec.withColumn("ranking", F.lit("CAIDA ASRank")).withColumn(
            "rank_props",
            F.map_filter(
                F.create_map(
                    F.lit("asn"), F.col("asn").cast("string"),
                    F.lit("asnName"), F.col("name"),
                    F.lit("rank"), F.col("rank").cast("string"),
                    F.lit("country:iso"), F.col("cc"),
                    F.lit("latitude"), F.col("lat").cast("string"),
                    F.lit("longitude"), F.col("lon").cast("string"),
                ),
                lambda k, v: v.isNotNull(),  # null props dropped (ref :73-75)
            ),
        )

        nodes = [
            self.make_nodes(rec, "AS", "asn"),
            self.make_nodes(named, "Name", "name"),
            self.make_nodes(in_country, "Country", "cc"),
            self.make_nodes(located, "Point", "position"),
            self.make_nodes(ranking, "Ranking", "ranking"),
        ]
        # one-pass melt: all four predicates from a single parse of the
        # JSON span (a union of four branches would re-run from_json 4x)
        melted = ranking.withColumn(
            "position", F.concat_ws(",", F.col("lon"), F.col("lat"))
        )
        named_cond = F.col("name").isNotNull() & (F.col("name") != "")
        cc_cond = F.col("cc").isNotNull() & (F.col("cc") != "")
        loc_cond = (
            F.col("lat").isNotNull() & F.col("lon").isNotNull()
            & (F.col("lat") != 0.0) & (F.col("lon") != 0.0)
        )
        triples = [
            self.melt_triples(melted, "AS", "asn", [
                (named_cond, "NAME", "Name", "name", None),
                (cc_cond, "COUNTRY", "Country", "cc", None),
                (None, "RANK", "Ranking", "ranking", F.col("rank_props")),
                (loc_cond, "LOCATED_IN", "Point", "position", None),
            ])
        ]
        return nodes, triples
