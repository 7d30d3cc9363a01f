"""ihr.country_dependency — per-country AS hegemony rankings.

Reference: iyp/crawlers/ihr/country_dependency.py:42-113. Per country the
reference finds the latest timebin (:61-64), filters each weightscheme to
transitonly=False ∧ hege>0.01 ∧ timebin=latest (:89-95), sorts by hege desc
and assigns rank i+1 (:97-101) — the A6 latest-per-group + W1 ranking pair.

Here all countries are ONE DataFrame program: the driver-side per-country
loop becomes a (cc) window max for the latest timebin and a
(cc, weightscheme) row_number window for the rank — one shuffle each
instead of |countries| API round-trips.

Two Ranking nodes per country ('IHR country ranking: Total eyeball (CC)' /
'Total AS (CC)'), each linked COUNTRY → Country whenever the country has
any results (:80-86 — the links exist even if every row fails the hege
filter), and AS -RANK-> Ranking links carrying the record + rank props.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..framework import SparkCrawler

MIN_HEGE = 0.01

RESULTS_SCHEMA = T.StructType([
    T.StructField("results", T.ArrayType(T.StructType([
        T.StructField("timebin", T.StringType()),
        T.StructField("asn", T.LongType()),
        T.StructField("hege", T.DoubleType()),
        T.StructField("weightscheme", T.StringType()),
        T.StructField("transitonly", T.BooleanType()),
    ]))),
])

METRICS = [("Total eyeball", "eyeball"), ("Total AS", "as")]


class IhrCountryDependency(SparkCrawler):
    ORG = "IHR"
    URL = "https://ihr.iijlab.net/ihr/api/hegemony/countries/"
    NAME = "ihr.country_dependency"
    EXPECTED_PREDS = ["RANK", "COUNTRY"]

    def transform(self, docs: DataFrame):
        cc = self.text_span(0)
        payload = self.text_span(1)
        rows = self.m(
            docs.select(
                cc.alias("cc"),
                F.explode(F.from_json(payload, RESULTS_SCHEMA)["results"])
                .alias("r"),
            )
            .select("cc", "r.*")
            .withColumn(
                "ts", F.try_to_timestamp(F.col("timebin"),
                                         F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'"))
            )
        )
        latest = rows.withColumn(
            "last_ts", F.max("ts").over(Window.partitionBy("cc"))
        )
        weight_col = F.create_map(
            *[c for m, w in METRICS for c in (F.lit(w), F.lit(m))]
        )[F.col("weightscheme")]
        selected = (
            latest.filter(
                (F.col("ts") == F.col("last_ts"))
                & (F.col("transitonly") == False)  # noqa: E712
                & (F.col("hege") > MIN_HEGE)
                & weight_col.isNotNull()
            )
            .withColumn("metric", weight_col)
            .withColumn(
                "rank",
                F.row_number().over(
                    Window.partitionBy("cc", "metric")
                    .orderBy(F.col("hege").desc(), F.col("asn").asc())
                ),
            )
        )
        ranked = self.m(
            selected.withColumn(
                "ranking",
                F.concat(F.lit("IHR country ranking: "), F.col("metric"),
                         F.lit(" ("), F.col("cc"), F.lit(")")),
            ).withColumn(
                "link_props",
                F.map_filter(
                    F.create_map(
                        F.lit("timebin"), F.col("timebin"),
                        F.lit("asn"), F.col("asn").cast("string"),
                        F.lit("hege"), F.col("hege").cast("string"),
                        F.lit("weightscheme"), F.col("weightscheme"),
                        F.lit("transitonly"),
                        F.col("transitonly").cast("string"),
                        F.lit("rank"), F.col("rank").cast("string"),
                    ),
                    lambda k, v: v.isNotNull(),
                ),
            )
        )
        # Ranking + COUNTRY links exist for BOTH metrics for every country
        # with any results at all (:80-86), filters notwithstanding
        metric_lit = F.explode(
            F.array(*[F.lit(m) for m, _ in METRICS])
        ).alias("metric")
        per_country = self.m(
            docs.select(cc.alias("cc"),
                        F.from_json(payload, RESULTS_SCHEMA)["results"]
                        .alias("results"))
            .filter(F.size("results") > 0)
            .select("cc", metric_lit)
            .withColumn(
                "ranking",
                F.concat(F.lit("IHR country ranking: "), F.col("metric"),
                         F.lit(" ("), F.col("cc"), F.lit(")")),
            )
        )
        nodes = [
            self.make_nodes(per_country, "Country", "cc"),
            self.make_nodes(per_country, "Ranking", "ranking"),
            self.make_nodes(ranked, "AS", "asn"),
        ]
        triples = [
            self.make_triples(per_country, "COUNTRY", "Ranking", "ranking",
                              "Country", "cc"),
            self.make_triples(ranked, "RANK", "AS", "asn",
                              "Ranking", "ranking",
                              props_col=F.col("link_props")),
        ]
        return nodes, triples
