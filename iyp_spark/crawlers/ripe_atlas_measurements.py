"""ripe.atlas_measurements — Atlas measurement inventory + probe links.

Reference: iyp/crawlers/ripe/atlas_measurements.py:64-266. Paginated pages;
per measurement:

- duplicate ids collapse (:171-175);
- the target is hostname-or-IP: an empty or IP-literal ``target`` is no
  hostname (:185-188);
- resolved IPs: ``resolved_ips`` takes precedence over ``target_ip``,
  scalars wrapped to lists, blanks dropped, compressed when af=6
  (:115-121, :181-183);
- AtlasMeasurement -TARGET-> AS / HostName / IP (:228-247);
- AtlasProbe -PART_OF-> AtlasMeasurement for current_probes, EXCLUDING
  probes that never connected or are abandoned — a graph read of
  AtlasProbe.status_id ∈ {0, 3} (:133-140, the reason this is a
  NEEDS_EXISTING crawler reading ripe.atlas_probes' node props).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..canon import compress_ip
from ..framework import SparkCrawler

MEASUREMENT = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("af", T.IntegerType()),
    T.StructField("type", T.StringType()),
    T.StructField("target", T.StringType()),
    T.StructField("target_asn", T.LongType()),
    T.StructField("target_ip", T.StringType()),
    T.StructField("resolved_ips", T.ArrayType(T.StringType())),
    T.StructField("current_probes", T.ArrayType(T.LongType())),
])

PAGE = T.StructType([T.StructField("results", T.ArrayType(MEASUREMENT))])

_IP_RE = r"^(\d{1,3}(\.\d{1,3}){3}|[0-9a-fA-F:]*:[0-9a-fA-F:]*)$"


class RipeAtlasMeasurements(SparkCrawler):
    ORG = "RIPE NCC"
    URL = "https://atlas.ripe.net/api/v2/measurements"
    NAME = "ripe.atlas_measurements"
    EXPECTED_PREDS = ["TARGET", "PART_OF"]
    NEEDS_EXISTING = True  # reads AtlasProbe.status_id from the dictionary

    def _abandoned_probes(self) -> DataFrame:
        """status_id 0 (never connected) / 3 (abandoned) (:133-140)."""
        return (
            self.store.read_nodes("AtlasProbe")
            .filter(F.col("props")["status_id"].isin("0", "3"))
            .select(F.col("key").try_cast("long").alias("prb_id"))
        )

    def transform(self, docs: DataFrame):
        payload = self.text_span(0)
        ms = self.m(
            docs.select(F.explode(F.from_json(payload, PAGE)["results"])
                        .alias("p"))
            .select("p.*")
            .filter(F.col("id").isNotNull())
            .dropDuplicates(["id"])
            .withColumn(
                "hostname",
                F.when(
                    F.col("target").isNotNull() & (F.col("target") != "")
                    & ~F.col("target").rlike(_IP_RE),
                    F.col("target"),
                ),
            )
            .withColumn(
                "ips_raw",
                F.filter(
                    F.coalesce(
                        F.col("resolved_ips"),
                        F.when(F.col("target_ip").isNotNull(),
                               F.array(F.col("target_ip"))),
                        F.array().cast("array<string>"),
                    ),
                    lambda x: x.isNotNull() & (x != ""),
                ),
            )
        )
        ips = self.m(
            ms.select("id", "af", F.explode("ips_raw").alias("raw_ip"))
            .withColumn(
                "ip",
                F.when(F.col("af") == 6, compress_ip(F.col("raw_ip")))
                .otherwise(F.col("raw_ip")),
            )
            .filter(F.col("ip").isNotNull())
        )
        with_asn = ms.filter(F.col("target_asn").isNotNull()
                             & (F.col("target_asn") != 0))
        with_host = ms.filter(F.col("hostname").isNotNull())
        probes = self.m(
            ms.select("id", F.explode("current_probes").alias("prb_id"))
            .join(F.broadcast(self._abandoned_probes()), "prb_id",
                  "left_anti")
        )
        nodes = [
            self.make_nodes(ms, "AtlasMeasurement", "id"),
            self.make_nodes(with_asn, "AS", "target_asn"),
            self.make_nodes(with_host, "HostName", "hostname"),
            self.make_nodes(ips, "IP", "ip"),
            self.make_nodes(probes, "AtlasProbe", "prb_id"),
        ]
        triples = [
            self.make_triples(with_asn, "TARGET", "AtlasMeasurement", "id",
                              "AS", "target_asn"),
            self.make_triples(with_host, "TARGET", "AtlasMeasurement", "id",
                              "HostName", "hostname"),
            self.make_triples(ips, "TARGET", "AtlasMeasurement", "id",
                              "IP", "ip"),
            self.make_triples(probes, "PART_OF", "AtlasProbe", "prb_id",
                              "AtlasMeasurement", "id"),
        ]
        return nodes, triples
