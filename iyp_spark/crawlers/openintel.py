"""openintel — DNS measurement graph: RESOLVES_TO / MANAGED_BY / ALIAS_OF /
PART_OF, with transitive CNAME-chain resolution (J10).

Reference: iyp/crawlers/openintel/__init__.py:253-443. Semantics:

- keep A/AAAA/NS queries answered by A/AAAA/NS/CNAME with ≥1 value field,
  exact-duplicate rows dropped (:253-276);
- trailing root dots stripped (:279-282);
- NS: DomainName(response) -MANAGED_BY-> HostName(ns_address), the ns
  host additionally labeled AuthoritativeNameServer (:350-351);
- A/AAAA: HostName(response) -RESOLVES_TO{source}-> IP (IPv6 compressed);
  the CNAME chain for the same (query_name, query_type) is walked upward
  and every alias also RESOLVES_TO the ip with source CNAME (:372-430);
- CNAME rows (A/AAAA queries only): HostName -ALIAS_OF-> HostName;
- host∩domain names: HostName -PART_OF-> DomainName (:436-437).

Spark plan: the reference's per-row dict walk becomes an iterative join to
fixpoint over the alias edges, scoped by (query_name, query_type) — chains
are short, so 2-3 rounds; sources aggregate via sort_array(collect_set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..canon import compress_ip
from ..framework import SparkCrawler

REC_SCHEMA = T.StructType([
    T.StructField("query_type", T.StringType()),
    T.StructField("query_name", T.StringType()),
    T.StructField("response_type", T.StringType()),
    T.StructField("response_name", T.StringType()),
    T.StructField("ip4_address", T.StringType()),
    T.StructField("ip6_address", T.StringType()),
    T.StructField("ns_address", T.StringType()),
    T.StructField("cname_name", T.StringType()),
])

_FIELDS = [f.name for f in REC_SCHEMA.fields]


def _strip_dot(col):
    return F.regexp_replace(col, r"\.$", "")


class OpenIntel(SparkCrawler):
    ORG = "OpenINTEL"
    URL = "https://data.openintel.nl/data/tranco1m"
    NAME = "openintel.tranco1m"
    EXPECTED_PREDS = ["RESOLVES_TO", "MANAGED_BY", "ALIAS_OF", "PART_OF"]

    def transform(self, docs: DataFrame):
        raw = docs.select(
            F.from_json(self.text_span(0), REC_SCHEMA).alias("r")
        ).select("r.*")
        rec = self.m(
            raw.dropDuplicates(_FIELDS)  # ref :276
            .filter(
                F.col("query_type").isin("A", "AAAA", "NS")
                & F.col("response_type").isin("A", "AAAA", "NS", "CNAME")
                & (
                    F.col("ip4_address").isNotNull()
                    | F.col("ip6_address").isNotNull()
                    | F.col("ns_address").isNotNull()
                    | F.col("cname_name").isNotNull()
                )
            )
            .select(
                F.col("query_type").alias("qt"),
                _strip_dot(F.col("query_name")).alias("qn"),
                F.col("response_type").alias("rt"),
                _strip_dot(F.col("response_name")).alias("rn"),
                F.col("ip4_address").alias("ip4"),
                compress_ip(F.col("ip6_address")).alias("ip6"),
                _strip_dot(F.col("ns_address")).alias("ns"),
                _strip_dot(F.col("cname_name")).alias("cname"),
            )
        )

        ns_rows = rec.filter((F.col("rt") == "NS") & F.col("ns").isNotNull())
        direct = self.m(
            rec.filter(
                ((F.col("rt") == "A") & F.col("ip4").isNotNull())
                | ((F.col("rt") == "AAAA") & F.col("ip6").isNotNull())
            ).select(
                "qn", "qt", F.col("rn").alias("host"),
                F.when(F.col("rt") == "A", F.col("ip4"))
                .otherwise(F.col("ip6")).alias("ip"),
                F.col("rt").alias("source"),
            )
        )
        alias_rows = self.m(
            rec.filter(
                (F.col("rt") == "CNAME") & F.col("qt").isin("A", "AAAA")
                & F.col("cname").isNotNull()
            ).select("qn", "qt", F.col("rn").alias("parent"),
                     F.col("cname").alias("child"))
        )

        # transitive CNAME resolution: iterative join to fixpoint (J10),
        # scoped per (query_name, query_type) like the reference dict
        frontier = direct.select("qn", "qt", "host", "ip")
        transitive = None
        for _ in range(10):
            nxt = (
                frontier.alias("f")
                .join(
                    alias_rows.alias("e"),
                    (F.col("f.qn") == F.col("e.qn"))
                    & (F.col("f.qt") == F.col("e.qt"))
                    & (F.col("f.host") == F.col("e.child")),
                )
                .select(
                    F.col("f.qn").alias("qn"), F.col("f.qt").alias("qt"),
                    F.col("e.parent").alias("host"), F.col("f.ip").alias("ip"),
                    F.lit("CNAME").alias("source"),
                )
                .localCheckpoint(eager=True)
            )
            if nxt.limit(1).count() == 0:
                break
            transitive = nxt if transitive is None else transitive.unionByName(nxt)
            frontier = nxt

        resolves = direct.select("host", "ip", "source")
        if transitive is not None:
            resolves = resolves.unionByName(transitive.select("host", "ip", "source"))
        resolves_agg = self.m(
            resolves.groupBy("host", "ip").agg(
                F.array_join(F.array_sort(F.collect_set("source")), ";").alias("srcs")
            ).withColumn(
                "link_props", F.create_map(F.lit("source"), F.col("srcs"))
            )
        )

        aliases = alias_rows.select("parent", "child").distinct()
        domains = ns_rows.select(F.col("rn").alias("d")).distinct()
        hosts = (
            direct.select(F.col("host").alias("h"))
            .unionByName(alias_rows.select(F.col("parent").alias("h")))
            .unionByName(alias_rows.select(F.col("child").alias("h")))
            .unionByName(alias_rows.select(F.col("qn").alias("h")))
            .distinct()
        )
        part_of = hosts.join(domains, hosts.h == domains.d)

        nodes = [
            self.make_nodes(domains, "DomainName", "d"),
            self.make_nodes(hosts, "HostName", "h"),
            self.make_nodes(ns_rows, "HostName", "ns",
                            extra_labels=["AuthoritativeNameServer"]),
            self.make_nodes(resolves_agg, "IP", "ip"),
        ]
        triples = [
            self.make_triples(ns_rows, "MANAGED_BY", "DomainName", "rn",
                              "HostName", "ns"),
            self.make_triples(resolves_agg, "RESOLVES_TO", "HostName", "host",
                              "IP", "ip", props_col=F.col("link_props")),
            self.make_triples(aliases, "ALIAS_OF", "HostName", "parent",
                              "HostName", "child"),
            self.make_triples(part_of, "PART_OF", "HostName", "h",
                              "DomainName", "d"),
        ]
        return nodes, triples


class OpenIntelInfraNs(OpenIntel):
    """openintel.infra_ns — same shared transform over the infra:ns
    dataset partition (ref openintel/infra_ns.py:11-17: the subclass only
    changes DATASETS; the closed-bucket fetch is out-of-engine here)."""

    URL = "https://data.openintel.nl"
    NAME = "openintel.infra_ns"


class OpenIntelUmbrella1M(OpenIntel):
    """openintel.umbrella1m — umbrella toplist flavor
    (ref openintel/umbrella1m.py)."""

    URL = "https://data.openintel.nl/data/umbrella1m"
    NAME = "openintel.umbrella1m"


class OpenIntelInfraMx(OpenIntel):
    """openintel.infra_mx (ref openintel/infra_mx.py)."""

    URL = "https://data.openintel.nl"
    NAME = "openintel.infra_mx"


class OpenIntelCrux(OpenIntel):
    """openintel.crux — per-country CrUX toplist measurement
    (ref openintel/crux.py; the country enumeration is fetch-side)."""

    URL = "https://data.openintel.nl"
    NAME = "openintel.crux"


class OpenIntelToplist(OpenIntel):
    """openintel.toplist — umbrella+tranco+crux combined
    (ref openintel/toplist.py; the merge is fetch-side concat, the
    transform is identical)."""

    URL = "https://openintel.nl/download/forward-dns/basis=toplist/"
    NAME = "openintel.toplist"
