"""openintel.dnsgraph — pre-computed DNS dependency graph edges.

Reference: iyp/crawlers/openintel/__init__.py:452-672 (DnsgraphCrawler) +
dnsgraph.py. Input lines are typed edges (from_nodeType/Key,
to_nodeType/Key, relation_name, properties). Reference behaviors kept:

- exact (edge, props) dedup — the same edge with DIFFERENT props stays
  multiple links (:545-569);
- root-dot strip for DOMAIN/HOSTNAME keys, '.' itself kept (:464-467,
  rstrip so trailing-dot runs collapse), IPv6 normalization for IP keys
  (:469-475);
- RESOLVES_TO props gain source=A|AAAA from the target address form
  (:556-558);
- typed link emission: PARENT Domain→Domain, PART_OF Host→Domain,
  ALIAS_OF Host→Host, MANAGED_BY Domain→Host, RESOLVES_TO Host→IP
  (:646-651);
- the CNAME walk (:476-484, :615-639): every hostname that reaches a
  resolving name through a chain of ALIAS_OF edges RESOLVES_TO that
  name's IPs with source=CNAME. The driver recursion becomes an
  iterative frontier join over the reversed alias edges with an
  accumulated-dedup anti-join — cycle-safe, O(chain depth) rounds;
- MANAGED_BY targets get the AuthoritativeNameServer label (:665-669).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..canon import compress_ip
from ..framework import SparkCrawler

EDGE_SCHEMA = ("from_nodeType string, from_nodeKey string, "
               "to_nodeType string, to_nodeKey string, "
               "relation_name string, "
               "properties map<string,string>")

MAX_CHAIN = 16  # CNAME chains are bounded in practice; loops cut by dedup


def _norm_key(node_type: F.Column, key: F.Column) -> F.Column:
    stripped = F.when(key == ".", key).otherwise(
        F.regexp_replace(key, r"\.+$", "")
    )
    return (
        F.when(node_type.isin("DOMAIN", "HOSTNAME"), stripped)
        .when(node_type == "IP", compress_ip(key))
        .otherwise(key)
    )


class OpenIntelDnsgraph(SparkCrawler):
    ORG = "OpenINTEL"
    URL = "https://storage.dacs.utwente.nl/sommeser-dnsdep"
    NAME = "openintel.dnsgraph"
    EXPECTED_PREDS = ["PARENT", "PART_OF", "ALIAS_OF", "MANAGED_BY",
                      "RESOLVES_TO"]

    def transform(self, docs: DataFrame):
        line = self.text_span(0)
        edges = self.m(
            docs.select(F.from_json(line, EDGE_SCHEMA).alias("r"))
            .select("r.*")
            .withColumn("src", _norm_key(F.col("from_nodeType"),
                                         F.col("from_nodeKey")))
            .withColumn("dst", _norm_key(F.col("to_nodeType"),
                                         F.col("to_nodeKey")))
            .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
            .withColumn(
                "props",
                F.when(
                    F.col("relation_name") == "RESOLVES_TO",
                    F.map_concat(
                        F.coalesce(F.col("properties"),
                                   F.create_map().cast("map<string,string>")),
                        F.create_map(
                            F.lit("source"),
                            F.when(F.col("dst").contains(":"), F.lit("AAAA"))
                            .otherwise(F.lit("A")),
                        ),
                    ),
                ).otherwise(F.col("properties")),
            )
            # exact (edge, props) dedup; differing props stay (:545-569).
            # Maps can't be set-operation keys — dedup on the sorted
            # entry array instead.
            .withColumn(
                "_props_key",
                F.array_sort(F.map_entries(F.coalesce(
                    F.col("props"),
                    F.create_map().cast("map<string,string>"),
                ))),
            )
            .dropDuplicates(["relation_name", "from_nodeType", "src",
                             "to_nodeType", "dst", "_props_key"])
            .drop("_props_key")
        )

        def rel(rn, ft, tt):
            return edges.filter(
                (F.col("relation_name") == rn)
                & (F.col("from_nodeType") == ft) & (F.col("to_nodeType") == tt)
            )

        parent = rel("PARENT", "DOMAIN", "DOMAIN")
        part_of = rel("PART_OF", "HOSTNAME", "DOMAIN")
        alias_of = self.m(rel("ALIAS_OF", "HOSTNAME", "HOSTNAME"))
        managed_by = rel("MANAGED_BY", "DOMAIN", "HOSTNAME")
        resolves = self.m(rel("RESOLVES_TO", "HOSTNAME", "IP"))

        # CNAME closure: ips flow from resolving names up the reversed
        # alias edges (recurse_cnames, :476-484). The SEEN set is seeded
        # with the direct (name, ip) resolves pairs — the reference seeds
        # processed_cnames with the start name (:482), so a name that
        # resolves directly must never re-enter through an alias cycle
        # and pick up a spurious source=CNAME link for an ip it already
        # resolves to.
        aliases = alias_of.select(F.col("src").alias("alias"),
                                  F.col("dst").alias("target")).distinct()
        direct = (
            resolves.select(F.col("src").alias("name"),
                            F.col("dst").alias("ip"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        acc = self.spark.createDataFrame([], "name string, ip string")
        seen = direct  # excluded from emission, blocks cycle re-entry
        frontier = direct
        for _ in range(MAX_CHAIN):
            step = (
                aliases.join(frontier, aliases.target == frontier.name)
                .select(F.col("alias").alias("name"), "ip")
                .distinct()
                .join(seen, ["name", "ip"], "left_anti")
                .localCheckpoint(eager=True)  # cut the growing lineage
            )
            if step.isEmpty():
                break
            seen = seen.unionByName(step).localCheckpoint(eager=True)
            acc = acc.unionByName(step)
            frontier = step
        cname_links = acc.withColumn(
            "props", F.create_map(F.lit("source"), F.lit("CNAME"))
        )

        ns_hosts = managed_by.select(F.col("dst").alias("ns")).distinct()
        nodes = [
            self.make_nodes(parent, "DomainName", "src"),
            self.make_nodes(parent, "DomainName", "dst"),
            self.make_nodes(part_of, "HostName", "src"),
            self.make_nodes(part_of, "DomainName", "dst"),
            self.make_nodes(alias_of, "HostName", "src"),
            self.make_nodes(alias_of, "HostName", "dst"),
            self.make_nodes(managed_by, "DomainName", "src"),
            self.make_nodes(ns_hosts, "HostName", "ns",
                            extra_labels=["AuthoritativeNameServer"]),
            self.make_nodes(resolves, "HostName", "src"),
            self.make_nodes(resolves, "IP", "dst"),
            self.make_nodes(cname_links, "HostName", "name"),
        ]
        p = F.col("props")
        triples = [
            self.make_triples(parent, "PARENT", "DomainName", "src",
                              "DomainName", "dst", props_col=p),
            self.make_triples(part_of, "PART_OF", "HostName", "src",
                              "DomainName", "dst", props_col=p),
            self.make_triples(alias_of, "ALIAS_OF", "HostName", "src",
                              "HostName", "dst", props_col=p),
            self.make_triples(managed_by, "MANAGED_BY", "DomainName", "src",
                              "HostName", "dst", props_col=p),
            self.make_triples(resolves, "RESOLVES_TO", "HostName", "src",
                              "IP", "dst", props_col=p),
            self.make_triples(cname_links, "RESOLVES_TO", "HostName", "name",
                              "IP", "ip", props_col=p),
        ]
        return nodes, triples


class OpenIntelDnsgraphCrux(OpenIntelDnsgraph):
    """ref openintel/dnsgraph_crux.py — single-dataset shell."""

    NAME = "openintel.dnsgraph_crux"


class OpenIntelDnsgraphJp(OpenIntelDnsgraph):
    """ref openintel/dnsgraph_jp.py."""

    NAME = "openintel.dnsgraph_jp"


class OpenIntelDnsgraphNl(OpenIntelDnsgraph):
    """ref openintel/dnsgraph_nl.py."""

    NAME = "openintel.dnsgraph_nl"


class OpenIntelDnsgraphRdns(OpenIntelDnsgraph):
    """ref openintel/dnsgraph_rdns.py."""

    NAME = "openintel.dnsgraph_rdns"
