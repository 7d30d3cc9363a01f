"""alice_lg — route-server looking-glass crawler (DE-CIX instance).

Reference: iyp/crawlers/alice_lg/__init__.py (shared base; decix.py is the
config shell). The reference fetches /routeservers → /neighbors (→ optional
/routes/received), builds a radix tree of PeeringLAN prefixes from the graph
(:344-369), and maps each member IP to its IXP with search_best. Here:

- one document per *neighbors page* (routeserver_id + api.cache_status +
  neighbor list) and per *routes page* (imported route list) — the fetcher's
  pagination is out-of-engine, pages are document rows;
- member-IP → PeeringLAN is the shared fine/coarse LPM join (``lpm.py``) —
  the one crawler-side consumer of the interval machinery; most-specific
  selection is a prefixlen-desc window per neighbor (search_best, :352);
- the RFC3339-nano cached_at fixup (:213-238) is ``canon.parse_rfc3339_nano``
  and lands per-row in reference_time_modification (:390-397) — each
  MEMBER_OF link carries its routeserver's cache time;
- the flatdict neighbor flatten with empty-dict removal (:381-424) is a
  static struct flatten into a colon-keyed props map, nulls filtered;
- malformed member ASNs (null / 0 after a strict long parse) drop (:373-376);
- optional received routes → AS(as_path[-1]) ORIGINATE BGPPrefix with
  FlatterDict-style ``bgp:as_path:<i>`` props (:430-457).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..canon import compress_prefix, parse_rfc3339_nano
from ..framework import SparkCrawler
from ..lpm import lpm_candidates, prefix_intervals, probe_hex

NEIGHBOR_FIELDS = T.ArrayType(T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("address", T.StringType()),
    T.StructField("asn", T.LongType()),
    T.StructField("state", T.StringType()),
    T.StructField("description", T.StringType()),
    T.StructField("routes_received", T.LongType()),
    T.StructField("details", T.StructType([
        T.StructField("route_changes", T.LongType()),
        T.StructField("filtered", T.LongType()),
    ])),
]))

NEIGHBORS_SCHEMA = T.StructType([
    T.StructField("routeserver_id", T.StringType()),
    T.StructField("api", T.StructType([
        T.StructField("cache_status", T.StructType([
            T.StructField("cached_at", T.StringType()),
        ])),
    ])),
    # spelling is not consistent across deployments (:245-251)
    T.StructField("neighbors", NEIGHBOR_FIELDS),
    T.StructField("neighbours", NEIGHBOR_FIELDS),
])

ROUTES_SCHEMA = T.StructType([
    T.StructField("routeserver_id", T.StringType()),
    T.StructField("neighbor_id", T.StringType()),
    T.StructField("imported", T.ArrayType(T.StructType([
        T.StructField("network", T.StringType()),
        T.StructField("bgp", T.StructType([
            T.StructField("as_path", T.ArrayType(T.LongType())),
        ])),
    ]))),
])


class AliceLgDecix(SparkCrawler):
    ORG = "Alice-LG"
    URL = "https://lg.de-cix.net/api/v1"
    NAME = "alice_lg.decix"
    EXPECTED_PREDS = ["MEMBER_OF", "ORIGINATE"]
    NEEDS_EXISTING = True
    WAVE = 4  # LPMs against PeeringLANs from peeringdb.ix (2) + caida.ixs (3)

    def _peering_lans(self) -> DataFrame:
        """The __get_peering_lans query (:344-354): PeeringLAN → IXP."""
        return (
            self.store.read_triples()
            .filter((F.col("pred") == "MANAGED_BY")
                    & (F.col("subj_label") == "PeeringLAN")
                    & (F.col("obj_label") == "IXP"))
            .select(F.col("subj_key").alias("lan"), F.col("obj_key").alias("ixp"))
            .dropDuplicates(["lan", "ixp"])
        )

    def transform(self, docs: DataFrame):
        kind = self.text_span(0)
        payload = self.text_span(1)

        pages = (
            docs.filter(kind == "neighbors")
            .select(F.from_json(payload, NEIGHBORS_SCHEMA).alias("r"))
            .select(
                F.col("r.routeserver_id").alias("routeserver_id"),
                parse_rfc3339_nano(F.col("r.api.cache_status.cached_at"))
                .alias("cached_at"),
                F.explode(F.coalesce(F.col("r.neighbors"), F.col("r.neighbours")))
                .alias("n"),
            )
        )
        neighbors = pages.select(
            "routeserver_id", "cached_at", "n.*",
        ).filter(
            F.col("asn").isNotNull() & (F.col("asn") != 0)  # :373-376
            & F.col("address").isNotNull()
        ).withColumn(
            # dict(flatdict.FlatDict(neighbor)) with empty-dict removal
            "flat_neighbor",
            F.map_filter(
                F.create_map(
                    F.lit("id"), F.col("id"),
                    F.lit("address"), F.col("address"),
                    F.lit("asn"), F.col("asn").cast("string"),
                    F.lit("state"), F.col("state"),
                    F.lit("description"), F.col("description"),
                    F.lit("routes_received"),
                    F.col("routes_received").cast("string"),
                    F.lit("routeserver_id"), F.col("routeserver_id"),
                    F.lit("details:route_changes"),
                    F.col("details.route_changes").cast("string"),
                    F.lit("details:filtered"),
                    F.col("details.filtered").cast("string"),
                ),
                lambda k, v: v.isNotNull(),
            ),
        )

        # member IP → most-specific PeeringLAN (search_best, :352): fine/
        # coarse bucketed candidate join + prefixlen-desc window. ixp asc
        # breaks exact-duplicate-prefix ties deterministically.
        lans = prefix_intervals(self._peering_lans(), "lan")
        probes = probe_hex(neighbors, "address")
        w = Window.partitionBy("routeserver_id", "id", "address").orderBy(
            F.col("prefixlen").desc(), F.col("ixp").asc()
        )
        members = self.m(
            lpm_candidates(probes, lans)
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )

        routes = self.m(
            docs.filter(kind == "routes")
            .select(F.from_json(payload, ROUTES_SCHEMA).alias("r"))
            .select(
                F.col("r.routeserver_id").alias("routeserver_id"),
                F.explode("r.imported").alias("rt"),
            )
            .withColumn("prefix", compress_prefix(F.col("rt.network")))
            .filter(F.col("prefix").isNotNull())
            .withColumn("origin",
                        F.try_element_at(F.col("rt.bgp.as_path"), F.lit(-1)))
            .filter(F.col("origin").isNotNull())
            .withColumn(
                # dict(flatdict.FlatterDict(route)): list indices become
                # colon-separated key segments (:441-453)
                "flat_route",
                F.map_concat(
                    F.create_map(
                        F.lit("network"), F.col("rt.network"),
                        F.lit("routeserver_id"), F.col("routeserver_id"),
                    ),
                    F.map_from_entries(
                        F.transform(
                            F.col("rt.bgp.as_path"),
                            lambda x, i: F.struct(
                                F.concat(F.lit("bgp:as_path:"),
                                         i.cast("string")).alias("key"),
                                x.cast("string").alias("value"),
                            ),
                        )
                    ),
                ),
            )
        )

        nodes = [
            self.make_nodes(members, "AS", "asn"),
            self.make_nodes(routes, "AS", "origin"),
            self.make_nodes(routes, "BGPPrefix", "prefix",
                            extra_labels=["Prefix"]),
        ]
        triples = [
            self.make_triples(members, "MEMBER_OF", "AS", "asn", "IXP", "ixp",
                              props_col=F.col("flat_neighbor"),
                              time_mod_col=F.col("cached_at")),
            self.make_triples(routes, "ORIGINATE", "AS", "origin",
                              "BGPPrefix", "prefix",
                              props_col=F.col("flat_route")),
        ]
        return nodes, triples


class AliceLgAmsix(AliceLgDecix):
    """ref iyp/crawlers/alice_lg/amsix.py — config shell over the base."""

    URL = "https://lg.ams-ix.net/api/v1"
    NAME = "alice_lg.amsix"


class AliceLgLinx(AliceLgDecix):
    """ref iyp/crawlers/alice_lg/linx.py."""

    URL = "https://alice-rs.linx.net/api/v1"
    NAME = "alice_lg.linx"


def _instance(name_suffix: str, url: str):
    """Shell factory for the remaining looking glasses — each reference
    module (alice_lg/<ix>.py) is a config-only subclass of the base."""

    cls = type(
        f"AliceLg{name_suffix.capitalize()}",
        (AliceLgDecix,),
        {"URL": url, "NAME": f"alice_lg.{name_suffix}",
         "__doc__": f"ref iyp/crawlers/alice_lg/{name_suffix}.py."},
    )
    return cls


AliceLgBcix = _instance("bcix", "https://lg.bcix.de/api/v1")
AliceLgDdix = _instance("ddix", "https://lg.ddix.de/api/v1")
AliceLgIxAustralia = _instance("ixaustralia", "https://lg.ix.asn.au/api/v1")
AliceLgIxBr = _instance("ixbr", "https://lg.ix.br/api/v1")
AliceLgMegaport = _instance("megaport", "https://lg.megaport.com/api/v1")
AliceLgNetnod = _instance("netnod", "https://lg.netnod.se/api/v1")
AliceLgNzix = _instance("nzix", "https://lg.ix.nz/api/v1")
AliceLgPix = _instance("pix", "https://lg.pix.net.pk/api/v1")
AliceLgSfmix = _instance("sfmix", "https://lg.sfmix.org/api/v1")
AliceLgSix = _instance("six", "https://lg.seattleix.net/api/v1")
AliceLgTopix = _instance("topix", "https://lg.top-ix.org/api/v1")
