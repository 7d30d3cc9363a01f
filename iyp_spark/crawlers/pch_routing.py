"""pch.daily_routing_snapshots — ORIGINATE triples from Cisco-style
``show ip bgp`` collector snapshots.

Reference: iyp/crawlers/pch/__init__.py:203-251 + pch/show_bgp_parser.py:
66-244. The parser is stateful across lines (wrapped route lines are
re-assembled; a missing network field inherits the previous line's prefix;
classful addresses get their length inferred from the leading bits), so it
cannot be a per-row column expression: each collector file is ONE document
and the parse runs inside ``mapInPandas`` — one Arrow batch of whole files
in, route rows out (the reference parallelizes the same way with a
process Pool, pch/__init__.py:214-216).

Kept semantics: only routes with the 'valid' ('*') status, non-'?' origin,
non-empty AS path, and non-AS-set origin produce (origin AS → prefix)
pairs (show_bgp_parser.py:149-183); per (asn, prefix) the collectors that
saw it aggregate into count + seen_by_collectors props
(pch/__init__.py:222-249).

NOTE: this parser is a from-scratch reimplementation of the documented
line grammar, not a copy of the reference code.
"""

from __future__ import annotations

import ipaddress
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..framework import SparkCrawler

_STATUS_CHARS = set("sdhu*>=irSR")
_ORIGIN_CODES = {"i", "e", "?"}
_AS_HOP = re.compile(r"^([0-9]+|\{[0-9]+(,[0-9]+)*\})$")

ROUTE_SCHEMA = T.StructType([
    T.StructField("collector", T.StringType(), False),
    T.StructField("prefix", T.StringType(), False),
    T.StructField("asn", T.LongType(), False),
])


def _classful_length(addr: ipaddress.IPv4Address) -> int | None:
    """RFC 791 classful prefix length from the leading bits."""
    first = int(addr) >> 24
    if first < 128:
        return 8
    if first < 192:
        return 16
    if first < 224:
        return 24
    return None


def parse_show_ip_bgp(collector: str, text: str, af: int = 4):
    """Yield (prefix, origin_asn) pairs from one collector snapshot."""
    line_iter = iter(text.splitlines())
    # skip preamble until the column header
    for line in line_iter:
        if line.lstrip().startswith("Network"):
            break
    else:
        return
    last_prefix = None
    for line in line_iter:
        toks = line.strip().split()
        if not toks:
            break  # end of table
        # wrapped route rows: pull in continuation lines
        limit = 2 if af == 4 else 3
        while len(toks) <= limit:
            cont = next(line_iter, "")
            more = cont.strip().split()
            if not more:
                break
            toks += more
            if af == 4:
                break
        # optional status-code token (IPv6 addresses contain 'd' → exclude ':')
        statuses = set()
        if ":" not in toks[0] and set(toks[0]) & _STATUS_CHARS and not toks[0][0].isdigit():
            statuses = set(toks.pop(0))
        # network field: explicit CIDR / classful / inherited
        if "/" in toks[0]:
            prefix = toks.pop(0)
            last_prefix = prefix
        elif len(toks) > 1 and not toks[1].isdigit():
            try:
                addr = ipaddress.IPv4Address(toks.pop(0))
            except ipaddress.AddressValueError:
                continue
            plen = _classful_length(addr)
            if plen is None:
                continue
            prefix = f"{addr}/{plen}"
            last_prefix = prefix  # inheritable, like any parsed network (:244)
        else:
            prefix = last_prefix
        if prefix is None or len(toks) < 4:
            continue
        next_hop, metric, weight = toks[0], toks[1], toks[2]
        path, origin_code = toks[3:-1], toks[-1]
        # validity checks (show_bgp_parser.py __valid_route)
        try:
            net_cls = ipaddress.IPv4Network if af == 4 else ipaddress.IPv6Network
            addr_cls = ipaddress.IPv4Address if af == 4 else ipaddress.IPv6Address
            net = net_cls(prefix)
            addr_cls(next_hop)
        except ValueError:
            continue
        if not (metric.isdigit() and weight.isdigit()):
            continue
        if not statuses or origin_code not in _ORIGIN_CODES:
            continue
        if any(not _AS_HOP.match(h) for h in path):
            continue
        # prefix-map rules: valid status, complete origin, real origin AS
        if "*" not in statuses or origin_code == "?" or not path:
            continue
        origin = path[-1].strip("{}")
        if "," in origin:
            continue  # AS set — ambiguous origin
        yield net.compressed, int(origin)


class PchRoutingV4(SparkCrawler):
    ORG = "Packet Clearing House"
    URL = "https://www.pch.net/resources/Routing_Data/IPv4_daily_snapshots/"
    NAME = "pch.daily_routing_snapshots_v4"
    EXPECTED_PREDS = ["ORIGINATE"]
    AF = 4

    def transform(self, docs: DataFrame):
        af = self.AF

        def parse_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {"collector": [], "prefix": [], "asn": []}
                for collector, text in zip(pdf["collector"], pdf["snapshot"]):
                    for prefix, asn in parse_show_ip_bgp(collector, text, af):
                        out["collector"].append(collector)
                        out["prefix"].append(prefix)
                        out["asn"].append(asn)
                yield pd.DataFrame(out)

        routes = docs.select(
            self.text_span(0).alias("collector"),
            self.text_span(1).alias("snapshot"),
        ).mapInPandas(parse_batch, ROUTE_SCHEMA)

        # per (asn, prefix): collector set + count (A2 group→set)
        mentions = self.m(
            routes.dropDuplicates(["collector", "prefix", "asn"])
            .groupBy("asn", "prefix")
            .agg(F.array_sort(F.collect_set("collector")).alias("collectors"))
            .withColumn(
                "link_props",
                F.create_map(
                    F.lit("count"), F.size("collectors").cast("string"),
                    F.lit("seen_by_collectors"),
                    F.array_join(F.col("collectors"), ";"),
                ),
            )
        )
        nodes = [
            self.make_nodes(mentions, "AS", "asn"),
            self.make_nodes(mentions, "BGPPrefix", "prefix",
                            extra_labels=["Prefix"]),
        ]
        triples = [
            self.make_triples(mentions, "ORIGINATE", "AS", "asn",
                              "BGPPrefix", "prefix", props_col=F.col("link_props"))
        ]
        return nodes, triples


class PchRoutingV6(PchRoutingV4):
    """ref pch/daily_routing_snapshots_v6.py — af=6 instance; the parser's
    v6 branches (bracketless ':' status detection, 3-line wraps) are in
    parse_show_ip_bgp."""

    URL = "https://www.pch.net/resources/Routing_Data/IPv6_daily_snapshots/"
    NAME = "pch.daily_routing_snapshots_v6"
    AF = 6
