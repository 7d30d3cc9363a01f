"""Golden oracle — straight-line Python re-implementation of the reference
crawlers' semantics, computed directly from fixture *records* (never from
spans, never with Spark). pytest compares the Spark pipeline's emitted
triples against these (FIXTURES.md: P/R ≥ 0.95 target, exact at fixture
scale).

Each function mirrors the cited reference code path as literally as
possible; this is the one place where per-row Python is the point.
"""

from __future__ import annotations

import ipaddress

from .fixtures import FixtureDoc

Triple = tuple[str, str, str, str, str]  # subj_label, subj_key, pred, obj_label, obj_key


def _t(sl: str, sk, pred: str, ol: str, ok) -> Triple:
    return (sl, str(sk), pred, ol, str(ok))


def golden_bgpkit_pfx2asn(docs: list[FixtureDoc]) -> set[Triple]:
    """ref iyp/crawlers/bgpkit/pfx2asn.py:32-60: malformed prefixes dropped,
    prefix compressed, (AS)-[ORIGINATE]->(BGPPrefix)."""
    out = set()
    for d in docs:
        try:
            prefix = ipaddress.ip_network(d.record["prefix"]).compressed
        except ValueError:
            continue
        out.add(_t("AS", d.record["asn"], "ORIGINATE", "BGPPrefix", prefix))
    return out


def golden_ripe_as_names(docs: list[FixtureDoc]) -> set[Triple]:
    """ref iyp/crawlers/ripe/as_names.py:29-66: partition/rpartition parse,
    invalid lines (missing fields / len(cc)>2) skipped; NAME + COUNTRY."""
    out = set()
    for d in docs:
        line = d.record["line"]
        asn, _, name_cc = line.partition(" ")
        name, _, cc = name_cc.rpartition(", ")
        if not all((asn, name, cc)) or len(cc) > 2:
            continue
        asn = int(asn)
        out.add(_t("AS", asn, "NAME", "Name", name))
        out.add(_t("AS", asn, "COUNTRY", "Country", cc.upper()))
    return out


def golden_caida_asrank(docs: list[FixtureDoc]) -> set[Triple]:
    """ref iyp/crawlers/caida/asrank.py:56-116: NAME/COUNTRY only when
    non-empty, LOCATED_IN only when lat AND lon truthy (0.0 counts as
    absent!), RANK to the singleton Ranking node."""
    out = set()
    for d in docs:
        a = d.record
        asn = int(a["asn"])
        if a["asnName"]:
            out.add(_t("AS", asn, "NAME", "Name", a["asnName"]))
        if a["country"]["iso"]:
            out.add(_t("AS", asn, "COUNTRY", "Country", a["country"]["iso"].upper()))
        out.add(_t("AS", asn, "RANK", "Ranking", "CAIDA ASRank"))
        if a["latitude"] and a["longitude"]:
            out.add(
                _t("AS", asn, "LOCATED_IN", "Point", f"{a['longitude']},{a['latitude']}")
            )
    return out


def golden_bgpkit_as2rel(docs: list[FixtureDoc]) -> set[Triple]:
    """ref iyp/crawlers/bgpkit/__init__.py:29-47: AS(asn1)-[PEERS_WITH{af}]->AS(asn2)."""
    out = set()
    for d in docs:
        out.add(_t("AS", d.record["asn1"], "PEERS_WITH", "AS", d.record["asn2"]))
    return out


GOLDEN = {
    "bgpkit.pfx2asn": golden_bgpkit_pfx2asn,
    "ripe.as_names": golden_ripe_as_names,
    "caida.asrank": golden_caida_asrank,
    "bgpkit.as2rel_v4": golden_bgpkit_as2rel,
}


def precision_recall(emitted: set[Triple], golden: set[Triple]) -> tuple[float, float]:
    if not emitted and not golden:
        return 1.0, 1.0
    tp = len(emitted & golden)
    p = tp / len(emitted) if emitted else 0.0
    r = tp / len(golden) if golden else 0.0
    return p, r
