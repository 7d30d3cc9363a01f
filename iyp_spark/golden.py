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


# ---------------------------------------------------------------- batch 2

def golden_tranco(docs: list[FixtureDoc]) -> set[Triple]:
    """ref tranco/top1m.py:44-63: DomainName -RANK-> Ranking('Tranco top 1M')."""
    return {
        _t("DomainName", d.record["domain"], "RANK", "Ranking", "Tranco top 1M")
        for d in docs
    }


def golden_umbrella(
    docs: list[FixtureDoc], existing_domains: set[str], existing_hosts: set[str]
) -> set[Triple]:
    """ref cisco/umbrella_top1m.py:59-122: preference (1) existing DomainName
    (2) existing HostName (3) classify: registered domain → DomainName else
    HostName. Fixture names are 2-label registered domains or 3-label hosts."""
    out = set()
    for d in docs:
        name = d.record["name"]
        if name is None:
            continue  # invalid line skipped (:66-69)
        if name in existing_domains:
            label = "DomainName"
        elif name in existing_hosts:
            label = "HostName"
        elif name.count(".") == 1:  # == tldextract registered_domain for fixture
            label = "DomainName"
        else:
            label = "HostName"
        out.add(_t(label, name, "RANK", "Ranking", "Cisco Umbrella Top 1 million"))
    return out


def golden_ihr_hegemony(docs: list[FixtureDoc]) -> set[Triple]:
    """ref ihr/__init__.py:49-81: keep only the FIRST timebin;
    AS(originasn) -DEPENDS_ON-> AS(asn)."""
    first_tb = docs[0].record["timebin"]
    return {
        _t("AS", d.record["originasn"], "DEPENDS_ON", "AS", d.record["asn"])
        for d in docs
        if d.record["timebin"] == first_tb
    }


def golden_bgptools_tags(docs: list[FixtureDoc]) -> set[Triple]:
    """ref bgptools/tags.py:57-94: AS -CATEGORIZED-> Tag(label)."""
    return {
        _t("AS", d.record["asn"], "CATEGORIZED", "Tag", d.record["label"])
        for d in docs
    }


def golden_stanford_asdb(docs: list[FixtureDoc]) -> set[Triple]:
    """ref stanford/asdb.py:50-118: layer-1 categories always; layer-2
    subcategories unless empty/'Other'; Tag(sub) -PART_OF-> Tag(parent)."""
    out = set()
    for d in docs:
        asn = d.record["asn"]
        for cat, sub in d.record["pairs"]:
            out.add(_t("AS", asn, "CATEGORIZED", "Tag", cat))
            if sub and sub.lower() != "other":
                out.add(_t("AS", asn, "CATEGORIZED", "Tag", sub))
                out.add(_t("Tag", sub, "PART_OF", "Tag", cat))
    return out


def golden_apnic_eyeball(docs: list[FixtureDoc]) -> set[Triple]:
    """ref apnic/eyeball.py:40-84: per country (fixture order): Ranking
    -COUNTRY-> Country; per AS sorted by percent desc: RANK + POPULATION
    always, NAME + COUNTRY only the first time the AS is seen globally."""
    out = set()
    processed = set()
    by_cc: dict[str, list[dict]] = {}
    cc_order: list[str] = []
    for d in docs:
        cc = d.record["cc"]
        if cc not in by_cc:
            by_cc[cc] = []
            cc_order.append(cc)
        by_cc[cc].append(d.record)
    for cc in cc_order:
        ranking = f"APNIC eyeball estimates ({cc})"
        out.add(_t("Ranking", ranking, "COUNTRY", "Country", cc))
        recs = sorted(by_cc[cc], key=lambda x: x["percent"], reverse=True)
        for rec in recs:
            asn = rec["as"]
            if asn not in processed:
                out.add(_t("AS", asn, "NAME", "Name", rec["autnum"]))
                out.add(_t("AS", asn, "COUNTRY", "Country", cc))
                processed.add(asn)
            out.add(_t("AS", asn, "RANK", "Ranking", ranking))
            out.add(_t("AS", asn, "POPULATION", "Country", cc))
    return out


GOLDEN.update({
    "tranco.top1m": golden_tranco,
    "ihr.local_hegemony_v4": golden_ihr_hegemony,
    "bgptools.tags": golden_bgptools_tags,
    "stanford.asdb": golden_stanford_asdb,
    "apnic.eyeball": golden_apnic_eyeball,
})
# cisco.umbrella_top1m needs pipeline context (existing dictionaries) — the
# test harness calls golden_umbrella explicitly with the tranco domain set.
