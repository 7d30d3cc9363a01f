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
    "bgpkit.as2rel_v6": golden_bgpkit_as2rel,
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
    (2) existing HostName (3) classify via the Public Suffix List: name ==
    tldextract registered_domain → DomainName else HostName (so example.co.uk
    is a DomainName despite its 3 labels, and a bare suffix is a HostName)."""
    from .psl import py_registered_domain

    out = set()
    for d in docs:
        name = d.record["name"]
        if name is None:
            continue  # invalid line skipped (:66-69)
        if name in existing_domains:
            label = "DomainName"
        elif name in existing_hosts:
            label = "HostName"
        elif name == py_registered_domain(name):
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


# ---------------------------------------------------------------- batch 3

import ipaddress as _ipaddr
import math as _math

# ISO 3166-1 alpha-2 assigned codes (public standard; stands in for the
# reference's iso3166 package, peeringdb/org.py:74)
ISO3166_ALPHA2 = set("""
AD AE AF AG AI AL AM AO AQ AR AS AT AU AW AX AZ BA BB BD BE BF BG BH BI BJ BL
BM BN BO BQ BR BS BT BV BW BY BZ CA CC CD CF CG CH CI CK CL CM CN CO CR CU CV
CW CX CY CZ DE DJ DK DM DO DZ EC EE EG EH ER ES ET FI FJ FK FM FO FR GA GB GD
GE GF GG GH GI GL GM GN GP GQ GR GS GT GU GW GY HK HM HN HR HT HU ID IE IL IM
IN IO IQ IR IS IT JE JM JO JP KE KG KH KI KM KN KP KR KW KY KZ LA LB LC LI LK
LR LS LT LU LV LY MA MC MD ME MF MG MH MK ML MM MN MO MP MQ MR MS MT MU MV MW
MX MY MZ NA NC NE NF NG NI NL NO NP NR NU NZ OM PA PE PF PG PH PK PL PM PN PR
PS PT PW PY QA RE RO RS RU RW SA SB SC SD SE SG SH SI SJ SK SL SM SN SO SR SS
ST SV SX SY SZ TC TD TF TG TH TJ TK TL TM TN TO TR TT TV TW TZ UA UG UM US UY
UZ VA VC VE VG VI VN VU WF WS YE YT ZA ZM ZW
""".split())


def golden_peeringdb_org(docs: list[FixtureDoc]) -> set[Triple]:
    """ref peeringdb/org.py:48-131."""
    out = set()
    for d in docs:
        org = d.record
        nm = org["name"].strip()
        out.add(_t("Organization", nm, "NAME", "Name", nm))
        out.add(_t("Organization", nm, "EXTERNAL_ID", "PeeringdbOrgID", org["id"]))
        if org["website"]:
            out.add(_t("Organization", nm, "WEBSITE", "URL", org["website"].strip()))
        if org["country"] in ISO3166_ALPHA2:
            out.add(_t("Organization", nm, "COUNTRY", "Country", org["country"]))
        if org["latitude"] and org["longitude"]:
            out.add(_t("Organization", nm, "LOCATED_IN", "Point",
                       f"{org['longitude']},{org['latitude']}"))
    return out


def golden_peeringdb_ix(docs: list[FixtureDoc], org_extid_to_name: dict) -> set[Triple]:
    """ref peeringdb/ix.py:113-308 (register_ixs + register_ix_membership);
    facilities are absent from the graph, so no ix LOCATED_IN links."""
    ixs = [d.record for d in docs if "ixlan_set" in d.record]
    lans = {d.record["id"]: d.record for d in docs if "ixpfx_set" in d.record}
    out = set()
    for ix in ixs:
        nm = ix["name"]
        out.add(_t("IXP", nm, "EXTERNAL_ID", "PeeringdbIXID", ix["id"]))
        out.add(_t("IXP", nm, "NAME", "Name", nm))
        if ix["org_id"] in org_extid_to_name:
            out.add(_t("IXP", nm, "MANAGED_BY", "Organization",
                       org_extid_to_name[ix["org_id"]]))
        if ix["country"]:
            out.add(_t("IXP", nm, "COUNTRY", "Country", ix["country"]))
        if ix["website"]:
            out.add(_t("IXP", nm, "WEBSITE", "URL", ix["website"]))
    for ix in ixs:
        nm = ix["name"]
        for lanref in ix.get("ixlan_set", []):
            if lanref["id"] not in lans:
                continue  # dangling ref skipped (:203-206)
            lan = lans[lanref["id"]]
            for pfx in lan["ixpfx_set"]:
                try:
                    prefix = _ipaddr.ip_network(pfx["prefix"]).compressed
                except ValueError:
                    continue
                out.add(_t("PeeringLAN", prefix, "MANAGED_BY", "IXP", nm))
            for net in lan["net_set"]:
                asn = int(net["asn"])
                out.add(_t("AS", asn, "NAME", "Name", net["name"]))
                out.add(_t("AS", asn, "EXTERNAL_ID", "PeeringdbNetID", net["id"]))
                if net["website"]:
                    out.add(_t("AS", asn, "WEBSITE", "URL", net["website"]))
                if net["org_id"] in org_extid_to_name:
                    out.add(_t("AS", asn, "MANAGED_BY", "Organization",
                               org_extid_to_name[net["org_id"]]))
                out.add(_t("AS", asn, "MEMBER_OF", "IXP", nm))
    return out


def golden_caida_as2org(docs: list[FixtureDoc]) -> set[Triple]:
    """ref caida/as2org.py:76-163: @del orgs skipped; asn→org_id dict
    (last write wins); Organization keyed by NAME."""
    orgid_name = {}
    name_countries = {}
    asn_orgid = {}
    for d in docs:
        r = d.record
        if r["kind"] == "org":
            if r["org_id"].startswith("@del"):
                continue
            orgid_name[r["org_id"]] = r["name"]
            name_countries.setdefault(r["name"], set()).add(r["country"])
        else:
            if r["org_id"].startswith("@del"):
                continue
            asn_orgid[r["asn"]] = r["org_id"]
    out = set()
    for asn, org_id in asn_orgid.items():
        out.add(_t("AS", asn, "MANAGED_BY", "Organization", orgid_name[org_id]))
    for org_id, nm in orgid_name.items():
        out.add(_t("Organization", nm, "NAME", "Name", nm))
        out.add(_t("Organization", nm, "EXTERNAL_ID", "CaidaOrgID", org_id))
    for nm, ccs in name_countries.items():
        for cc in ccs:
            out.add(_t("Organization", nm, "COUNTRY", "Country", cc))
    return out


def golden_nro_delegated(docs: list[FixtureDoc], existing_asns: set[int]) -> set[Triple]:
    """ref nro/delegated_stats.py:77-197: asn records link only existing
    ASNs (range overlap for value>1); ipv4 decomposed to CIDRs when not
    aligned; dynamic status predicate to OpaqueID."""
    existing_sorted = sorted(existing_asns)
    out = set()
    for d in docs:
        r = d.record
        if r["kind"] == "asn":
            start, value = int(r["start"]), r["value"]
            if value == 1 and start in existing_asns:
                linked = [start]
            elif value > 1:
                linked = [a for a in existing_sorted if start <= a <= start + value - 1]
            else:
                linked = []
            for a in linked:
                out.add(_t("AS", a, "COUNTRY", "Country", r["cc"]))
                out.add(_t("AS", a, r["status"], "OpaqueID", r["opaque"]))
        elif r["kind"] in ("ipv4", "ipv6"):
            if r["kind"] == "ipv4":
                plen = 32 - _math.log2(r["value"])
                needs = not plen.is_integer()
                if not needs:
                    try:
                        _ipaddr.IPv4Network(f"{r['start']}/{int(plen)}")
                        prefixes = [f"{r['start']}/{int(plen)}"]
                    except ValueError:
                        needs = True
                if needs:
                    first = _ipaddr.IPv4Address(r["start"])
                    last = first + r["value"] - 1
                    prefixes = [
                        str(n) for n in _ipaddr.summarize_address_range(first, last)
                    ]
            else:
                prefixes = [f"{r['start']}/{r['value']}"]
            for p in prefixes:
                out.add(_t("RIRPrefix", p, "COUNTRY", "Country", r["cc"]))
                out.add(_t("RIRPrefix", p, r["status"], "OpaqueID", r["opaque"]))
    return out


GOLDEN.update({
    "peeringdb.org": golden_peeringdb_org,
    "caida.as2org": golden_caida_as2org,
})
# peeringdb.ix and nro.delegated_stats need pipeline context — the test
# harness passes the org extid map / existing-ASN set explicitly.


# ---------------------------------------------------------------- batch 4

def golden_inetintel(docs: list[FixtureDoc], existing_orgs: set[str]) -> set[Triple]:
    """ref inetintel/as_org.py:46-119: unordered ASN pairs per OrgID (emitted
    sorted — SIBLING_OF is symmetric), org pairs only among pre-existing
    Organizations, WEBSITE when truthy."""
    from collections import defaultdict

    as_sib = defaultdict(set)
    org_sib = defaultdict(set)
    out = set()
    for d in docs:
        r = d.record
        as_sib[r["OrgID"]].add(r["asn"])
        if r["PDB.Org"] in existing_orgs:
            org_sib[r["OrgID"]].add(r["PDB.Org"])
        if r["Website"]:
            out.add(_t("AS", r["asn"], "WEBSITE", "URL", r["Website"]))
    for group in as_sib.values():
        mem = sorted(group)
        for i in range(len(mem)):
            for j in range(i + 1, len(mem)):
                out.add(_t("AS", mem[i], "SIBLING_OF", "AS", mem[j]))
    for group in org_sib.values():
        mem = sorted(group)
        for i in range(len(mem)):
            for j in range(i + 1, len(mem)):
                out.add(_t("Organization", mem[i], "SIBLING_OF",
                           "Organization", mem[j]))
    return out


def golden_openintel(docs: list[FixtureDoc]) -> set[Triple]:
    """ref openintel/__init__.py:253-443 — filter, root-dot strip, CNAME
    chain walk, RESOLVES_TO/MANAGED_BY/ALIAS_OF/PART_OF."""
    rows = []
    seen = set()
    for d in docs:
        r = d.record
        key = tuple(r.get(k) for k in ["query_type", "query_name", "response_type",
                                       "response_name", "ip4_address", "ip6_address",
                                       "ns_address", "cname_name"])
        if key in seen:
            continue  # drop_duplicates (:276)
        seen.add(key)
        if r["query_type"] not in ("A", "AAAA", "NS"):
            continue
        if r["response_type"] not in ("A", "AAAA", "NS", "CNAME"):
            continue
        if not any([r["ip4_address"], r["ip6_address"], r["ns_address"],
                    r["cname_name"]]):
            continue
        rows.append({
            "qt": r["query_type"],
            "qn": r["query_name"][:-1],
            "rt": r["response_type"],
            "rn": r["response_name"][:-1],
            "ip4": r["ip4_address"],
            "ip6": r["ip6_address"],
            "ns": r["ns_address"][:-1] if r["ns_address"] else None,
            "cname": r["cname_name"][:-1] if r["cname_name"] else None,
        })
    domain_names = {r["rn"] for r in rows if r["rt"] == "NS"}
    host_names = {r["rn"] for r in rows if r["rt"] in ("A", "AAAA")}
    cnames: dict[tuple, dict] = {}
    for r in rows:
        if r["qt"] in ("A", "AAAA") and r["rt"] == "CNAME":
            cnames.setdefault((r["qn"], r["qt"]), {})[r["cname"]] = r["rn"]
            host_names.add(r["qn"])
            host_names.add(r["cname"])
    out = set()
    for r in rows:
        if r["rt"] == "NS" and r["ns"]:
            out.add(_t("DomainName", r["rn"], "MANAGED_BY", "HostName", r["ns"]))
        elif r["rt"] in ("A", "AAAA"):
            ip = r["ip4"] if r["rt"] == "A" else r["ip6"]
            if not ip:
                continue
            if r["rt"] == "AAAA":
                try:
                    ip = _ipaddr.IPv6Address(ip).compressed
                except ValueError:
                    continue
            out.add(_t("HostName", r["rn"], "RESOLVES_TO", "IP", ip))
            cname = r["rn"]
            chain = cnames.get((r["qn"], r["qt"]), {})
            while cname in chain:
                up = chain[cname]
                out.add(_t("HostName", up, "RESOLVES_TO", "IP", ip))
                cname = up
        elif r["rt"] == "CNAME" and r["qt"] in ("A", "AAAA"):
            out.add(_t("HostName", r["rn"], "ALIAS_OF", "HostName", r["cname"]))
    for hd in host_names & domain_names:
        out.add(_t("HostName", hd, "PART_OF", "DomainName", hd))
    return out


GOLDEN.update({
    "openintel.tranco1m": golden_openintel,
})
# inetintel.as_org needs the pre-existing Organization set (test harness).


def golden_pch(docs: list[FixtureDoc]) -> set[Triple]:
    """Golden from the GENERATOR'S INTENT records (not a parser): the
    expected (prefix, origin) pairs per collector, compressed."""
    out = set()
    for d in docs:
        for prefix, asn in d.record["expected"]:
            p = _ipaddr.ip_network(prefix).compressed
            out.add(_t("AS", asn, "ORIGINATE", "BGPPrefix", p))
    return out


GOLDEN["pch.daily_routing_snapshots_v4"] = golden_pch


# ---------------------------------------------------------------- batch 5

def golden_worldbank(docs: list[FixtureDoc], existing_ccs: set[str]) -> set[Triple]:
    """ref worldbank/country_pop.py:25-63."""
    out = set()
    for d in docs:
        r = d.record
        if r["cc"] in existing_ccs and r["value"]:
            out.add(_t("Country", r["cc"], "POPULATION", "Estimate",
                       "World Bank Population Estimate"))
    return out


def golden_iana_root_zone(docs: list[FixtureDoc]) -> set[Triple]:
    """ref iana/root_zone.py:30-105."""
    out = set()
    for d in docs:
        r = d.record
        if r["kind"] == "NS":
            out.add(_t("DomainName", r["name"], "MANAGED_BY", "DomainName", r["ns"]))
        elif r["kind"] in ("A", "AAAA"):
            out.add(_t("DomainName", r["name"], "RESOLVES_TO", "IP", r["ip"]))
    return out


def golden_ripe_roa(docs: list[FixtureDoc]) -> set[Triple]:
    """ref ripe/roa.py:35-100: malformed prefixes skipped, compressed."""
    out = set()
    for d in docs:
        r = d.record
        if r["kind"] != "roa":
            continue
        try:
            prefix = _ipaddr.ip_network(r["prefix"]).compressed
        except ValueError:
            continue
        out.add(_t("AS", r["asn"], "ROUTE_ORIGIN_AUTHORIZATION",
                   "RPKIPrefix", prefix))
    return out


GOLDEN.update({
    "iana.root_zone": golden_iana_root_zone,
    "ripe.roa": golden_ripe_roa,
})
# worldbank.country_pop needs the existing Country set (test harness).


# ---------------------------------------------------------------- ooni

def _ooni_base_parse(docs: list[FixtureDoc]):
    """Mirror of OoniCrawler.process_one_line's shared part
    (ooni/__init__.py:61-113): yields (record, asn, cc) for lines that
    produce results; collects resolver IPs on the side."""
    from .canon import ISO3166_ALPHA2

    rows = []
    resolvers = set()
    for d in docs:
        o = d.record
        if not o.get("test_keys"):
            continue
        asn = int(o["probe_asn"].removeprefix("AS"))
        try:
            rip = ipaddress.ip_address(o.get("resolver_ip"))
            if rip.is_global:
                resolvers.add(rip.compressed)
        except (ValueError, TypeError):
            pass
        if asn == 0:
            continue
        cc = o.get("probe_cc")
        if cc not in ISO3166_ALPHA2:
            cc = None
        rows.append((o, asn, cc))
    return rows, resolvers


def golden_ooni_webconnectivity(docs: list[FixtureDoc]) -> set[Triple]:
    """ref ooni/webconnectivity.py:29-158 + ooni/__init__.py:115-152."""
    from urllib.parse import urlparse

    rows, _ = _ooni_base_parse(docs)
    out = set()
    for o, asn, cc in rows:
        tk = o["test_keys"]
        if "blocking" not in tk or "accessible" not in tk:
            continue
        url = o["input"]
        hostname = urlparse(url).hostname
        try:
            ipaddress.ip_address(hostname)
            is_ip = True
            ip_comp = ipaddress.ip_address(hostname).compressed
        except ValueError:
            is_ip = False
        if not is_ip:
            if "queries" not in tk:
                continue
            for q in tk["queries"]:
                if q["query_type"] not in ("A", "AAAA") or q["failure"]:
                    continue
                for a in q["answers"]:
                    try:
                        if a["answer_type"] == "A":
                            ip = ipaddress.ip_address(a["ipv4"])
                        elif a["answer_type"] == "AAAA":
                            ip = ipaddress.ip_address(a["ipv6"])
                        else:
                            continue
                    except (ValueError, KeyError):
                        continue
                    if not ip.is_global:
                        continue
                    out.add(_t("HostName", q["hostname"], "RESOLVES_TO",
                               "IP", ip.compressed))
        else:
            out.add(_t("IP", ip_comp, "PART_OF", "URL", url))
        out.add(_t("AS", asn, "CENSORED", "URL", url))
        if cc:
            out.add(_t("AS", asn, "COUNTRY", "Country", cc))
    return out


def _golden_ooni_tag(docs: list[FixtureDoc], tag: str,
                     keep) -> set[Triple]:
    rows, _ = _ooni_base_parse(docs)
    return {
        _t("AS", asn, "CENSORED", "Tag", tag)
        for o, asn, cc in rows
        if keep(o["test_keys"])
    }


def golden_ooni_telegram(docs):
    """ref ooni/telegram.py — all non-skipped lines produce a result."""
    return _golden_ooni_tag(docs, "OONI Telegram Test", lambda tk: True)


def golden_ooni_whatsapp(docs):
    return _golden_ooni_tag(docs, "OONI WhatsApp Test", lambda tk: True)


def golden_ooni_signal(docs):
    """ref ooni/osignal.py:27-30: null status popped."""
    return _golden_ooni_tag(
        docs, "OONI Signal Test",
        lambda tk: tk.get("signal_backend_status") is not None)


def golden_ooni_psiphon(docs):
    """ref ooni/psiphon.py:31-33: missing bootstrap_time popped."""
    return _golden_ooni_tag(
        docs, "OONI Psiphon Test", lambda tk: "bootstrap_time" in tk)


def golden_ooni_tor(docs: list[FixtureDoc]) -> set[Triple]:
    """ref ooni/tor.py:25-106: per-target results; protocol-tag filter."""
    tags = {t: f"OONI Probe Tor Tag {t}"
            for t in ["or_port_dirauth", "dir_port", "obfs4", "or_port"]}
    rows, _ = _ooni_base_parse(docs)
    out = set()
    for o, asn, cc in rows:
        for td in o["test_keys"]["targets"].values():
            ip = ipaddress.ip_address(
                td["target_address"].rsplit(":", 1)[0].strip("[]")
            ).compressed
            if td["target_protocol"] not in tags:
                continue
            out.add(_t("IP", ip, "CATEGORIZED", "Tag", tags[td["target_protocol"]]))
            out.add(_t("AS", asn, "CENSORED", "IP", ip))
    return out


GOLDEN.update({
    "ooni.webconnectivity": golden_ooni_webconnectivity,
    "ooni.telegram": golden_ooni_telegram,
    "ooni.whatsapp": golden_ooni_whatsapp,
    "ooni.osignal": golden_ooni_signal,
    "ooni.psiphon": golden_ooni_psiphon,
    "ooni.tor": golden_ooni_tor,
})


# ---------------------------------------------------------------- caida ixs

def _iso_alpha2(token: str) -> str | None:
    """Mirror iso3166 countries.get (ixs.py:92-103): alpha2/alpha3/name."""
    from .data_iso3166 import COUNTRIES as ISO

    t = token.strip().upper()
    for a2, (a3, full) in ISO.items():
        if t in (a2, a3, full.upper()):
            return a2
    return None


def _as_list(v) -> list:
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def golden_caida_ixs(docs: list[FixtureDoc], pdb_extid_to_name: dict) -> set[Triple]:
    """ref caida/ixs.py:122-204: pdb_id resolved through PeeringdbIXID
    edges; misses create an IXP keyed by the CAIDA name (:137-146)."""
    out = set()
    for d in docs:
        r = d.record
        if r.get("meta"):
            continue
        ixp = pdb_extid_to_name.get(r.get("pdb_id"), r["name"])
        out.add(_t("IXP", ixp, "EXTERNAL_ID", "CaidaIXID", r["ix_id"]))
        out.add(_t("IXP", ixp, "NAME", "Name", r["name"]))
        for c in _as_list(r.get("country")):
            a2 = _iso_alpha2(c)
            if a2:
                out.add(_t("IXP", ixp, "COUNTRY", "Country", a2))
        for u in _as_list(r.get("url")):
            out.add(_t("IXP", ixp, "WEBSITE", "URL", u))
        for af_pfx in (r.get("prefixes") or {}).values():
            for p in af_pfx:
                pfx = _ipaddr.ip_network(p).compressed
                out.add(_t("PeeringLAN", pfx, "MANAGED_BY", "IXP", ixp))
    return out


def golden_caida_ix_asns(docs: list[FixtureDoc],
                         ixid_to_ixp: dict) -> set[Triple]:
    """ref caida/ix_asns.py:77-91: MEMBER_OF through the CaidaIXID map;
    dangling ix_ids drop."""
    out = set()
    for d in docs:
        r = d.record
        if r.get("meta") or r["ix_id"] not in ixid_to_ixp:
            continue
        out.add(_t("AS", r["asn"], "MEMBER_OF", "IXP", ixid_to_ixp[r["ix_id"]]))
    return out


# ------------------------------------------------------- maxmind / ipinfo

def golden_maxmind(docs: list[FixtureDoc]) -> set[Triple]:
    """ref maxmind/geolite_country.py:84-142: inner merge blocks×locations
    on geoname_id, drop continent-only + registered-country-only rows."""
    locs = {
        d.record["geoname_id"]: d.record
        for d in docs
        if d.record["kind"] == "location" and d.record["country_iso_code"]
    }
    out = set()
    for d in docs:
        r = d.record
        if r["kind"] != "block" or r["geoname_id"] is None:
            continue
        loc = locs.get(r["geoname_id"])
        if loc is None:
            continue
        pfx = _ipaddr.ip_network(r["network"]).compressed
        out.add(_t("GeoPrefix", pfx, "COUNTRY", "Country",
                   loc["country_iso_code"]))
    return out


def golden_ipinfo(docs: list[FixtureDoc]) -> set[Triple]:
    """ref ipinfo/ip_country.py:41-60: summarize_address_range explode."""
    out = set()
    for d in docs:
        r = d.record
        for net in _ipaddr.summarize_address_range(
            _ipaddr.ip_address(r["start_ip"]), _ipaddr.ip_address(r["end_ip"])
        ):
            out.add(_t("GeoPrefix", net.compressed, "COUNTRY", "Country",
                       r["country"]))
    return out


GOLDEN.update({
    "maxmind.geolite_country": golden_maxmind,
    "ipinfo.ip_country": golden_ipinfo,
})


# ---------------------------------------------------------------- alice_lg

def golden_alice_lg(docs: list[FixtureDoc],
                    lan_to_ixp: dict[str, str]) -> set[Triple]:
    """ref alice_lg/__init__.py:356-457: search_best member-IP → PeeringLAN
    → MEMBER_OF; received routes → ORIGINATE(as_path[-1], network)."""
    nets = [(_ipaddr.ip_network(lan), ixp) for lan, ixp in lan_to_ixp.items()]
    out = set()
    for d in docs:
        r = d.record
        if r.get("kind") == "neighbors":
            for nb in r["list"]:
                asn = nb.get("asn")
                if not isinstance(asn, int) or not asn:
                    continue
                ip = _ipaddr.ip_address(nb["address"])
                best = None
                for net, ixp in nets:
                    if net.version == ip.version and ip in net:
                        if best is None or net.prefixlen > best[0].prefixlen:
                            best = (net, ixp)
                if best is None:
                    continue
                out.add(_t("AS", asn, "MEMBER_OF", "IXP", best[1]))
        elif r.get("kind") == "routes":
            for rt in r["imported"]:
                if not rt["bgp"]["as_path"]:
                    continue
                pfx = _ipaddr.ip_network(rt["network"]).compressed
                out.add(_t("AS", rt["bgp"]["as_path"][-1],
                           "ORIGINATE", "BGPPrefix", pfx))
    return out


# ---------------------------------------------------------------- ihr

def golden_ihr_country_dependency(docs: list[FixtureDoc]) -> set[Triple]:
    """ref ihr/country_dependency.py:42-113."""
    out = set()
    for d in docs:
        cc, results = d.record["cc"], d.record["results"]
        if not results:
            continue
        last = max(r["timebin"] for r in results)  # ISO strings sort right
        for metric, weight in [("Total eyeball", "eyeball"), ("Total AS", "as")]:
            ranking = f"IHR country ranking: {metric} ({cc})"
            out.add(_t("Ranking", ranking, "COUNTRY", "Country", cc))
            for r in results:
                if (r["weightscheme"] == weight and r["transitonly"] is False
                        and r["hege"] > 0.01 and r["timebin"] == last):
                    out.add(_t("AS", r["asn"], "RANK", "Ranking", ranking))
    return out


def golden_ihr_rov(docs: list[FixtureDoc]) -> set[Triple]:
    """ref ihr/rov.py:76-125."""
    out = set()
    for d in docs:
        r = d.record
        try:
            pfx = _ipaddr.ip_network(r["prefix"]).compressed
        except ValueError:
            continue
        if r["asn_id"] == r["originasn_id"]:
            origin = int(r["originasn_id"])
            out.add(_t("AS", origin, "ORIGINATE", "BGPPrefix", pfx))
            out.add(_t("BGPPrefix", pfx, "CATEGORIZED", "Tag",
                       "RPKI " + r["rpki_status"]))
            out.add(_t("BGPPrefix", pfx, "CATEGORIZED", "Tag",
                       "IRR " + r["irr_status"]))
        out.add(_t("BGPPrefix", pfx, "DEPENDS_ON", "AS", int(r["asn_id"])))
    return out


GOLDEN.update({
    "ihr.country_dependency": golden_ihr_country_dependency,
    "ihr.rov": golden_ihr_rov,
})


# ------------------------------------------------------- flat linkers

def golden_bgptools_as_names(docs: list[FixtureDoc]) -> set[Triple]:
    """ref bgptools/as_names.py:54-85."""
    out = set()
    for d in docs:
        r = d.record
        if not r["asn_field"].startswith("AS"):
            continue
        if r["name"] != "ERR_AS_NAME_NOT_FOUND":
            out.add(_t("AS", r["asn"], "NAME", "Name", r["name"]))
        if r["class"] != "Unknown":
            out.add(_t("AS", r["asn"], "CATEGORIZED", "Tag", r["class"]))
    return out


def golden_emileaben_as_names(docs: list[FixtureDoc]) -> set[Triple]:
    return {_t("AS", d.record["asn"], "NAME", "Name", d.record["name"])
            for d in docs}


def golden_virginiatech_rovista(docs: list[FixtureDoc]) -> set[Triple]:
    """ref virginiatech/rovista.py:57-68: strict > 0.5 threshold."""
    out = set()
    for d in docs:
        for e in d.record["data"]:
            tag = ("Validating RPKI ROV" if e["ratio"] > 0.5
                   else "Not Validating RPKI ROV")
            out.add(_t("AS", e["asn"], "CATEGORIZED", "Tag", tag))
    return out


def golden_citizenlab_urldb(docs: list[FixtureDoc]) -> set[Triple]:
    return {_t("URL", d.record["url"], "CATEGORIZED", "Tag",
               d.record["category"]) for d in docs}


def golden_iana_address_space(docs: list[FixtureDoc]) -> set[Triple]:
    """ref iana/address_space.py:58-185."""

    def norm_org(desig: str) -> str:
        if desig.startswith("IANA - "):
            return "IANA"
        if desig.startswith("Administered by "):
            return desig.replace("Administered by ", "")
        if desig in ("Multicast", "Future use"):
            return "IANA"
        return desig

    out = set()
    for d in docs:
        r = d.record
        if r["kind"] == "v4":
            pfx = _ipaddr.ip_network(f'{r["octet"]}.0.0.0/8').compressed
            out.add(_t("IANAPrefix", pfx, r["status"], "Organization",
                       norm_org(r["desig"])))
        elif r["kind"] == "v6":
            pfx = _ipaddr.ip_network(r["prefix"]).compressed
            out.add(_t("IANAPrefix", pfx, r["status"], "Organization",
                       norm_org(r["desig"])))
        else:
            block = r["block"]
            if block == "192.0.0.170/32, 192.0.0.171/32":
                pfxs = ["192.0.0.170/32", "192.0.0.171/32"]
            else:
                pfxs = [_ipaddr.ip_network(block.split(" ")[0]).compressed]
            for p in pfxs:
                out.add(_t("IANAPrefix", p, "RESERVED", "Organization", "IANA"))
    return out


GOLDEN.update({
    "bgptools.as_names": golden_bgptools_as_names,
    "emileaben.as_names": golden_emileaben_as_names,
    "virginiatech.rovista": golden_virginiatech_rovista,
    "citizenlab.urldb": golden_citizenlab_urldb,
    "iana.address_space": golden_iana_address_space,
})


# ------------------------------------------------------- cloudflare / atlas

def golden_cloudflare_top100(docs: list[FixtureDoc]) -> set[Triple]:
    return {_t("DomainName", d.record["domain"], "RANK", "Ranking",
               "Cloudflare top 100 domains") for d in docs}


def golden_cloudflare_ranking_bucket(docs: list[FixtureDoc]) -> set[Triple]:
    out = set()
    for d in docs:
        ranking = f'Cloudflare {d.record["title"]}'
        for dom in d.record["domains"]:
            out.add(_t("DomainName", dom, "RANK", "Ranking", ranking))
    return out


def golden_cloudflare_dns_top(docs: list[FixtureDoc], eligible: set,
                              kind: str) -> set[Triple]:
    """ref cloudflare dns_top_{ases,locations}: links only for names the
    seed scan selected (RANK edge with rank ≤ threshold; at fixture scale
    every ranked DomainName qualifies)."""
    out = set()
    for d in docs:
        if d.record["name"] not in eligible:
            continue
        for e in d.record["entries"]:
            if kind == "ases":
                out.add(_t("DomainName", d.record["name"], "QUERIED_FROM",
                           "AS", e["clientASN"]))
            else:
                out.add(_t("DomainName", d.record["name"], "QUERIED_FROM",
                           "Country", e["clientCountryAlpha2"]))
    return out


def golden_ripe_atlas_probes(docs: list[FixtureDoc]) -> set[Triple]:
    """ref ripe/atlas_probes.py:89-204."""
    from .canon import ISO3166_ALPHA2

    out = set()
    seen = set()
    for d in docs:
        for p in d.record["results"]:
            pid = p["id"]
            if not pid or pid in seen:
                continue
            seen.add(pid)
            if p.get("address_v4"):
                out.add(_t("IP", p["address_v4"], "ASSIGNED",
                           "AtlasProbe", pid))
            if p.get("address_v6"):
                v6 = _ipaddr.ip_address(p["address_v6"]).compressed
                out.add(_t("IP", v6, "ASSIGNED", "AtlasProbe", pid))
            if p.get("asn_v4"):
                out.add(_t("AtlasProbe", pid, "LOCATED_IN", "AS", p["asn_v4"]))
            if p.get("asn_v6"):
                out.add(_t("AtlasProbe", pid, "LOCATED_IN", "AS", p["asn_v6"]))
            cc = p.get("country_code")
            if cc and cc in ISO3166_ALPHA2:
                out.add(_t("AtlasProbe", pid, "COUNTRY", "Country", cc))
            if p.get("geometry") and p["geometry"].get("coordinates"):
                lon, lat = p["geometry"]["coordinates"]
                if -180 <= lon <= 180 and -90 <= lat <= 90:
                    out.add(_t("AtlasProbe", pid, "LOCATED_IN", "Point",
                               f"{lon},{lat}"))
    return out


GOLDEN.update({
    "cloudflare.top100": golden_cloudflare_top100,
    "cloudflare.ranking_bucket": golden_cloudflare_ranking_bucket,
    "ripe.atlas_probes": golden_ripe_atlas_probes,
})


# --------------------------------------------- anycast / asrel / peerstats

def golden_anycast(docs: list[FixtureDoc]) -> set[Triple]:
    out = set()
    for d in docs:
        try:
            pfx = _ipaddr.ip_network(d.record["prefix"]).compressed
        except ValueError:
            continue
        out.add(_t("BGPPrefix", pfx, "CATEGORIZED", "Tag", "Anycast"))
    return out


def golden_caida_asrel(docs: list[FixtureDoc]) -> set[Triple]:
    return {
        _t("AS", d.record["left"], "PEERS_WITH", "AS", d.record["right"])
        for d in docs if not d.record.get("comment")
    }


def golden_bgpkit_peerstats(docs: list[FixtureDoc]) -> set[Triple]:
    out = set()
    for d in docs:
        coll = d.record["collector"]
        for p in d.record["peers"].values():
            out.add(_t("AS", p["asn"], "PEERS_WITH", "BGPCollector", coll))
    return out


def golden_amazon_aws(docs: list[FixtureDoc]) -> set[Triple]:
    """ref amazon/aws_ip_ranges.py:75-207."""
    overrides = {"United States": "US", "South Korea": "KR", "Taiwan": "TW",
                 "UAE": "AE"}
    additional = {"cn-north-1": "CN", "cn-northwest-1": "CN",
                  "eusc-de-east-1": "DE", "us-gov-east-1": "US",
                  "us-gov-west-1": "US"}
    from .data_iso3166 import COUNTRIES as ISO

    name_to_a2 = {nm.upper(): a2 for a2, (_, nm) in ISO.items()}
    region_map = {}
    for d in docs:
        if d.record["kind"] != "region":
            continue
        geo = d.record["geography"]
        cc = overrides.get(geo) or name_to_a2.get(geo.upper())
        if cc:
            region_map[d.record["region"]] = cc
    for r, cc in additional.items():
        region_map.setdefault(r, cc)
    out = set()
    for d in docs:
        if d.record["kind"] != "prefix":
            continue
        pfx = _ipaddr.ip_network(d.record["prefix"]).compressed
        out.add(_t("GeoPrefix", pfx, "CATEGORIZED", "Tag",
                   d.record["service"]))
        cc = region_map.get(d.record["region"])
        if cc:
            out.add(_t("GeoPrefix", pfx, "COUNTRY", "Country", cc))
    return out


GOLDEN.update({
    "bgptools.anycast_prefixes_v4": golden_anycast,
    "bgptools.anycast_prefixes_v6": golden_anycast,
    "caida.as_relationships_v4": golden_caida_asrel,
    "caida.as_relationships_v6": golden_caida_asrel,
    "bgpkit.peerstats": golden_bgpkit_peerstats,
    "amazon.aws_ip_ranges": golden_amazon_aws,
})


# ---------------------------------------- openintel flavors / laces / fac

def golden_utwente_laces(docs: list[FixtureDoc]) -> set[Triple]:
    """ref utwente/__init__.py:35-104."""
    out = set()
    for d in docs:
        r = d.record
        if r["gcd"] <= 1:
            continue
        try:
            pfx = _ipaddr.ip_network(r["prefix"]).compressed
            backing = _ipaddr.ip_network(r["backing_prefix"]).compressed
        except ValueError:
            continue
        out.add(_t("BGPPrefix", backing, "CATEGORIZED", "Tag", "Anycast"))
        for loc in r["locations"]:
            out.add(_t("GeoPrefix", pfx, "LOCATED_IN", "Point",
                       f'{loc["lon"]},{loc["lat"]}'))
            if loc["country_code"]:
                out.add(_t("GeoPrefix", pfx, "COUNTRY", "Country",
                           loc["country_code"]))
    return out


def golden_peeringdb_fac(docs: list[FixtureDoc],
                         org_extid_to_name: dict) -> set[Triple]:
    """ref peeringdb/fac.py:64-166."""
    from .canon import ISO3166_ALPHA2

    out = set()
    for d in docs:
        r = d.record
        fac = r["name"].strip()
        out.add(_t("Facility", fac, "NAME", "Name", fac))
        out.add(_t("Facility", fac, "EXTERNAL_ID", "PeeringdbFacID", r["id"]))
        if r["website"]:
            out.add(_t("Facility", fac, "WEBSITE", "URL",
                       r["website"].strip()))
        if r["country"] in ISO3166_ALPHA2:
            out.add(_t("Facility", fac, "COUNTRY", "Country", r["country"]))
        if r["latitude"] and r["longitude"]:
            out.add(_t("Facility", fac, "LOCATED_IN", "Point",
                       f'{r["longitude"]},{r["latitude"]}'))
        if r["org_id"] in org_extid_to_name:
            out.add(_t("Facility", fac, "MANAGED_BY", "Organization",
                       org_extid_to_name[r["org_id"]]))
    return out


def golden_google_crux(docs: list[FixtureDoc]) -> set[Triple]:
    """ref google/crux_top1m_country.py:92-126."""
    out = set()
    for d in docs:
        r = d.record
        ranking = f'CrUX top 1M ({r["cc"]})'
        out.add(_t("Ranking", ranking, "COUNTRY", "Country", r["cc"]))
        out.add(_t("HostName", r["host"], "RANK", "Ranking", ranking))
    return out


GOLDEN.update({
    "openintel.infra_ns": golden_openintel,
    "openintel.umbrella1m": golden_openintel,
    "utwente.laces_v4": golden_utwente_laces,
    "utwente.laces_v6": golden_utwente_laces,
    "google.crux_top1m_country": golden_google_crux,
})


# ---------------------------------------------------------------- ooni wave 2

def golden_ooni_httpinvalidrequestline(docs):
    return _golden_ooni_tag(docs, "OONI HTTP Invalid Request Line Test",
                            lambda tk: True)


def golden_ooni_httpheaderfieldmanipulation(docs):
    return _golden_ooni_tag(docs, "OONI HTTP Header Field Manipulation Test",
                            lambda tk: True)


def golden_ooni_riseupvpn(docs):
    return _golden_ooni_tag(docs, "OONI RiseupVPN Test", lambda tk: True)


def golden_ooni_vanillator(docs):
    return _golden_ooni_tag(docs, "OONI Vanilla Tor Test", lambda tk: True)


def golden_ooni_torsf(docs):
    """ref ooni/torsf.py:25-27: rows without 'success' pop."""
    return _golden_ooni_tag(docs, "OONI Tor Snowflake Test",
                            lambda tk: "success" in tk)


def golden_ooni_facebookmessenger(docs):
    """ref ooni/facebookmessenger.py:25-29: rows missing either key pop."""
    return _golden_ooni_tag(
        docs, "OONI Facebook Messenger Test",
        lambda tk: tk.get("facebook_dns_blocking") is not None
        and tk.get("facebook_tcp_blocking") is not None)


GOLDEN.update({
    "ooni.httpinvalidrequestline": golden_ooni_httpinvalidrequestline,
    "ooni.httpheaderfieldmanipulation": golden_ooni_httpheaderfieldmanipulation,
    "ooni.riseupvpn": golden_ooni_riseupvpn,
    "ooni.vanillator": golden_ooni_vanillator,
    "ooni.torsf": golden_ooni_torsf,
    "ooni.facebookmessenger": golden_ooni_facebookmessenger,
})


# ---------------------------------------------- atlas measurements / rdns

def golden_atlas_measurements(docs: list[FixtureDoc],
                              abandoned: set) -> set[Triple]:
    """ref ripe/atlas_measurements.py:143-266."""
    out = set()
    seen = set()
    for d in docs:
        for m in d.record["results"]:
            mid = m["id"]
            if not mid or mid in seen:
                continue
            seen.add(mid)
            target = m.get("target") or ""
            hostname = None
            if target:
                try:
                    _ipaddr.ip_address(target)
                except ValueError:
                    hostname = target
            resolved = m.get("resolved_ips") or m.get("target_ip") or []
            if not isinstance(resolved, list):
                resolved = [resolved]
            resolved = [ip for ip in resolved if ip]
            if int(m["af"]) == 6:
                resolved = [_ipaddr.ip_address(ip).compressed
                            for ip in resolved]
            if m.get("target_asn"):
                out.add(_t("AtlasMeasurement", mid, "TARGET", "AS",
                           m["target_asn"]))
            if hostname:
                out.add(_t("AtlasMeasurement", mid, "TARGET", "HostName",
                           hostname))
            for ip in resolved:
                out.add(_t("AtlasMeasurement", mid, "TARGET", "IP", ip))
            for prb in m.get("current_probes") or []:
                if prb in abandoned:
                    continue
                out.add(_t("AtlasProbe", prb, "PART_OF", "AtlasMeasurement",
                           mid))
    return out


def golden_simulamet_rdns(docs: list[FixtureDoc]) -> set[Triple]:
    """ref simulamet/rirdata_rdns.py:29-163."""
    out = set()
    for d in docs:
        payload = d.record["payload"]
        entries = payload if isinstance(payload, list) else [payload]
        for e in entries:
            if "NS" not in e["rdns"]["rdatasets"]:
                continue
            for pfx in e["prefixes"]:
                if not pfx:
                    continue
                prefix = _ipaddr.ip_network(pfx).compressed
                for ns in e["rdns"]["rdatasets"]["NS"]:
                    if not ns:
                        continue
                    out.add(_t("RDNSPrefix", prefix, "MANAGED_BY",
                               "HostName", ns[:-1] if ns.endswith(".") else ns))
    return out


GOLDEN["simulamet.rirdata_rdns"] = golden_simulamet_rdns


# ---------------------------------------------------------------- dnsgraph

def golden_openintel_dnsgraph(docs: list[FixtureDoc]) -> set[Triple]:
    """ref openintel/__init__.py:452-672 — straight-line mirror of the
    edge typing, key normalization, and recurse_cnames walk."""
    LABEL = {"DOMAIN": "DomainName", "HOSTNAME": "HostName", "IP": "IP"}

    def norm(nt, key):
        if nt in ("DOMAIN", "HOSTNAME"):
            return key if key == "." else key.rstrip(".")
        if nt == "IP":
            return _ipaddr.ip_address(key).compressed
        return key

    rows = []
    for d in docs:
        r = d.record
        rows.append((r["relation_name"], r["from_nodeType"],
                     norm(r["from_nodeType"], r["from_nodeKey"]),
                     r["to_nodeType"], norm(r["to_nodeType"], r["to_nodeKey"])))
    out = set()
    shapes = {("PARENT", "DOMAIN", "DOMAIN"),
              ("PART_OF", "HOSTNAME", "DOMAIN"),
              ("ALIAS_OF", "HOSTNAME", "HOSTNAME"),
              ("MANAGED_BY", "DOMAIN", "HOSTNAME"),
              ("RESOLVES_TO", "HOSTNAME", "IP")}
    cnames = {}
    resolves = {}
    for rel, ft, src, tt, dst in rows:
        if (rel, ft, tt) not in shapes:
            continue
        out.add(_t(LABEL[ft], src, rel, LABEL[tt], dst))
        if rel == "ALIAS_OF":
            cnames.setdefault(dst, set()).add(src)
        if rel == "RESOLVES_TO":
            resolves.setdefault(src, set()).add(dst)

    def recurse(source, ips, state, processed):
        for alias in cnames.get(source, ()):
            if alias in processed:
                continue
            processed.add(alias)
            state.setdefault(alias, set()).update(ips)
            recurse(alias, ips, state, processed)

    cname_resolves: dict = {}
    for nm, ips in resolves.items():
        recurse(nm, ips, cname_resolves, {nm})
    for host, ips in cname_resolves.items():
        for ip in ips:
            out.add(_t("HostName", host, "RESOLVES_TO", "IP", ip))
    return out


GOLDEN["openintel.dnsgraph"] = golden_openintel_dnsgraph


def golden_ooni_stunreachability(docs: list[FixtureDoc]) -> set[Triple]:
    """ref ooni/stunreachability.py:24-115."""
    from .psl import py_fqdn

    rows, _ = _ooni_base_parse(docs)
    out = set()
    for o, asn, cc in rows:
        url = o.get("input")
        if not url:
            continue
        out.add(_t("AS", asn, "CENSORED", "URL", url))
        endpoint = url.split("//")[-1]
        host = endpoint.split(":")[0]
        try:
            ipaddress.ip_address(host)
            continue  # IP endpoint → no hostname
        except ValueError:
            pass
        hostname = py_fqdn(host)
        if not hostname:
            continue
        for q in o["test_keys"].get("queries") or []:
            if q["query_type"] not in ("A", "AAAA") or q.get("failure"):
                continue
            if q["hostname"] != hostname:
                continue
            for a in q.get("answers") or []:
                ipf = a.get("ipv4") if a.get("answer_type") == "A" else (
                    a.get("ipv6") if a.get("answer_type") == "AAAA" else None)
                if not ipf:
                    continue
                try:
                    ip = ipaddress.ip_address(ipf)
                except ValueError:
                    continue
                if not ip.is_global:
                    continue
                out.add(_t("HostName", hostname, "RESOLVES_TO", "IP",
                           ip.compressed))
    return out


GOLDEN["ooni.stunreachability"] = golden_ooni_stunreachability

GOLDEN["ihr.local_hegemony_v6"] = golden_ihr_hegemony

GOLDEN.update({
    "openintel.infra_mx": golden_openintel,
    "openintel.crux": golden_openintel,
    "openintel.toplist": golden_openintel,
})

for _ds in ("crux", "jp", "nl", "rdns"):
    GOLDEN[f"openintel.dnsgraph_{_ds}"] = golden_openintel_dnsgraph


# ---------------------------------------------------------------- manrs

def golden_manrs_members(docs: list[FixtureDoc]) -> set[Triple]:
    """ref manrs/members.py:58-105."""
    labels = ["MANRS Action 1: Filtering", "MANRS Action 2: Anti-spoofing",
              "MANRS Action 3: Coordination",
              "MANRS Action 4: Global Validation"]
    out = set()
    for d in docs:
        r = d.record
        if r.get("header") or not r["asns"]:
            continue
        for asn_s in r["asns"].split(";"):
            asn = int(asn_s)
            out.add(_t("AS", asn, "MEMBER_OF", "Organization", "MANRS"))
            for cc in r["areas"].split(";"):
                cc = cc.strip()
                if cc:
                    out.add(_t("AS", asn, "COUNTRY", "Country", cc))
            for j, act in enumerate(r["acts"]):
                if act == "Yes":
                    out.add(_t("AS", asn, "IMPLEMENT", "ManrsAction",
                               labels[j]))
    return out


GOLDEN["manrs.members"] = golden_manrs_members
GOLDEN["pch.daily_routing_snapshots_v6"] = golden_pch
