"""Deterministic synthetic document corpus (FIXTURES.md).

Everything is seeded (seed=42 per-crawler); no external data. Each generator
returns a list of ``FixtureDoc`` — the *record* (what a reference crawler
would have parsed from the wire) plus its *span encoding* (the interleaved
document of BASELINE.json input_hint). ``golden.py`` consumes the records;
the Spark crawlers consume the spans — agreement between the two is the
correctness oracle.
"""

from __future__ import annotations

import json
import random
from dataclasses import dataclass, field


@dataclass
class FixtureDoc:
    doc_id: str
    crawler: str
    spans: list[dict]  # {kind, text, media_ref, offset}
    record: dict = field(default_factory=dict)


def _rng(name: str) -> random.Random:
    return random.Random(f"seed42:{name}")


def _spans(fields: list[tuple[str, str | None]]) -> list[dict]:
    """fields: list of (kind, payload). text payload → text span;
    media payload → media_ref span. Offsets are the global span order."""
    out = []
    for i, (kind, payload) in enumerate(fields):
        if kind == "text":
            out.append({"kind": "text", "text": payload, "media_ref": None, "offset": i})
        else:
            out.append({"kind": "media", "text": None, "media_ref": payload, "offset": i})
    return out


# ---------------------------------------------------------------- pools

def asn_pool(n: int = 200) -> list[int]:
    rng = _rng("asn_pool")
    return sorted(rng.sample(range(1, 400000), n))


def zipf_asns(rng: random.Random, k: int) -> list[int]:
    """Zipf-skewed ASN draw — hot-ASN skew on purpose (FIXTURES.md §2.1)."""
    pool = asn_pool()
    weights = [1.0 / (i + 1) for i in range(len(pool))]
    return rng.choices(pool, weights=weights, k=k)


def prefix_pool(n: int = 500) -> list[str]:
    """~Half v4 / half v6; ~5% in non-compressed form; all syntactically valid."""
    rng = _rng("prefix_pool")
    out = []
    for i in range(n):
        if i % 2 == 0:
            a, b, c = rng.randint(1, 223), rng.randint(0, 255), rng.randint(0, 255)
            plen = rng.choice([16, 20, 22, 24])
            octets = [a, b, c if plen > 16 else 0, 0]
            if plen <= 16:
                octets[2] = 0
            out.append(f"{octets[0]}.{octets[1]}.{octets[2]}.{octets[3]}/{plen}")
        else:
            h = rng.randint(0, 0xFFFF)
            plen = rng.choice([32, 40, 48])
            if rng.random() < 0.10:  # non-compressed form
                out.append(f"2001:0db8:{h:04x}:0000::/{plen}" if plen >= 48
                           else f"2001:0db8:{h:04x}::/{plen}")
            else:
                out.append(f"2001:db8:{h:x}::/{plen}")
    return out


MALFORMED_PREFIXES = ["300.1.2.0/24", "10.0.0.0/33", "not-a-prefix", "1.2.3.4/-1"]

COUNTRIES = ["jp", "us", "de", "fr", "nl", "br", "in", "au", "za", "gb",
             "it", "es", "se", "no", "fi", "pl", "cz", "ch", "at", "be",
             "ca", "mx", "ar", "cl", "kr", "sg", "id", "th", "vn", "ke"]

ORG_WORDS = ["Net", "Telecom", "Fiber", "Cloud", "Link", "Wave", "Core",
             "Edge", "Peak", "Nova", "Delta", "Orbit", "Pulse", "Vertex"]


def org_name(rng: random.Random) -> str:
    return f"{rng.choice(ORG_WORDS)}{rng.choice(ORG_WORDS)} {rng.choice(['Inc', 'LLC', 'GmbH', 'SA', 'Ltd'])}"


# ---------------------------------------------------------------- generators
# Each returns list[FixtureDoc]; `scale` multiplies record counts (bench corpus
# reuses the same generators at 100×, FIXTURES.md §1).

def gen_bgpkit_pfx2asn(scale: float = 1.0) -> list[FixtureDoc]:
    """FIXTURES.md §2.1 — ref iyp/crawlers/bgpkit/pfx2asn.py:32-60."""
    name = "bgpkit.pfx2asn"
    rng = _rng(name)
    n = int(1000 * scale)
    prefixes = prefix_pool()
    asns = zipf_asns(rng, n)
    docs = []
    for i in range(n):
        if rng.random() < 0.02:
            prefix = rng.choice(MALFORMED_PREFIXES)
        else:
            prefix = rng.choice(prefixes)
        rec = {"prefix": prefix, "asn": asns[i]}
        docs.append(
            FixtureDoc(
                doc_id=f"{name}/{i:06d}",
                crawler=name,
                spans=_spans([("text", prefix), ("text", str(asns[i]))]),
                record=rec,
            )
        )
    return docs


def gen_ripe_as_names(scale: float = 1.0) -> list[FixtureDoc]:
    """FIXTURES.md §2.2 — ref iyp/crawlers/ripe/as_names.py:29-66."""
    name = "ripe.as_names"
    rng = _rng(name)
    n = int(800 * scale)
    pool = asn_pool()
    docs = []
    for i in range(n):
        asn = rng.choice(pool)
        nm = org_name(rng)
        r = rng.random()
        if r < 0.01:
            line = f"{asn} {nm}"  # missing cc
        elif r < 0.02:
            line = f"{asn} {nm}, {rng.choice(COUNTRIES).upper()}X"  # cc len 3
        elif r < 0.03:
            line = f"{asn} "  # missing name+cc
        else:
            line = f"{asn} {nm}, {rng.choice(COUNTRIES).upper()}"
        docs.append(
            FixtureDoc(
                doc_id=f"{name}/{i:06d}",
                crawler=name,
                spans=_spans([("text", line)]),
                record={"line": line},
            )
        )
    return docs


def gen_caida_asrank(scale: float = 1.0) -> list[FixtureDoc]:
    """FIXTURES.md §2.3 — ref iyp/crawlers/caida/asrank.py:56-116."""
    name = "caida.asrank"
    rng = _rng(name)
    pool = asn_pool()
    n = min(int(400 * scale), len(pool)) if scale <= 1 else int(400 * scale)
    chosen = [pool[i % len(pool)] for i in range(n)]
    docs = []
    for i, asn in enumerate(chosen):
        rec = {
            "asn": str(asn),
            "asnName": "" if rng.random() < 0.10 else org_name(rng),
            "rank": i + 1,
            "country": {"iso": "" if rng.random() < 0.10 else rng.choice(COUNTRIES).upper()},
            "latitude": None if rng.random() < 0.20 else round(rng.uniform(-60, 70), 4),
            "longitude": None if rng.random() < 0.20 else round(rng.uniform(-180, 180), 4),
        }
        docs.append(
            FixtureDoc(
                doc_id=f"{name}/{i:06d}",
                crawler=name,
                spans=_spans([
                    ("text", json.dumps(rec, sort_keys=True)),
                    ("media", f"blob://logo/{asn}"),
                ]),
                record=rec,
            )
        )
    return docs


def gen_bgpkit_as2rel(scale: float = 1.0,
                      name: str = "bgpkit.as2rel_v4") -> list[FixtureDoc]:
    """FIXTURES.md §2.4 — ref iyp/crawlers/bgpkit/__init__.py:29-47."""
    rng = _rng(name)
    n = int(600 * scale)
    docs = []
    seen = set()
    draws = zipf_asns(rng, 2 * n)  # one Zipf draw for all pairs (pool built once)
    for i in range(n):
        a1, a2 = draws[2 * i], draws[2 * i + 1]
        if a1 == a2 or (a1, a2) in seen:
            continue
        seen.add((a1, a2))
        rec = {"asn1": a1, "asn2": a2, "rel": rng.choice([0, 1]),
               "peers_count": rng.randint(1, 500)}
        docs.append(
            FixtureDoc(
                doc_id=f"{name}/{i:06d}",
                crawler=name,
                spans=_spans([("text", json.dumps(rec, sort_keys=True))]),
                record=rec,
            )
        )
    return docs


GENERATORS: dict[str, callable] = {
    "bgpkit.pfx2asn": gen_bgpkit_pfx2asn,
    "ripe.as_names": gen_ripe_as_names,
    "caida.asrank": gen_caida_asrank,
    "bgpkit.as2rel_v4": gen_bgpkit_as2rel,
}


def all_docs(scale: float = 1.0, crawlers: list[str] | None = None) -> list[FixtureDoc]:
    names = crawlers or list(GENERATORS)
    out = []
    for n in names:
        out.extend(GENERATORS[n](scale))
    return out


def docs_to_rows(docs: list[FixtureDoc]) -> list[tuple]:
    return [
        (
            d.doc_id,
            [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d.spans],
            d.crawler,
        )
        for d in docs
    ]


def write_corpus(store, scale: float = 1.0, crawlers: list[str] | None = None) -> int:
    """Materialize the fixture corpus into the store's documents table."""
    from .schema import DOCUMENTS_SCHEMA

    docs = all_docs(scale, crawlers)
    df = store.spark.createDataFrame(docs_to_rows(docs), DOCUMENTS_SCHEMA)
    store.write_documents(df)
    return len(docs)


# ---------------------------------------------------------------- batch 2

TLDS = ["com", "net", "org", "io"]


def domain_pool(n: int = 300) -> list[str]:
    rng = _rng("domain_pool")
    out = []
    for i in range(n):
        w = rng.choice(ORG_WORDS).lower() + rng.choice(ORG_WORDS).lower()
        out.append(f"{w}{i}.{rng.choice(TLDS)}")
    return out


def gen_tranco_top1m(scale: float = 1.0) -> list[FixtureDoc]:
    """FIXTURES.md §2.8 — ref iyp/crawlers/tranco/top1m.py:44-63."""
    name = "tranco.top1m"
    rng = _rng(name)
    pool = domain_pool()
    n = min(int(300 * scale), len(pool)) if scale <= 1 else len(pool)
    order = rng.sample(pool, n) if n <= len(pool) else pool
    docs = []
    for i, dom in enumerate(order):
        line = f"{i + 1},{dom}"
        docs.append(FixtureDoc(f"{name}/{i:06d}", name,
                               _spans([("text", line)]), {"rank": i + 1, "domain": dom}))
    return docs


def gen_cisco_umbrella(scale: float = 1.0) -> list[FixtureDoc]:
    """FIXTURES.md §2.8 — ref iyp/crawlers/cisco/umbrella_top1m.py:59-122.
    Mixes existing domains (tranco pool), new 2-label domains, 3-label
    hostnames, and PSL-hard names (multi-label public suffixes like co.uk,
    wildcard *.ck suffixes, the !www.ck exception, bare suffixes, unknown
    TLDs) that a naive label-count heuristic misclassifies; a few invalid
    lines (no comma)."""
    name = "cisco.umbrella_top1m"
    rng = _rng(name)
    pool = domain_pool()
    n = int(400 * scale)
    docs = []
    for i in range(n):
        r = rng.random()
        if r < 0.02:
            line = f"{i + 1}"  # invalid: no comma → skipped
            rec = {"rank": i + 1, "name": None}
        else:
            w = rng.choice(ORG_WORDS).lower()
            if r < 0.45:
                nm = rng.choice(pool)  # likely existing DomainName
            elif r < 0.60:
                nm = f"{w}{i}new.{rng.choice(TLDS)}"  # new 2-label domain
            elif r < 0.72:
                sub = rng.choice(["www", "mail", "cdn", "api"])
                nm = f"{sub}.{rng.choice(pool)}"  # hostname
            elif r < 0.80:
                # 3-label REGISTERED domain: DomainName despite label count
                nm = f"{w}{i}.{rng.choice(['co.uk', 'com.au', 'co.jp', 'com.br'])}"
            elif r < 0.85:
                # 4-label host under a 2-label suffix
                nm = f"www.{w}{i}.{rng.choice(['co.uk', 'org.uk', 'co.nz'])}"
            elif r < 0.89:
                # wildcard suffix (*.ck): shop.<x>.ck IS a registered domain,
                # <x>.ck is itself a public suffix → HostName
                nm = f"shop.{w}{i}.ck" if rng.random() < 0.5 else f"{w}{i}.ck"
            elif r < 0.91:
                nm = "www.ck"  # PSL exception rule !www.ck → DomainName
            elif r < 0.95:
                nm = rng.choice(["co.uk", "com.au", "ac.jp"])  # bare suffix
            else:
                nm = f"{w}{i}.unknowntld"  # no PSL rule → no registered domain
            line = f"{i + 1},{nm}"
            rec = {"rank": i + 1, "name": nm}
        docs.append(FixtureDoc(f"{name}/{i:06d}", name, _spans([("text", line)]), rec))
    return docs


def gen_ihr_hegemony(scale: float = 1.0,
                     name: str = "ihr.local_hegemony_v4") -> list[FixtureDoc]:
    """FIXTURES.md §2.10 — ref iyp/crawlers/ihr/__init__.py:49-81.
    Two timebins; only the first is kept by the reference."""
    rng = _rng(name)
    pool = asn_pool()
    n = int(500 * scale)
    timebins = ["2026-01-01 00:00:00+00", "2026-01-01 08:00:00+00"]
    docs = []
    for i in range(n):
        tb = timebins[0] if i < n * 0.7 else timebins[1]
        o, a = rng.choice(pool), rng.choice(pool)
        hege = round(rng.random(), 4)
        line = f"{tb},{o},{a},{hege}"
        docs.append(FixtureDoc(f"{name}/{i:06d}", name, _spans([("text", line)]),
                               {"timebin": tb, "originasn": o, "asn": a, "hege": hege}))
    return docs


BGPTOOLS_TAGS = {"cdn": "Content Delivery Network", "dsl": "Home ISP",
                 "a10k": "Tranco 10k Host", "vpn": "VPN Host"}


def gen_bgptools_tags(scale: float = 1.0) -> list[FixtureDoc]:
    """FIXTURES.md §2.11 — ref iyp/crawlers/bgptools/tags.py:57-94.
    One document per (tag, AS) row; span 0 = tag label, span 1 = csv row."""
    name = "bgptools.tags"
    rng = _rng(name)
    pool = asn_pool()
    n = int(400 * scale)
    docs = []
    for i in range(n):
        tag, label = rng.choice(sorted(BGPTOOLS_TAGS.items()))
        asn = rng.choice(pool)
        row = f"AS{asn},{org_name(rng)}"
        docs.append(FixtureDoc(f"{name}/{i:06d}", name,
                               _spans([("text", label), ("text", row)]),
                               {"label": label, "asn": asn}))
    return docs


ASDB_CATS = {
    "Computer and IT": ["Hosting", "Software", "Other"],
    "Media": ["Streaming", "News", "Other"],
    "Finance": ["Banking", "Insurance"],
    "Education": ["University"],
}


def gen_stanford_asdb(scale: float = 1.0) -> list[FixtureDoc]:
    """FIXTURES.md §2.11 — ref iyp/crawlers/stanford/asdb.py:50-118.
    Line: ASN,cat1,sub1[,cat2,sub2] with 'Other' subcats to drop and some
    empty subcategories."""
    name = "stanford.asdb"
    rng = _rng(name)
    pool = asn_pool()
    n = int(300 * scale)
    docs = []
    for i in range(n):
        asn = rng.choice(pool)
        n_pairs = rng.choice([1, 1, 2])
        parts = [f"AS{asn}"]
        pairs = []
        for _ in range(n_pairs):
            cat = rng.choice(sorted(ASDB_CATS))
            sub = rng.choice(ASDB_CATS[cat] + [""])
            parts += [cat, sub]
            pairs.append((cat, sub))
        line = ",".join(parts)
        docs.append(FixtureDoc(f"{name}/{i:06d}", name, _spans([("text", line)]),
                               {"asn": asn, "pairs": pairs}))
    return docs


def gen_apnic_eyeball(scale: float = 1.0) -> list[FixtureDoc]:
    """FIXTURES.md §2.12 — ref iyp/crawlers/apnic/eyeball.py:40-84.
    One document per (country, AS estimate); span 0 = cc, span 1 = JSON.
    Percents are unique per country (the reference's sort is tie-unstable)."""
    name = "apnic.eyeball"
    rng = _rng(name)
    pool = asn_pool()
    ccs = sorted(COUNTRIES[: max(3, int(10 * min(scale, 3)))])
    per_cc = max(5, int(30 * scale))
    docs = []
    i = 0
    for cc in ccs:
        percents = rng.sample(range(1, 10000), per_cc)
        chosen = rng.sample(pool, min(per_cc, len(pool)))
        for j, asn in enumerate(chosen):
            rec = {"as": asn, "autnum": f"AS{asn}-NAME",
                   "percent": percents[j] / 100.0}
            docs.append(FixtureDoc(
                f"{name}/{i:06d}", name,
                _spans([("text", cc.upper()), ("text", json.dumps(rec, sort_keys=True))]),
                {"cc": cc.upper(), **rec},
            ))
            i += 1
    return docs


GENERATORS.update({
    "tranco.top1m": gen_tranco_top1m,
    "cisco.umbrella_top1m": gen_cisco_umbrella,
    "ihr.local_hegemony_v4": gen_ihr_hegemony,
    "bgptools.tags": gen_bgptools_tags,
    "stanford.asdb": gen_stanford_asdb,
    "apnic.eyeball": gen_apnic_eyeball,
})


# ---------------------------------------------------------------- batch 3

def _org_pool(rng: random.Random, n: int = 50) -> list[dict]:
    out = []
    for i in range(n):
        out.append({
            "id": 1000 + i,
            "name": f"{org_name(rng)} {i}",
            "website": (f"https://org{i}.example.com" if rng.random() > 0.15 else ""),
            "country": ("XX" if rng.random() < 0.05 else rng.choice(COUNTRIES).upper()),
            "latitude": None if rng.random() < 0.3 else round(rng.uniform(-60, 70), 4),
            "longitude": None if rng.random() < 0.3 else round(rng.uniform(-180, 180), 4),
            "social_media": (
                [{"service": "website", "identifier": f"https://smedia{i}.example.com"}]
                if rng.random() < 0.2 else []
            ),
        })
    return out


def peeringdb_orgs() -> list[dict]:
    return _org_pool(_rng("peeringdb.org"))


def gen_peeringdb_org(scale: float = 1.0) -> list[FixtureDoc]:
    """FIXTURES.md §2.6 — ref iyp/crawlers/peeringdb/org.py:48-131.
    One document per org record; +1 media span (logo) to exercise
    interleaving."""
    name = "peeringdb.org"
    orgs = peeringdb_orgs()
    n = min(len(orgs), max(5, int(len(orgs) * scale))) if scale < 1 else len(orgs)
    docs = []
    for i, org in enumerate(orgs[:n]):
        docs.append(FixtureDoc(
            f"{name}/{i:06d}", name,
            _spans([
                ("text", json.dumps(org, sort_keys=True)),
                ("media", f"blob://orglogo/{org['id']}"),
            ]),
            org,
        ))
    return docs


def _peering_prefix(rng: random.Random, i: int) -> str:
    if i % 3 == 2:
        return f"2001:7f8:{i:x}::/64"
    return f"198.{32 + (i % 128)}.{(i * 4) % 256}.0/24"


def peeringdb_nets(rng: random.Random, n: int = 80) -> list[dict]:
    pool = asn_pool()
    nets = []
    for i in range(n):
        nets.append({
            "id": 5000 + i,
            "asn": pool[(i * 7) % len(pool)],
            "name": f"Net {org_name(rng)} {i}",
            "website": (f"https://net{i}.example.net" if rng.random() > 0.3 else ""),
            "org_id": (1000 + (i % 50)) if rng.random() > 0.1 else 9999,  # 10% unknown org
        })
    return nets


def gen_peeringdb_ix(scale: float = 1.0) -> list[FixtureDoc]:
    """FIXTURES.md §2.6 — ref iyp/crawlers/peeringdb/ix.py:113-308.
    Two record kinds in one crawler: 'ix' and 'ixlan' documents
    (span 0 = kind tag, span 1 = JSON record)."""
    name = "peeringdb.ix"
    rng = _rng(name)
    nets = peeringdb_nets(rng)
    n_ix = max(6, int(30 * min(scale, 1.0))) if scale <= 1 else 30
    n_lan = max(8, int(40 * min(scale, 1.0))) if scale <= 1 else 40
    ixlans = []
    for i in range(n_lan):
        k = rng.randint(0, 5)
        ixlans.append({
            "id": 300 + i,
            "ixpfx_set": [
                {"prefix": ("999.1.2.0/24" if rng.random() < 0.03
                            else _peering_prefix(rng, i * 2 + j))}
                for j in range(rng.randint(1, 2))
            ],
            "net_set": rng.sample(nets, k) if k else [],
        })
    docs = []
    seq = 0
    for i in range(n_ix):
        ix = {
            "id": 100 + i,
            "name": f"IX-{COUNTRIES[i % len(COUNTRIES)].upper()}-{i}",
            "org_id": (1000 + (i % 50)) if rng.random() > 0.1 else 9999,
            "country": "" if rng.random() < 0.1 else rng.choice(COUNTRIES).upper(),
            "website": (f"https://ix{i}.example.org" if rng.random() > 0.2 else ""),
            "fac_set": [{"id": 700 + i}],
            # ~2% dangling ixlan references (ref ix.py:203-206 error-log skip)
            "ixlan_set": [
                {"id": (300 + rng.randrange(n_lan)) if rng.random() > 0.02 else 9999}
                for _ in range(rng.randint(1, 2))
            ],
        }
        docs.append(FixtureDoc(f"{name}/{seq:06d}", name,
                               _spans([("text", "ix"),
                                       ("text", json.dumps(ix, sort_keys=True))]), ix))
        seq += 1
    for lan in ixlans:
        docs.append(FixtureDoc(f"{name}/{seq:06d}", name,
                               _spans([("text", "ixlan"),
                                       ("text", json.dumps(lan, sort_keys=True))]),
                               lan))
        seq += 1
    return docs


def gen_caida_as2org(scale: float = 1.0) -> list[FixtureDoc]:
    """FIXTURES.md §2.7 — ref iyp/crawlers/caida/as2org.py:76-163.
    One document per line; org lines have 5 pipe fields, AS lines 6
    (the reference switches mode on header comment lines; field count is
    the stateless equivalent). Includes @del org ids and same-name orgs
    with different ids/countries."""
    name = "caida.as2org"
    rng = _rng(name)
    pool = asn_pool()
    n_orgs = max(10, int(40 * min(scale, 1.0)))
    orgs = []
    for i in range(n_orgs):
        if i % 7 == 3 and i > 0:
            org_nm = orgs[i - 1]["name"]  # same name, different id/country
        else:
            org_nm = f"{org_name(rng)} #{i}"
        orgs.append({
            "org_id": (f"@del-{i}" if rng.random() < 0.05 else f"ORG-{i}-CA"),
            "name": org_nm,
            "country": rng.choice(COUNTRIES).upper(),
        })
    docs = []
    seq = 0
    for o in orgs:
        line = f"{o['org_id']}|20250101|{o['name']}|{o['country']}|CAIDA"
        docs.append(FixtureDoc(f"{name}/{seq:06d}", name,
                               _spans([("text", line)]),
                               {"kind": "org", **o}))
        seq += 1
    n_as = int(300 * scale)
    for i in range(n_as):
        asn = rng.choice(pool)
        o = rng.choice(orgs)
        line = f"{asn}|20250101|AS{asn}-NAME|{o['org_id']}|opq-{i}|CAIDA"
        docs.append(FixtureDoc(f"{name}/{seq:06d}", name,
                               _spans([("text", line)]),
                               {"kind": "as", "asn": asn, "org_id": o["org_id"]}))
        seq += 1
    return docs


def gen_nro_delegated(scale: float = 1.0) -> list[FixtureDoc]:
    """FIXTURES.md §2.5 — ref iyp/crawlers/nro/delegated_stats.py:77-197.
    Pipe lines; asn records link only pre-existing ASNs; ipv4 ranges may
    need CIDR decomposition; comment/version/summary lines included."""
    name = "nro.delegated_stats"
    rng = _rng(name)
    pool = asn_pool()
    docs = []
    seq = 0

    def emit(line, rec):
        nonlocal seq
        docs.append(FixtureDoc(f"{name}/{seq:06d}", name,
                               _spans([("text", line)]), rec))
        seq += 1

    emit("# delegated-extended file", {"kind": "comment"})
    emit("2.3|nro|20260101|123|19830705|20260101|+0000", {"kind": "version"})
    emit("nro|*|asn|*|42|summary", {"kind": "summary"})
    n = int(400 * scale)
    for i in range(n):
        registry = rng.choice(["apnic", "ripencc", "arin", "afrinic", "lacnic"])
        cc = rng.choice(COUNTRIES).upper()
        status = rng.choice(["assigned", "allocated", "available", "reserved"])
        opaque = f"opq-{rng.randrange(60)}"
        kind = rng.choice(["asn", "asn", "ipv4", "ipv4", "ipv6"])
        if kind == "asn":
            if rng.random() < 0.25:
                start = rng.choice(pool)
                value = rng.choice([2, 5, 50, 1000])  # AS range (J6 overlap join)
            elif rng.random() < 0.85:
                start, value = rng.choice(pool), 1
            else:
                start, value = 900000 + i, 1  # not in IYP → no link
            line = f"{registry}|{cc}|asn|{start}|{value}|20250101|{status}|{opaque}"
        elif kind == "ipv4":
            a, b = rng.randint(11, 180), rng.randint(0, 255)
            if rng.random() < 0.3:
                start, value = f"{a}.{b}.0.0", rng.choice([3000, 7000, 12288])  # decompose
            else:
                start, value = f"{a}.{b}.0.0", rng.choice([256, 1024, 65536])  # aligned
            line = f"{registry}|{cc}|ipv4|{start}|{value}|20250101|{status}|{opaque}"
        else:
            h = rng.randint(0, 0xFFF)
            start, value = f"2001:db{h % 10}:{h:x}::", rng.choice([32, 48])
            line = f"{registry}|{cc}|ipv6|{start}|{value}|20250101|{status}|{opaque}"
        emit(line, {"kind": kind, "registry": registry, "cc": cc,
                    "start": str(start), "value": value, "status": status.upper(),
                    "opaque": opaque})
    return docs


GENERATORS.update({
    "peeringdb.org": gen_peeringdb_org,
    "peeringdb.ix": gen_peeringdb_ix,
    "caida.as2org": gen_caida_as2org,
    "nro.delegated_stats": gen_nro_delegated,
})


# ---------------------------------------------------------------- batch 4

def gen_inetintel_as_org(scale: float = 1.0) -> list[FixtureDoc]:
    """FIXTURES.md §2.14 — ref iyp/crawlers/inetintel/as_org.py:46-119.
    One document per ASN entry; multi-ASN org groups; PDB.Org references
    peeringdb org names (some unknown)."""
    name = "inetintel.as_org"
    rng = _rng(name)
    pool = asn_pool()
    pdb_names = [o["name"].strip() for o in peeringdb_orgs()]
    n_groups = max(8, int(40 * min(scale, 1.0)))
    docs = []
    seq = 0
    used = set()
    for g in range(n_groups):
        k = rng.choice([1, 1, 2, 2, 3, 5])
        members = [a for a in rng.sample(pool, k) if a not in used][: max(1, k)]
        used.update(members)
        org_id = f"II-ORG-{g}"
        pdb = rng.choice(pdb_names) if rng.random() < 0.6 else f"Unknown Org {g}"
        for asn in members:
            r = rng.random()
            if r < 0.25:
                website = f"https://www.oidom{g % 6}.net/as{asn}"  # known host
            elif r < 0.5:
                website = f"https://as{asn}.example.com"
            else:
                website = ""
            rec = {"OrgID": org_id, "PDB.Org": pdb, "Website": website}
            docs.append(FixtureDoc(
                f"{name}/{seq:06d}", name,
                _spans([("text", str(asn)), ("text", json.dumps(rec, sort_keys=True))]),
                {"asn": asn, **rec},
            ))
            seq += 1
    return docs


def gen_openintel(scale: float = 1.0,
                  name: str = "openintel.tranco1m") -> list[FixtureDoc]:
    """FIXTURES.md §2.9 — ref iyp/crawlers/openintel/__init__.py:253-443.
    DNS measurement rows with trailing root dots, non-compressed IPv6,
    2-link CNAME chains, NS records, apex hosts (host name == domain name),
    and exact duplicate rows. Parameterized by crawler name: infra_ns and
    umbrella1m reuse the same record shape over their own seeds
    (ref openintel/infra_ns.py, umbrella1m.py)."""
    rng = _rng(name)
    n_dom = max(6, int(30 * min(scale, 1.0)))
    docs = []
    seq = 0
    # v4 addresses drawn INSIDE pfx2asn pool prefixes so the ip2prefix
    # post-processor has real LPM work (FIXTURES.md §4)
    import ipaddress as _ip
    v4nets = []
    for p in prefix_pool():
        if "." not in p:
            continue
        try:
            v4nets.append(_ip.ip_network(p))  # skip host-bit-set pool entries
        except ValueError:
            continue
        if len(v4nets) >= 8:
            break

    def _ip_in(i, off):
        net = v4nets[i % len(v4nets)]
        return str(net.network_address + 1 + (off % max(net.num_addresses - 2, 1)))

    def emit(qt, qn, rt, rn, ip4=None, ip6=None, ns=None, cname=None):
        nonlocal seq
        rec = {"query_type": qt, "query_name": qn, "response_type": rt,
               "response_name": rn, "ip4_address": ip4, "ip6_address": ip6,
               "ns_address": ns, "cname_name": cname}
        docs.append(FixtureDoc(f"{name}/{seq:06d}", name,
                               _spans([("text", json.dumps(rec, sort_keys=True))]),
                               rec))
        seq += 1

    for i in range(n_dom):
        dom = f"oidom{i}.net"
        # NS record (domain managed by nameserver)
        emit("NS", f"{dom}.", "NS", f"{dom}.", ns=f"ns{i % 4}.oidom0.net.")
        # apex A record: host name == domain name → PART_OF via intersection
        if i % 3 == 0:
            emit("A", f"{dom}.", "A", f"{dom}.", ip4=_ip_in(i, 1))
        # direct A on a subdomain host
        emit("A", f"www.{dom}.", "A", f"www.{dom}.", ip4=_ip_in(i, 10))
        # duplicate row (drop_duplicates, ref :276)
        if i % 5 == 0:
            emit("A", f"www.{dom}.", "A", f"www.{dom}.", ip4=_ip_in(i, 10))
        # AAAA with non-compressed IPv6
        if i % 2 == 0:
            emit("AAAA", f"v6.{dom}.", "AAAA", f"v6.{dom}.",
                 ip6=f"2001:0DB8:00{i % 9}0::0001")
        # 2-link CNAME chain: cdn.dom → edge.dom → target.oidom0.net → A
        if i % 4 == 1:
            h0, h1, h2 = f"cdn.{dom}", f"edge.{dom}", "target.oidom0.net"
            emit("A", f"{h0}.", "CNAME", f"{h0}.", cname=f"{h1}.")
            emit("A", f"{h0}.", "CNAME", f"{h1}.", cname=f"{h2}.")
            emit("A", f"{h0}.", "A", f"{h2}.", ip4=f"203.0.99.{i % 250}")
        # an NS query answered by CNAME (ignored for aliases, ref :328-330)
        if i % 6 == 2:
            emit("NS", f"{dom}.", "CNAME", f"{dom}.", cname=f"alias.{dom}.")
        # unresolvable CNAME chain (no A record → no RESOLVES_TO)
        if i % 7 == 3:
            emit("A", f"dead.{dom}.", "CNAME", f"dead.{dom}.", cname=f"gone.{dom}.")
    return docs


GENERATORS.update({
    "inetintel.as_org": gen_inetintel_as_org,
    "openintel.tranco1m": gen_openintel,
})


def gen_pch_routing(scale: float = 1.0) -> list[FixtureDoc]:
    """FIXTURES.md §2.13 — ref pch/__init__.py:203-251, show_bgp_parser.py.
    One document per collector: span 0 = collector name, span 1 = the full
    'show ip bgp' text, span 2 = media blob ref. The record carries the
    generator's INTENT (expected (prefix, asn) pairs), so the golden is
    independent of any parser implementation."""
    name = "pch.daily_routing_snapshots_v4"
    rng = _rng(name)
    pool = asn_pool()
    n_collectors = max(4, int(12 * min(scale, 2.0)))
    n_routes = max(10, int(40 * scale))
    docs = []
    for c in range(n_collectors):
        collector = f"route-collector.{COUNTRIES[c % len(COUNTRIES)]}{c}.pch.net"
        lines = [
            f"BGP table version is {1000 + c}, local router ID is 198.51.100.{c}",
            "Status codes: s suppressed, d damped, h history, * valid, > best",
            "Origin codes: i - IGP, e - EGP, ? - incomplete",
            "",
            "   Network          Next Hop            Metric LocPrf Weight Path",
        ]
        expected = set()
        last_pfx = None
        for r in range(n_routes):
            a, b = rng.randint(11, 200), rng.randint(0, 255)
            origin = rng.choice(pool)
            path = " ".join(str(x) for x in rng.sample(pool, rng.randint(1, 3)) + [origin])
            kind = rng.random()
            if kind < 0.10:
                # non-valid status → skipped
                lines.append(f"s  {a}.{b}.0.0/16 192.0.2.1 0 100 {path} i")
                last_pfx = f"{a}.{b}.0.0/16"
            elif kind < 0.18:
                # incomplete origin → skipped
                lines.append(f"*> {a}.{b}.0.0/16 192.0.2.1 0 100 {path} ?")
                last_pfx = f"{a}.{b}.0.0/16"
            elif kind < 0.25:
                # AS-set origin → skipped
                s1, s2 = rng.sample(pool, 2)
                lines.append(f"*> {a}.{b}.0.0/16 192.0.2.1 0 100 {path} {{{s1},{s2}}} i".replace(f"{path} ", ""))
                last_pfx = f"{a}.{b}.0.0/16"
            elif kind < 0.40 and last_pfx is not None:
                # inherited prefix (no network field)
                lines.append(f"*  192.0.2.{r % 250} 0 100 {path} i")
                expected.add((last_pfx, origin))
            elif kind < 0.50:
                # classful line without mask (aligned address)
                first = rng.choice([10, 150, 200])
                plen = 8 if first < 128 else (16 if first < 192 else 24)
                net = (f"{first}.0.0.0" if plen == 8
                       else f"{first}.{b}.0.0" if plen == 16
                       else f"{first}.{b}.{a % 250}.0")
                lines.append(f"*> {net} 192.0.2.1 0 100 {path} i")
                last_pfx = f"{net}/{plen}"
                expected.add((f"{net}/{plen}", origin))
            elif kind < 0.62:
                # wrapped line: network alone, rest on the next line
                pfx = f"{a}.{b}.0.0/16"
                lines.append(f"*> {pfx}")
                lines.append(f"                 192.0.2.{r % 250} 0 100 {path} i")
                last_pfx = pfx
                expected.add((pfx, origin))
            else:
                pfx = f"{a}.{b}.0.0/16"
                lines.append(f"*> {pfx} 192.0.2.{r % 250} 0 100 {path} i")
                last_pfx = pfx
                expected.add((pfx, origin))
        lines.append("")
        lines.append(f"Total number of prefixes {n_routes}")
        text = "\n".join(lines)
        docs.append(FixtureDoc(
            f"{name}/{c:06d}", name,
            _spans([("text", collector), ("text", text),
                    ("media", f"blob://snapshot/{collector}")]),
            {"collector": collector,
             "expected": sorted(expected)},
        ))
    return docs


GENERATORS["pch.daily_routing_snapshots_v4"] = gen_pch_routing


# ---------------------------------------------------------------- batch 5

def gen_worldbank_pop(scale: float = 1.0) -> list[FixtureDoc]:
    """ref worldbank/country_pop.py:25-63: one doc per API entry; some
    countries unknown to IYP, some null values."""
    name = "worldbank.country_pop"
    rng = _rng(name)
    docs = []
    ccs = [c.upper() for c in COUNTRIES] + ["ZZ", "XK", "QQ"]  # unknowns
    for i, cc in enumerate(ccs):
        value = None if rng.random() < 0.1 else rng.randint(100000, 900000000)
        rec = {"country": {"id": cc}, "value": value}
        docs.append(FixtureDoc(f"{name}/{i:06d}", name,
                               _spans([("text", json.dumps(rec, sort_keys=True))]),
                               {"cc": cc, "value": value}))
    return docs


def gen_iana_root_zone(scale: float = 1.0) -> list[FixtureDoc]:
    """ref iana/root_zone.py:30-105: zone-file lines; uncompressed IPv6,
    non-IN classes, unsupported types, short lines."""
    name = "iana.root_zone"
    rng = _rng(name)
    n_tld = max(8, int(30 * min(scale, 1.0)))
    docs = []
    seq = 0

    def emit(line, rec):
        nonlocal seq
        docs.append(FixtureDoc(f"{name}/{seq:06d}", name,
                               _spans([("text", line)]), rec))
        seq += 1

    for i in range(n_tld):
        tld = f"zone{i}"
        ns = f"a.nic.{tld}"
        emit(f"{tld}. 172800 IN NS {ns}.", {"kind": "NS", "name": tld, "ns": ns})
        emit(f"{ns}. 172800 IN A 198.41.{i % 250}.4",
             {"kind": "A", "name": ns, "ip": f"198.41.{i % 250}.4"})
        if i % 2 == 0:
            import ipaddress as _ipm
            raw6 = f"2001:dcd:{i % 9}:0:0:0:0:9"
            emit(f"{ns}. 172800 IN AAAA {raw6}",
                 {"kind": "AAAA", "name": ns,
                  "ip": _ipm.ip_address(raw6).compressed})
        if i % 5 == 0:
            emit(f"{tld}. 86400 IN TXT \"junk\"", {"kind": "skip"})
        if i % 7 == 0:
            emit(f"{tld}. 172800 CH NS weird.{tld}.", {"kind": "skip"})
        if i % 9 == 0:
            emit("short line", {"kind": "skip"})
    return docs


def gen_ripe_roa(scale: float = 1.0) -> list[FixtureDoc]:
    """ref ripe/roa.py:35-100: roas.csv lines incl. header and malformed
    prefixes; ASNs carry the 'AS' prefix."""
    name = "ripe.roa"
    rng = _rng(name)
    pool = asn_pool()
    prefixes = prefix_pool()
    n = int(300 * scale)
    docs = []
    docs.append(FixtureDoc(f"{name}/000000", name,
                           _spans([("text", "URI,ASN,IP Prefix,Max Length,Not Before,Not After")]),
                           {"kind": "header"}))
    for i in range(1, n + 1):
        if rng.random() < 0.02:
            prefix = rng.choice(MALFORMED_PREFIXES)
        else:
            prefix = rng.choice(prefixes)
        asn = rng.choice(pool)
        line = (f"rsync://rpki.example/repo/{i}.roa,AS{asn},{prefix},"
                f"{rng.choice([16, 24, 32, 48])},2026-01-01,2027-01-01")
        docs.append(FixtureDoc(f"{name}/{i:06d}", name, _spans([("text", line)]),
                               {"kind": "roa", "asn": asn, "prefix": prefix}))
    return docs


GENERATORS.update({
    "worldbank.country_pop": gen_worldbank_pop,
    "iana.root_zone": gen_iana_root_zone,
    "ripe.roa": gen_ripe_roa,
})


# ---------------------------------------------------------------- ooni

OONI_CCS = ["US", "DE", "IR", "RU", "CN", "IN", "BR", "FR", "TR", "EG"]


def _ooni_base(rng: random.Random) -> dict:
    """Common OONI measurement skeleton (ref ooni/__init__.py:61-99):
    probe_asn 'AS<n>' (3% hidden AS0), probe_cc (sometimes invalid or
    missing), resolver_ip (global / private / malformed / missing)."""
    asn = 0 if rng.random() < 0.03 else rng.choice(asn_pool()[:40])
    rec = {"probe_asn": f"AS{asn}"}
    r = rng.random()
    if r < 0.85:
        rec["probe_cc"] = rng.choice(OONI_CCS)
    elif r < 0.93:
        rec["probe_cc"] = "ZZ"  # not ISO 3166 → node skipped
    r = rng.random()
    if r < 0.50:
        rec["resolver_ip"] = f"93.184.{rng.randint(0, 255)}.{rng.randint(1, 254)}"
    elif r < 0.60:
        rec["resolver_ip"] = f"10.{rng.randint(0, 255)}.0.1"  # private → dropped
    elif r < 0.70:
        rec["resolver_ip"] = "not-an-ip"
    elif r < 0.82:
        rec["resolver_ip"] = (
            f"2606:2800:{rng.randint(1, 0xFFFF):x}::{rng.randint(1, 0xFFFF):x}"
        )
    return rec


def _ooni_docs(name: str, records: list[dict]) -> list[FixtureDoc]:
    return [
        FixtureDoc(f"{name}/{i:06d}", name,
                   _spans([("text", json.dumps(rec))]), rec)
        for i, rec in enumerate(records)
    ]


def gen_ooni_webconnectivity(scale: float = 1.0) -> list[FixtureDoc]:
    """ref ooni/webconnectivity.py:29-103: URLs (hostname + IP-literal),
    blocking/accessible decision table, DNS query answers."""
    name = "ooni.webconnectivity"
    rng = _rng(name)
    hosts = domain_pool()[:25] + [f"www.{d}" for d in domain_pool()[25:35]]
    n = int(600 * scale)
    records = []
    for i in range(n):
        rec = _ooni_base(rng)
        r = rng.random()
        if r < 0.02:
            rec["test_keys"] = None
        elif r < 0.03:
            rec["test_keys"] = {}
        elif r < 0.05:
            rec["input"] = f"https://{rng.choice(hosts)}/"
            rec["test_keys"] = {"accessible": True}  # missing 'blocking' → pop
        else:
            is_ip_url = rng.random() < 0.12
            if is_ip_url:
                host = f"93.184.{rng.randint(0, 9)}.{rng.randint(1, 9)}"
                url = (f"https://{host}:8443/x" if rng.random() < 0.3
                       else f"http://{host}/x")
            else:
                host = rng.choice(hosts)
                url = f"https://{host}/page{i % 4}"
            rec["input"] = url
            kind = rng.random()
            if kind < 0.5:
                tk = {"blocking": False, "accessible": True}     # ok
            elif kind < 0.65:
                tk = ({"blocking": None, "accessible": None}
                      if rng.random() < 0.5
                      else {"blocking": False, "accessible": False})  # failure
            elif kind < 0.85:
                tk = {"blocking": rng.choice(["dns", "tcp_ip", "http-failure",
                                              "http-diff"]),
                      "accessible": False}                        # confirmed
            else:
                tk = {"blocking": "dns", "accessible": True}      # anomaly
            if not is_ip_url and rng.random() < 0.03:
                pass  # no 'queries' key → pop (ref :63-66)
            else:
                answers = []
                for _ in range(rng.randint(1, 2)):
                    a = rng.random()
                    if a < 0.55:
                        answers.append({"answer_type": "A",
                                        "ipv4": f"93.184.{rng.randint(0, 20)}"
                                                f".{rng.randint(1, 200)}"})
                    elif a < 0.70:
                        answers.append({"answer_type": "AAAA",
                                        "ipv6": f"2606:2800:{rng.randint(1, 50):x}"
                                                f"::{rng.randint(1, 99):x}"})
                    elif a < 0.80:
                        answers.append({"answer_type": "A",
                                        "ipv4": f"10.{rng.randint(0, 9)}.0.7"})
                    elif a < 0.90:
                        answers.append({"answer_type": "A", "ipv4": ""})  # scrubbed
                    else:
                        answers.append({"answer_type": "CNAME"})
                q = {"query_type": rng.choice(["A", "AAAA", "CNAME"]),
                     "hostname": host,
                     "failure": ("dns_nxdomain_error"
                                 if rng.random() < 0.08 else None),
                     "answers": answers}
                tk["queries"] = [q]
            rec["test_keys"] = tk
        records.append(rec)
    return _ooni_docs(name, records)


def gen_ooni_telegram(scale: float = 1.0) -> list[FixtureDoc]:
    """ref ooni/telegram.py:16-63."""
    name = "ooni.telegram"
    rng = _rng(name)
    records = []
    for _ in range(int(300 * scale)):
        rec = _ooni_base(rng)
        if rng.random() < 0.02:
            rec["test_keys"] = None
        else:
            rec["test_keys"] = {
                "telegram_http_blocking": rng.random() < 0.2,
                "telegram_tcp_blocking": rng.random() < 0.15,
                "telegram_web_status": rng.choice(["ok", "ok", "blocked", None]),
            }
        records.append(rec)
    return _ooni_docs(name, records)


def gen_ooni_whatsapp(scale: float = 1.0) -> list[FixtureDoc]:
    """ref ooni/whatsapp.py:18-62."""
    name = "ooni.whatsapp"
    rng = _rng(name)
    records = []
    for _ in range(int(300 * scale)):
        rec = _ooni_base(rng)
        if rng.random() < 0.02:
            rec["test_keys"] = None
        else:
            rec["test_keys"] = {
                "registration_server_status": rng.choice(["ok", "ok", "blocked"]),
                "whatsapp_endpoints_status": rng.choice(["ok", "ok", "blocked"]),
                "whatsapp_web_status": rng.choice(["ok", "ok", "ok", "blocked"]),
            }
        records.append(rec)
    return _ooni_docs(name, records)


def gen_ooni_signal(scale: float = 1.0) -> list[FixtureDoc]:
    """ref ooni/osignal.py:15-33: null status → pop."""
    name = "ooni.osignal"
    rng = _rng(name)
    records = []
    for _ in range(int(250 * scale)):
        rec = _ooni_base(rng)
        if rng.random() < 0.02:
            rec["test_keys"] = None
        else:
            rec["test_keys"] = {
                "signal_backend_status": rng.choice(
                    ["ok", "ok", "ok", "blocked", None])
            }
        records.append(rec)
    return _ooni_docs(name, records)


def gen_ooni_psiphon(scale: float = 1.0) -> list[FixtureDoc]:
    """ref ooni/psiphon.py:15-49: bootstrap_time × failure 4-way."""
    name = "ooni.psiphon"
    rng = _rng(name)
    records = []
    for _ in range(int(250 * scale)):
        rec = _ooni_base(rng)
        r = rng.random()
        if r < 0.02:
            rec["test_keys"] = None
        elif r < 0.05:
            rec["test_keys"] = {"failure": None}  # no bootstrap_time → pop
        else:
            bt = 0.0 if rng.random() < 0.3 else round(rng.uniform(0.5, 9.0), 3)
            fail = "connection_reset" if rng.random() < 0.25 else None
            rec["test_keys"] = {"bootstrap_time": bt, "failure": fail}
        records.append(rec)
    return _ooni_docs(name, records)


def gen_ooni_tor(scale: float = 1.0) -> list[FixtureDoc]:
    """ref ooni/tor.py:15-55: targets dict keyed by fingerprint; host:port
    addresses (v6 bracketed); protocol filter."""
    name = "ooni.tor"
    rng = _rng(name)
    protos = ["or_port_dirauth", "dir_port", "obfs4", "or_port", "unknown_proto"]
    target_ips = ([f"199.58.81.{i}" for i in range(1, 30)]
                  + [f"2610:1c1:3:{i:x}::42" for i in range(1, 10)])
    records = []
    for _ in range(int(250 * scale)):
        rec = _ooni_base(rng)
        if rng.random() < 0.02:
            rec["test_keys"] = None
        else:
            targets = {}
            for t in range(rng.randint(1, 4)):
                ip = rng.choice(target_ips)
                addr = f"[{ip}]:{rng.choice([443, 9001])}" if ":" in ip \
                    else f"{ip}:{rng.choice([443, 9001])}"
                targets[f"fp{t}{rng.randint(0, 999)}"] = {
                    "target_address": addr,
                    "failure": ("generic_timeout_error"
                                if rng.random() < 0.3 else None),
                    "target_protocol": rng.choice(protos),
                }
            rec["test_keys"] = {"targets": targets}
        records.append(rec)
    return _ooni_docs(name, records)


GENERATORS.update({
    "ooni.webconnectivity": gen_ooni_webconnectivity,
    "ooni.telegram": gen_ooni_telegram,
    "ooni.whatsapp": gen_ooni_whatsapp,
    "ooni.osignal": gen_ooni_signal,
    "ooni.psiphon": gen_ooni_psiphon,
    "ooni.tor": gen_ooni_tor,
})


# ---------------------------------------------------------------- caida ixs

def _pdb_ix_count(scale: float) -> int:
    """Mirror gen_peeringdb_ix's ix count so pdb_id references line up."""
    return max(6, int(30 * min(scale, 1.0))) if scale <= 1 else 30


def valid_prefix_pool() -> list[str]:
    """prefix_pool minus host-bits-set entries — for crawlers whose
    reference does a STRICT ip_network() (maxmind geolite_country.py:113,
    caida ixs.py:115): those sources guarantee proper CIDRs, so the
    fixtures must too."""
    import ipaddress as _ip

    out = []
    for p in prefix_pool():
        try:
            _ip.ip_network(p)
            out.append(p)
        except ValueError:
            continue
    return out


def gen_caida_ixs(scale: float = 1.0) -> list[FixtureDoc]:
    """ref iyp/crawlers/caida/ixs.py:56-120: jsonl, one ix per line;
    scalar-or-list country/url; {af: [prefix]} dict; ~40% records whose
    pdb_id does NOT resolve (fallback-create-on-miss, :137-146); one
    '#'-metadata line."""
    from .data_iso3166 import COUNTRIES as ISO

    name = "caida.ixs"
    rng = _rng(name)
    n = max(8, int(25 * min(scale, 1.0)))
    n_pdb = _pdb_ix_count(scale)
    iso_items = sorted(ISO.items())
    prefixes = valid_prefix_pool()

    def a_country():
        a2, (a3, full) = rng.choice(iso_items)
        style = rng.random()
        if style < 0.5:
            return a2
        if style < 0.75:
            return a3
        if style < 0.9:
            return full
        return "Atlantis"  # unknown → reference warns + skips

    docs = [
        FixtureDoc(f"{name}/meta", name,
                   _spans([("text", '#{"date": "2025.01.01 00:00:00"}')]),
                   {"meta": True})
    ]
    for i in range(n):
        rec = {"ix_id": 2000 + i, "name": f"CAIDA-IX-{i}"}
        r = rng.random()
        if r < 0.6:
            rec["pdb_id"] = 100 + rng.randrange(n_pdb)  # resolves
        elif r < 0.7:
            rec["pdb_id"] = 9999  # dangling extid → fallback create
        # else: no pdb_id at all → fallback create
        if rng.random() < 0.85:
            k = rng.randint(1, 2)
            ccs = [a_country() for _ in range(k)]
            rec["country"] = ccs if k > 1 else ccs[0]
        if rng.random() < 0.8:
            urls = [f"https://caida-ix{i}.example.net{p}"
                    for p in ([""] if rng.random() < 0.8 else ["", "/alt"])]
            rec["url"] = urls if len(urls) > 1 else urls[0]
        if rng.random() < 0.9:
            pfx = {}
            v4 = [p for p in rng.sample(prefixes, 4) if "." in p][:2]
            v6 = [p for p in rng.sample(prefixes, 4) if ":" in p][:2]
            if v4 and rng.random() < 0.9:
                pfx["ipv4"] = v4
            if v6 and rng.random() < 0.7:
                pfx["ipv6"] = v6
            if pfx:
                rec["prefixes"] = pfx
        docs.append(
            FixtureDoc(f"{name}/{i:06d}", name,
                       _spans([("text", json.dumps(rec, sort_keys=True))]), rec)
        )
    return docs


def gen_caida_ix_asns(scale: float = 1.0) -> list[FixtureDoc]:
    """ref iyp/crawlers/caida/ix_asns.py:55-91: jsonl {ix_id, asn}
    memberships; ~3% dangling ix_ids (no CaidaIXID edge → dropped)."""
    name = "caida.ix_asns"
    rng = _rng(name)
    n_ix = max(8, int(25 * min(scale, 1.0)))
    n = int(120 * min(scale, 1.0)) or 12
    asns = zipf_asns(rng, n)
    docs = [
        FixtureDoc(f"{name}/meta", name,
                   _spans([("text", '#{"date": "2025.01.01 00:00:00"}')]),
                   {"meta": True})
    ]
    seen = set()
    for i in range(n):
        ix_id = 2000 + rng.randrange(n_ix) if rng.random() > 0.03 else 99999
        if (ix_id, asns[i]) in seen:
            continue
        seen.add((ix_id, asns[i]))
        rec = {"ix_id": ix_id, "asn": asns[i]}
        docs.append(
            FixtureDoc(f"{name}/{i:06d}", name,
                       _spans([("text", json.dumps(rec, sort_keys=True))]), rec)
        )
    return docs


GENERATORS.update({
    "caida.ixs": gen_caida_ixs,
    "caida.ix_asns": gen_caida_ix_asns,
})


# ------------------------------------------------------- maxmind / ipinfo

CONTINENTS = {
    "AS": "Asia", "EU": "Europe", "NA": "North America",
    "SA": "South America", "AF": "Africa", "OC": "Oceania",
}


def gen_maxmind_geolite(scale: float = 1.0) -> list[FixtureDoc]:
    """ref iyp/crawlers/maxmind/geolite_country.py:68-142: locations CSV +
    v4/v6 blocks CSVs. Includes a continent-only location (dropped :91),
    Namibia's 'NA' code (the keep_default_na pitfall :85), blocks with
    empty geoname_id (dropped :100) and non-compressed v6 networks."""
    from .data_iso3166 import COUNTRIES as ISO

    name = "maxmind.geolite_country"
    rng = _rng(name)
    ccs = [c.upper() for c in COUNTRIES] + ["NA"]  # Namibia
    locations = []
    for i, cc in enumerate(ccs):
        cont = sorted(CONTINENTS)[i % 6]
        locations.append({
            "geoname_id": 3000 + i,
            "locale_code": "en",
            "continent_code": cont,
            "continent_name": CONTINENTS[cont],
            "country_iso_code": cc,
            # commas would need CSV quoting — the real file quotes them, but
            # keeping names comma-free keeps the span encoding trivial
            "country_name": ISO.get(cc, ("", f"Country {cc}"))[1].replace(",", ";"),
            "is_in_european_union": 1 if cont == "EU" and rng.random() < 0.7 else 0,
        })
    # continent-only rows (no country_iso_code) — Asia/Europe aggregates
    locations.append({
        "geoname_id": 2999, "locale_code": "en", "continent_code": "AS",
        "continent_name": "Asia", "country_iso_code": "",
        "country_name": "", "is_in_european_union": 0,
    })
    docs = []
    seq = 0
    for loc in locations:
        line = (f'{loc["geoname_id"]},{loc["locale_code"]},'
                f'{loc["continent_code"]},{loc["continent_name"]},'
                f'{loc["country_iso_code"]},{loc["country_name"]},'
                f'{loc["is_in_european_union"]}')
        docs.append(FixtureDoc(f"{name}/{seq:06d}", name,
                               _spans([("text", "location"), ("text", line)]),
                               {"kind": "location", **loc}))
        seq += 1
    prefixes = valid_prefix_pool()
    n = int(300 * min(scale, 1.0)) or 30
    for i in range(n):
        p = rng.choice(prefixes)
        # ~8% registered-country-only rows: empty geoname_id
        gid = "" if rng.random() < 0.08 else str(3000 + rng.randrange(len(ccs)))
        # ~2% reference a location id that is continent-only or absent
        if gid and rng.random() < 0.02:
            gid = str(rng.choice([2999, 4999]))
        kind = "block_v6" if ":" in p else "block_v4"
        line = f"{p},{gid}"
        docs.append(FixtureDoc(f"{name}/{seq:06d}", name,
                               _spans([("text", kind), ("text", line)]),
                               {"kind": "block", "network": p,
                                "geoname_id": int(gid) if gid else None}))
        seq += 1
    return docs


def gen_ipinfo_ip_country(scale: float = 1.0) -> list[FixtureDoc]:
    """ref iyp/crawlers/ipinfo/ip_country.py:27-60: jsonl rows with
    start_ip/end_ip ranges (many NOT aligned to one CIDR — the
    summarize_address_range multi-prefix case) + country attrs."""
    name = "ipinfo.ip_country"
    rng = _rng(name)
    n = int(200 * min(scale, 1.0)) or 20
    docs = []
    for i in range(n):
        cc = rng.choice(COUNTRIES).upper()
        if rng.random() < 0.5:
            # v4 range: random start + random length (often non-CIDR-aligned)
            start = (rng.randint(1, 220) << 24) | (rng.randint(0, 255) << 16) \
                | (rng.randint(0, 255) << 8)
            count = rng.choice([256, 512, 300, 1000, 7])
            import ipaddress as _ip
            s = _ip.IPv4Address(start)
            e = _ip.IPv4Address(start + count - 1)
            rec = {"start_ip": str(s), "end_ip": str(e), "country": cc}
        else:
            import ipaddress as _ip
            h = rng.randint(0, 0xFFFF)
            base = int(_ip.IPv6Address(f"2001:db8:{h:x}::"))
            count = rng.choice([1 << 64, (1 << 64) + 12345, 1 << 80])
            rec = {"start_ip": str(_ip.IPv6Address(base)),
                   "end_ip": str(_ip.IPv6Address(base + count - 1)),
                   "country": cc}
        rec["country_name"] = f"Country {cc}"
        rec["continent"] = rng.choice(sorted(CONTINENTS))
        rec["continent_name"] = CONTINENTS[rec["continent"]]
        docs.append(
            FixtureDoc(f"{name}/{i:06d}", name,
                       _spans([("text", json.dumps(rec, sort_keys=True))]), rec)
        )
    return docs


GENERATORS.update({
    "maxmind.geolite_country": gen_maxmind_geolite,
    "ipinfo.ip_country": gen_ipinfo_ip_country,
})


# ---------------------------------------------------------------- alice_lg

def alice_lan_map(scale: float) -> dict[str, str]:
    """PeeringLAN → IXP as it exists when alice_lg runs (wave 4): the union
    of peeringdb.ix and caida.ixs MANAGED_BY edges, exact-duplicate-prefix
    ties broken by min(ixp) — the same rule the crawler's window uses."""
    from .golden import golden_caida_ixs, golden_peeringdb_ix

    pdb_docs = gen_peeringdb_ix(scale)
    caida_docs = gen_caida_ixs(scale)
    pdb_map = {d.record["id"]: d.record["name"]
               for d in pdb_docs if "ixlan_set" in d.record}
    lans: dict[str, set] = {}
    for t in golden_peeringdb_ix(pdb_docs, {}) | golden_caida_ixs(caida_docs,
                                                                  pdb_map):
        sl, sk, pred, ol, ok = t
        if sl == "PeeringLAN" and pred == "MANAGED_BY" and ol == "IXP":
            lans.setdefault(sk, set()).add(ok)
    return {lan: min(ixps) for lan, ixps in lans.items()}


def gen_alice_lg(scale: float = 1.0,
                 name: str = "alice_lg.decix") -> list[FixtureDoc]:
    """ref iyp/crawlers/alice_lg/__init__.py: one doc per neighbors page
    (with RFC3339-nano cached_at variants and the neighbors/neighbours
    spelling split, :245-251) and per routes page. ~15% member IPs outside
    every PeeringLAN (search_best miss, :370-372); ~8% malformed ASNs.
    Parameterized by instance name — each looking glass (decix, amsix,
    linx, ... 14 in the reference) is the same program over its own
    fetched pages."""
    import ipaddress as _ip
    rng = _rng(name)
    lan_map = alice_lan_map(scale)
    lans = sorted(lan_map)
    cached_ats = [
        "2026-01-05T10:00:00.123456789Z",        # nanoseconds (Go)
        "2026-01-05T11:30:00.5+02:00",           # short fraction, offset tz
        "2026-01-05T12:00:00Z",                  # no fraction
        "2026-01-05T13:00:00.123456",            # fraction but no tz → null
    ]
    docs = []
    n_rs = 4
    n_per = int(40 * min(scale, 1.0)) or 8
    asns = zipf_asns(rng, n_rs * n_per)
    route_targets = []
    prefixes = valid_prefix_pool()
    for rs in range(n_rs):
        neighbors = []
        for j in range(n_per):
            k = rs * n_per + j
            r = rng.random()
            if r < 0.15 or not lans:
                # outside every LAN: 240/4 and fd00::/8 never appear in pools
                addr = (f"240.0.{rng.randint(0, 255)}.{rng.randint(1, 254)}"
                        if rng.random() < 0.5
                        else f"fd00::{rng.randint(1, 0xffff):x}")
            else:
                net = _ip.ip_network(rng.choice(lans))
                idx = rng.randrange(1, min(net.num_addresses, 1 << 16))
                addr = str(net[idx])
            a = rng.random()
            asn = asns[k]
            if a < 0.04:
                asn = f"AS{asn}"  # string → malformed (:373-376)
            elif a < 0.08:
                asn = 0
            nb = {
                "id": f"nb_{rs}_{j}",
                "address": addr,
                "asn": asn,
                "state": rng.choice(["up", "down", "start"]),
                "description": f"Peer {k}",
                "routes_received": rng.randint(0, 5000),
            }
            if rng.random() < 0.5:
                nb["details"] = {"route_changes": rng.randint(0, 99),
                                 "filtered": rng.randint(0, 9)}
            elif rng.random() < 0.5:
                nb["details"] = {}  # empty dict → removed by flatten
            neighbors.append(nb)
            if isinstance(asn, int) and asn and rng.random() < 0.15:
                route_targets.append((rs, nb["id"]))
        key = "neighbours" if rs % 2 else "neighbors"
        page = {
            "routeserver_id": f"rs{rs}",
            "api": {"cache_status": {"cached_at": cached_ats[rs]}},
            key: neighbors,
        }
        docs.append(FixtureDoc(f"{name}/nb{rs:03d}", name,
                               _spans([("text", "neighbors"),
                                       ("text", json.dumps(page, sort_keys=True))]),
                               {"kind": "neighbors", "rs": f"rs{rs}",
                                "cached_at": cached_ats[rs],
                                "list": neighbors}))
    if not route_targets:
        # ORIGINATE is an EXPECTED_PRED — small scales must still emit
        # at least one received-routes page
        route_targets.append((0, "nb_0_0"))
    for i, (rs, nb_id) in enumerate(route_targets):
        imported = []
        for _ in range(rng.randint(1, 6)):
            path_len = rng.randint(1, 4)
            imported.append({
                "network": rng.choice(prefixes),
                "bgp": {"as_path": zipf_asns(rng, path_len)},
            })
        page = {"routeserver_id": f"rs{rs}", "neighbor_id": nb_id,
                "imported": imported}
        docs.append(FixtureDoc(f"{name}/rt{i:03d}", name,
                               _spans([("text", "routes"),
                                       ("text", json.dumps(page, sort_keys=True))]),
                               {"kind": "routes", "imported": imported}))
    return docs


GENERATORS["alice_lg.decix"] = gen_alice_lg


def gen_alice_lg_amsix(scale: float = 1.0) -> list[FixtureDoc]:
    return gen_alice_lg(scale, name="alice_lg.amsix")


def gen_alice_lg_linx(scale: float = 1.0) -> list[FixtureDoc]:
    return gen_alice_lg(scale, name="alice_lg.linx")


GENERATORS["alice_lg.amsix"] = gen_alice_lg_amsix
GENERATORS["alice_lg.linx"] = gen_alice_lg_linx


# ---------------------------------------------------------------- ihr

def gen_ihr_country_dependency(scale: float = 1.0) -> list[FixtureDoc]:
    """ref ihr/country_dependency.py:42-113: one doc per country API page;
    mixed timebins (only the latest counts), both weightschemes,
    transitonly rows, sub-threshold hege values."""
    name = "ihr.country_dependency"
    rng = _rng(name)
    n_cc = max(4, int(12 * min(scale, 1.0)))
    timebins = ["2026-01-02T00:00:00Z", "2026-01-03T00:00:00Z",
                "2026-01-04T00:00:00Z"]
    docs = []
    for i in range(n_cc):
        cc = COUNTRIES[i % len(COUNTRIES)].upper()
        results = []
        if rng.random() < 0.08:
            results = []  # empty page → no nodes at all
        else:
            k = rng.randint(6, 20)
            hege_seen = set()
            for _ in range(k):
                hege = round(rng.uniform(0.001, 0.9), 6)
                while hege in hege_seen:  # unique → deterministic rank order
                    hege = round(rng.uniform(0.001, 0.9), 6)
                hege_seen.add(hege)
                results.append({
                    "timebin": rng.choice(timebins),
                    "asn": rng.choice(asn_pool()),
                    "hege": hege,
                    "weightscheme": rng.choice(["eyeball", "as"]),
                    "transitonly": rng.random() < 0.15,
                })
        docs.append(
            FixtureDoc(f"{name}/{i:06d}", name,
                       _spans([("text", cc),
                               ("text", json.dumps({"results": results},
                                                   sort_keys=True))]),
                       {"cc": cc, "results": results})
        )
    return docs


ROV_HEADER = ["id", "timebin", "prefix", "hege", "af", "visibility",
              "rpki_status", "irr_status", "delegated_prefix_status",
              "delegated_asn_status", "descr", "moas", "asn_id",
              "country_id", "originasn_id"]


def gen_ihr_rov(scale: float = 1.0) -> list[FixtureDoc]:
    """ref ihr/rov.py:55-125: one CSV row per doc; ~60% asn==originasn
    rows, ~2% malformed prefixes, RPKI/IRR status mix."""
    name = "ihr.rov"
    rng = _rng(name)
    n = int(250 * min(scale, 1.0)) or 25
    prefixes = prefix_pool()
    asns = zipf_asns(rng, 2 * n)
    docs = []
    for i in range(n):
        prefix = (rng.choice(MALFORMED_PREFIXES) if rng.random() < 0.02
                  else rng.choice(prefixes))
        asn = asns[2 * i]
        origin = asn if rng.random() < 0.6 else asns[2 * i + 1]
        rec = {
            "id": i,
            "timebin": "2026-01-04 00:00:00+00",
            "prefix": prefix,
            "hege": round(rng.uniform(0.0, 1.0), 6),
            "af": 6 if ":" in prefix else 4,
            "visibility": round(rng.uniform(0.0, 100.0), 4),
            "rpki_status": rng.choice(["Valid", "Invalid", "NotFound",
                                       "Invalid;more-specific"]),
            "irr_status": rng.choice(["Valid", "Invalid", "NotFound"]),
            "delegated_prefix_status": rng.choice(["assigned", "available"]),
            "delegated_asn_status": "assigned",
            "descr": f"AS {asn} route",
            "moas": rng.choice(["true", "false"]),
            "asn_id": str(asn),
            "country_id": rng.choice(COUNTRIES).upper(),
            "originasn_id": str(origin),
        }
        line = ",".join(str(rec[h]) for h in ROV_HEADER)
        docs.append(FixtureDoc(f"{name}/{i:06d}", name,
                               _spans([("text", line)]), rec))
    return docs


GENERATORS.update({
    "ihr.country_dependency": gen_ihr_country_dependency,
    "ihr.rov": gen_ihr_rov,
})


# ------------------------------------------------------- flat linkers

def gen_bgptools_as_names(scale: float = 1.0) -> list[FixtureDoc]:
    """ref bgptools/as_names.py:35-85: CSV (asn,name,class); ~3% rows whose
    asn lacks the 'AS' prefix, ~10% ERR_AS_NAME_NOT_FOUND, ~25% Unknown."""
    name = "bgptools.as_names"
    rng = _rng(name)
    n = int(400 * min(scale, 1.0)) or 40
    pool = asn_pool()
    classes = ["Eyeball", "Transit", "Content", "Education", "Government"]
    docs = []
    for i in range(n):
        asn = rng.choice(pool)
        asn_field = f"AS{asn}" if rng.random() > 0.03 else str(asn)
        nm = ("ERR_AS_NAME_NOT_FOUND" if rng.random() < 0.10
              else org_name(rng).replace(",", ""))
        cls = "Unknown" if rng.random() < 0.25 else rng.choice(classes)
        line = f"{asn_field},{nm},{cls}"
        docs.append(FixtureDoc(f"{name}/{i:06d}", name,
                               _spans([("text", line)]),
                               {"asn_field": asn_field, "asn": asn,
                                "name": nm, "class": cls}))
    return docs


def gen_emileaben_as_names(scale: float = 1.0) -> list[FixtureDoc]:
    """ref emileaben/as_names.py:27-60: asn|contributor|name lines."""
    name = "emileaben.as_names"
    rng = _rng(name)
    n = int(250 * min(scale, 1.0)) or 25
    pool = asn_pool()
    docs = []
    for i in range(n):
        asn = rng.choice(pool)
        contributor = rng.choice(["ripe", "apnic", "community", "manual"])
        nm = org_name(rng)
        line = f"{asn}|{contributor}|{nm}"
        docs.append(FixtureDoc(f"{name}/{i:06d}", name,
                               _spans([("text", line)]),
                               {"asn": asn, "contributor": contributor,
                                "name": nm}))
    return docs


def gen_virginiatech_rovista(scale: float = 1.0) -> list[FixtureDoc]:
    """ref virginiatech/rovista.py:29-72: paginated JSON pages of
    {asn, ratio, lastUpdatedDate}; ratios straddling the 0.5 threshold."""
    name = "virginiatech.rovista"
    rng = _rng(name)
    n = int(300 * min(scale, 1.0)) or 30
    pool = asn_pool()
    pages = []
    entries_all = []
    page = []
    for i in range(n):
        ratio = round(rng.random(), 4)
        if abs(ratio - 0.5) < 0.02:
            ratio = 0.5  # exercise the strict > boundary exactly
        e = {"asn": rng.choice(pool), "ratio": ratio,
             "lastUpdatedDate": "2026-01-03"}
        page.append(e)
        entries_all.append(e)
        if len(page) == 100:
            pages.append(page)
            page = []
    if page:
        pages.append(page)
    docs = []
    for i, pg in enumerate(pages):
        docs.append(FixtureDoc(f"{name}/{i:06d}", name,
                               _spans([("text", json.dumps({"data": pg},
                                                           sort_keys=True))]),
                               {"data": pg}))
    return docs


def gen_citizenlab_urldb(scale: float = 1.0) -> list[FixtureDoc]:
    """ref citizenlab/urldb.py:26-71: per-country CSV rows of
    (url, category_code, category_description, ...); duplicate (url,
    category) pairs across countries collapse to one link."""
    name = "citizenlab.urldb"
    rng = _rng(name)
    n = int(300 * min(scale, 1.0)) or 30
    cats = [("ALDR", "Alcohol & Drugs"), ("NEWS", "News Media"),
            ("POLR", "Political Criticism"), ("ANON", "Anonymization tools"),
            ("SRCH", "Search Engines")]
    domains = domain_pool()
    docs = []
    for i in range(n):
        cc = rng.choice(COUNTRIES)
        code, desc = rng.choice(cats)
        url = f"https://{rng.choice(domains)}/{rng.randint(0, 30)}"
        line = f"{url},{code},{desc},2024-01-01,citizenlab,"
        docs.append(FixtureDoc(f"{name}/{i:06d}", name,
                               _spans([("text", cc), ("text", line)]),
                               {"url": url, "category": desc}))
    return docs


def gen_iana_address_space(scale: float = 1.0) -> list[FixtureDoc]:
    """ref iana/address_space.py:37-185: v4 '001/8' rows, v6 rows, and
    special-registry rows with footnotes, N/A bools, and the dual-prefix
    cell."""
    rng = _rng("iana.address_space")
    name = "iana.address_space"
    docs = []
    seq = 0
    statuses = ["ALLOCATED", "RESERVED", "LEGACY"]
    desigs = ["IANA - Loopback", "Administered by ARIN", "Administered by RIPE NCC",
              "Multicast", "Future use", "APNIC", "ARIN", "RIPE NCC", "LACNIC",
              "AFRINIC"]
    for octet in range(0, 224, 2):  # 112 v4 rows
        desig = rng.choice(desigs)
        status = rng.choice(statuses)
        line = f"{octet:03d}/8,{desig},1993-05,{status}"
        docs.append(FixtureDoc(f"{name}/{seq:06d}", name,
                               _spans([("text", "v4"), ("text", line)]),
                               {"kind": "v4", "octet": octet, "desig": desig,
                                "date": "1993-05", "status": status}))
        seq += 1
    for i in range(24):  # v6 rows
        desig = rng.choice(desigs)
        status = rng.choice(statuses)
        pfx = f"2001:{(i + 1) * 0x200:04x}::/23"  # /23-aligned like the registry
        line = f"{pfx},{desig},1999-07,{status}"
        docs.append(FixtureDoc(f"{name}/{seq:06d}", name,
                               _spans([("text", "v6"), ("text", line)]),
                               {"kind": "v6", "prefix": pfx, "desig": desig,
                                "date": "1999-07", "status": status}))
        seq += 1
    specials = [
        ("0.0.0.0/8", "This network", "True", "False", "False", "False", "True"),
        ("192.0.0.0/24 [2]", "IETF Protocol Assignments", "N/A [3]", "N/A",
         "N/A", "N/A", "False"),
        ('"192.0.0.170/32, 192.0.0.171/32"', "NAT64/DNS64 Discovery", "False",
         "False", "False", "False", "True"),
        ("198.18.0.0/15", "Benchmarking", "True [4]", "True", "True",
         "False", "False"),
        ("::1/128", "Loopback Address", "False", "False", "False", "False",
         "True"),
        ("100::/64", "Discard-Only Address Block", "True", "True", "True",
         "False", "False"),
    ]
    for block, nm, src, dst, fwd, glob, resv in specials:
        line = f"{block},{nm},RFC 6890,2010-01,{src},{dst},{fwd},{glob},{resv}"
        docs.append(FixtureDoc(f"{name}/{seq:06d}", name,
                               _spans([("text", "special"), ("text", line)]),
                               {"kind": "special", "block": block.strip('"'),
                                "name": nm}))
        seq += 1
    return docs


GENERATORS.update({
    "bgptools.as_names": gen_bgptools_as_names,
    "emileaben.as_names": gen_emileaben_as_names,
    "virginiatech.rovista": gen_virginiatech_rovista,
    "citizenlab.urldb": gen_citizenlab_urldb,
    "iana.address_space": gen_iana_address_space,
})


# ------------------------------------------------------- cloudflare / atlas

def gen_cloudflare_top100(scale: float = 1.0) -> list[FixtureDoc]:
    """ref cloudflare/top100.py:32-72: 100 {rank, domain} entries."""
    name = "cloudflare.top100"
    rng = _rng(name)
    pool = domain_pool()
    docs = []
    for i in range(100):
        rec = {"rank": i + 1, "domain": rng.choice(pool)}
        docs.append(FixtureDoc(f"{name}/{i:06d}", name,
                               _spans([("text", json.dumps(rec, sort_keys=True))]),
                               rec))
    return docs


def gen_cloudflare_ranking_bucket(scale: float = 1.0) -> list[FixtureDoc]:
    """ref cloudflare/ranking_bucket.py:36-119: one doc per dataset
    (meta JSON + newline-joined domain file body, header already dropped)."""
    name = "cloudflare.ranking_bucket"
    rng = _rng(name)
    pool = domain_pool()
    docs = []
    for i, (title, top) in enumerate([("Top 200", 200), ("Top 500", 500),
                                      ("Top 1000", 1000)]):
        meta = {"id": i + 1, "title": title,
                "description": f"Cloudflare {title} ranking bucket"}
        domains = sorted(set(rng.sample(pool, min(int(60 * min(scale, 1.0)) or 10,
                                                  len(pool)))))
        docs.append(FixtureDoc(f"{name}/{i:06d}", name,
                               _spans([("text", json.dumps(meta, sort_keys=True)),
                                       ("text", "\n".join(domains))]),
                               {"title": title, "domains": domains}))
    return docs


def _dns_top_names(scale: float, rng: random.Random) -> list[str]:
    """Names the fetcher would have queried: mostly graph-eligible ranked
    DomainNames (tranco / top100), ~25% names with no qualifying RANK edge
    (ranking_bucket-only or novel) that the seed semi-join must drop."""
    tranco = [d.record["domain"] for d in gen_tranco_top1m(scale)]
    top100 = [d.record["domain"] for d in gen_cloudflare_top100(scale)]
    novel = [f"novel{i}.example" for i in range(20)]
    bucket_only = []
    eligible = set(tranco) | set(top100)
    for d in gen_cloudflare_ranking_bucket(scale):
        bucket_only += [x for x in d.record["domains"] if x not in eligible]
    names = []
    k = int(80 * min(scale, 1.0)) or 12
    for _ in range(k):
        r = rng.random()
        if r < 0.75 or not (bucket_only or novel):
            names.append(rng.choice(tranco if rng.random() < 0.7 else top100))
        elif r < 0.9 and bucket_only:
            names.append(rng.choice(bucket_only))
        else:
            names.append(rng.choice(novel))
    return sorted(set(names))


def gen_cloudflare_dns_top_ases(scale: float = 1.0) -> list[FixtureDoc]:
    """ref cloudflare/dns_top_ases.py:22-55 + __init__.py:208-227."""
    name = "cloudflare.dns_top_ases"
    rng = _rng(name)
    docs = []
    for i, nm in enumerate(_dns_top_names(scale, rng)):
        entries = [
            {"clientASN": rng.choice(asn_pool()),
             "clientASName": org_name(rng),
             "value": f"{rng.uniform(0.1, 60.0):.4f}"}
            for _ in range(rng.randint(1, 6))
        ]
        docs.append(FixtureDoc(f"{name}/{i:06d}", name,
                               _spans([("text", nm),
                                       ("text", json.dumps(entries,
                                                           sort_keys=True))]),
                               {"name": nm, "entries": entries}))
    return docs


def gen_cloudflare_dns_top_locations(scale: float = 1.0) -> list[FixtureDoc]:
    """ref cloudflare/dns_top_locations.py:20-49."""
    name = "cloudflare.dns_top_locations"
    rng = _rng(name)
    docs = []
    for i, nm in enumerate(_dns_top_names(scale, rng)):
        entries = [
            {"clientCountryAlpha2": rng.choice(COUNTRIES).upper(),
             "clientCountryName": "Somewhere",
             "value": f"{rng.uniform(0.1, 60.0):.4f}"}
            for _ in range(rng.randint(1, 6))
        ]
        docs.append(FixtureDoc(f"{name}/{i:06d}", name,
                               _spans([("text", nm),
                                       ("text", json.dumps(entries,
                                                           sort_keys=True))]),
                               {"name": nm, "entries": entries}))
    return docs


def gen_ripe_atlas_probes(scale: float = 1.0) -> list[FixtureDoc]:
    """ref ripe/atlas_probes.py:69-204: paginated pages; duplicate ids,
    uncompressed v6 addresses, asn 0/null, invalid country codes,
    out-of-range and null-island geometries."""
    name = "ripe.atlas_probes"
    rng = _rng(name)
    n = int(200 * min(scale, 1.0)) or 20
    pool = asn_pool()
    probes = []
    for i in range(n):
        pid = 10000 + i
        p = {"id": pid}
        r = rng.random()
        p["address_v4"] = (f"193.0.{rng.randint(0, 255)}.{rng.randint(1, 254)}"
                           if r < 0.75 else ("" if r < 0.85 else None))
        r = rng.random()
        if r < 0.5:
            h = rng.randint(0, 0xFFFF)
            p["address_v6"] = (f"2001:0db8:{h:04x}:0000:0000:0000:0000:0001"
                               if rng.random() < 0.3
                               else f"2001:db8:{h:x}::1")
        else:
            p["address_v6"] = None
        p["asn_v4"] = rng.choice(pool) if rng.random() < 0.8 else (
            0 if rng.random() < 0.5 else None)
        p["asn_v6"] = rng.choice(pool) if rng.random() < 0.5 else None
        r = rng.random()
        p["country_code"] = (rng.choice(COUNTRIES).upper() if r < 0.8
                             else ("XX" if r < 0.9 else None))
        r = rng.random()
        if r < 0.7:
            p["geometry"] = {"type": "Point",
                             "coordinates": [round(rng.uniform(-180, 180), 2),
                                             round(rng.uniform(-90, 90), 2)]}
        elif r < 0.78:
            p["geometry"] = {"type": "Point", "coordinates": [0.0, 0.0]}
        elif r < 0.85:
            p["geometry"] = {"type": "Point", "coordinates": [200.5, 95.0]}
        else:
            p["geometry"] = None
        p["is_anchor"] = rng.random() < 0.1
        p["is_public"] = True
        sid = rng.choice([0, 1, 2, 2, 2, 3])
        p["status"] = {"id": sid,
                       "name": ["Never Connected", "Connected", "Connected",
                                "Abandoned"][min(sid, 3)]}
        p["tags"] = ([{"slug": "home"}] if rng.random() < 0.5 else [])
        probes.append(p)
    # ~3% duplicated probe records (identical payload, :95-98)
    for p in rng.sample(probes, max(1, n // 33)):
        probes.append(dict(p))
    docs = []
    page_size = 50
    for i in range(0, len(probes), page_size):
        page = {"results": probes[i:i + page_size]}
        docs.append(FixtureDoc(f"{name}/{i // page_size:06d}", name,
                               _spans([("text", json.dumps(page,
                                                           sort_keys=True))]),
                               {"results": probes[i:i + page_size]}))
    return docs


GENERATORS.update({
    "cloudflare.top100": gen_cloudflare_top100,
    "cloudflare.ranking_bucket": gen_cloudflare_ranking_bucket,
    "cloudflare.dns_top_ases": gen_cloudflare_dns_top_ases,
    "cloudflare.dns_top_locations": gen_cloudflare_dns_top_locations,
    "ripe.atlas_probes": gen_ripe_atlas_probes,
})


# --------------------------------------------- anycast / asrel / peerstats

def _gen_anycast(name: str, v6: bool, scale: float) -> list[FixtureDoc]:
    rng = _rng(name)
    n = int(150 * min(scale, 1.0)) or 15
    pool = [p for p in prefix_pool() if (":" in p) == v6]
    docs = []
    for i in range(n):
        prefix = (rng.choice(MALFORMED_PREFIXES) if rng.random() < 0.02
                  else rng.choice(pool))
        probed = (f"2001:db8:{rng.randint(0, 0xffff):x}::1" if v6
                  else f"198.51.{rng.randint(0, 255)}.{rng.randint(1, 254)}")
        docs.append(FixtureDoc(f"{name}/{i:06d}", name,
                               _spans([("text", f"{prefix},{probed}")]),
                               {"prefix": prefix, "probed_ip": probed}))
    return docs


def gen_bgptools_anycast_v4(scale: float = 1.0) -> list[FixtureDoc]:
    """ref bgptools/__init__.py:20-56."""
    return _gen_anycast("bgptools.anycast_prefixes_v4", False, scale)


def gen_bgptools_anycast_v6(scale: float = 1.0) -> list[FixtureDoc]:
    return _gen_anycast("bgptools.anycast_prefixes_v6", True, scale)


def _gen_caida_asrel(name: str, scale: float) -> list[FixtureDoc]:
    rng = _rng(name)
    n = int(300 * min(scale, 1.0)) or 30
    draws = zipf_asns(rng, 2 * n)
    docs = [
        FixtureDoc(f"{name}/hdr", name,
                   _spans([("text", "# source: topology inference")]),
                   {"comment": True})
    ]
    seen = set()
    for i in range(n):
        a, b = draws[2 * i], draws[2 * i + 1]
        if a == b or (a, b) in seen:
            continue
        seen.add((a, b))
        kind = rng.choice([-1, 0])
        docs.append(FixtureDoc(f"{name}/{i:06d}", name,
                               _spans([("text", f"{a}|{b}|{kind}")]),
                               {"left": a, "right": b, "rel": kind}))
    return docs


def gen_caida_asrel_v4(scale: float = 1.0) -> list[FixtureDoc]:
    """ref caida/__init__.py:42-67."""
    return _gen_caida_asrel("caida.as_relationships_v4", scale)


def gen_caida_asrel_v6(scale: float = 1.0) -> list[FixtureDoc]:
    return _gen_caida_asrel("caida.as_relationships_v6", scale)


def gen_bgpkit_peerstats(scale: float = 1.0) -> list[FixtureDoc]:
    """ref bgpkit/peerstats.py:25-100: one doc per collector stats file."""
    name = "bgpkit.peerstats"
    rng = _rng(name)
    n_coll = max(3, int(10 * min(scale, 1.0)))
    docs = []
    for i in range(n_coll):
        coll = f"rrc{i:02d}" if i % 2 == 0 else f"route-views.{i}"
        project = "riperis" if coll.startswith("rrc") else "routeviews"
        peers = {}
        for j in range(rng.randint(5, 25)):
            asn = rng.choice(asn_pool())
            peers[f"10.0.{i}.{j}"] = {
                "asn": asn,
                "num_v4_pfxs": rng.randint(0, 900000),
                "num_v6_pfxs": rng.randint(0, 200000),
                "num_connected_asns": rng.randint(1, 5000),
            }
        rec = {"collector": coll, "project": project, "peers": peers}
        docs.append(FixtureDoc(f"{name}/{i:06d}", name,
                               _spans([("text", json.dumps(rec, sort_keys=True))]),
                               rec))
    return docs


def gen_amazon_aws(scale: float = 1.0) -> list[FixtureDoc]:
    """ref amazon/aws_ip_ranges.py:41-215: region-table docs + prefix
    entries; unmapped regions, name overrides, ADDITIONAL_REGIONS gaps."""
    name = "amazon.aws_ip_ranges"
    rng = _rng(name)
    geographies = [
        ("us-east-1", "United States"), ("us-west-2", "United States"),
        ("eu-central-1", "Germany"), ("eu-west-3", "France"),
        ("ap-northeast-1", "Japan"), ("ap-south-1", "India"),
        ("sa-east-1", "Brazil"), ("ap-southeast-2", "Australia"),
        ("ap-east-1", "Hong Kong"), ("me-central-1", "UAE"),
        ("ap-northeast-2", "South Korea"), ("xx-unknown-1", "Atlantis"),
    ]
    docs = []
    seq = 0
    for region, geo in geographies:
        rec = {"region": region, "geography": geo}
        docs.append(FixtureDoc(f"{name}/{seq:06d}", name,
                               _spans([("text", "region"),
                                       ("text", json.dumps(rec, sort_keys=True))]),
                               {"kind": "region", **rec}))
        seq += 1
    regions = ([r for r, _ in geographies] +
               ["cn-north-1", "us-gov-west-1", "zz-nowhere-1"])
    services = ["AMAZON", "EC2", "S3", "CLOUDFRONT", "ROUTE53"]
    n = int(200 * min(scale, 1.0)) or 20
    pool = valid_prefix_pool()
    for i in range(n):
        v6 = rng.random() < 0.4
        pfx = rng.choice([p for p in pool if (":" in p) == v6])
        rec = {"prefix": pfx, "region": rng.choice(regions),
               "service": rng.choice(services)}
        docs.append(FixtureDoc(f"{name}/{seq:06d}", name,
                               _spans([("text", "v6" if v6 else "v4"),
                                       ("text", json.dumps(rec, sort_keys=True))]),
                               {"kind": "prefix", **rec}))
        seq += 1
    return docs


GENERATORS.update({
    "bgptools.anycast_prefixes_v4": gen_bgptools_anycast_v4,
    "bgptools.anycast_prefixes_v6": gen_bgptools_anycast_v6,
    "caida.as_relationships_v4": gen_caida_asrel_v4,
    "caida.as_relationships_v6": gen_caida_asrel_v6,
    "bgpkit.peerstats": gen_bgpkit_peerstats,
    "amazon.aws_ip_ranges": gen_amazon_aws,
})


# ---------------------------------------- openintel flavors / laces / fac

def gen_openintel_infra_ns(scale: float = 1.0) -> list[FixtureDoc]:
    return gen_openintel(scale, name="openintel.infra_ns")


def gen_openintel_umbrella1m(scale: float = 1.0) -> list[FixtureDoc]:
    return gen_openintel(scale, name="openintel.umbrella1m")


def _gen_laces(name: str, v6: bool, scale: float) -> list[FixtureDoc]:
    """ref utwente/__init__.py:21-104: GCD ≤ 1 rows, empty location lists,
    locations without country mapping, malformed prefixes."""
    rng = _rng(name)
    n = int(120 * min(scale, 1.0)) or 12
    pool = [p for p in valid_prefix_pool() if (":" in p) == v6]
    docs = []
    for i in range(n):
        backing = rng.choice(pool)
        prefix = (rng.choice(MALFORMED_PREFIXES) if rng.random() < 0.02
                  else rng.choice(pool))
        k = rng.choice([0, 1, 1, 2, 3])
        locations = []
        for _ in range(k):
            loc = {"lat": round(rng.uniform(-60, 70), 2),
                   "lon": round(rng.uniform(-180, 180), 2),
                   "country_code": (rng.choice(COUNTRIES).upper()
                                    if rng.random() < 0.8 else ""),
                   "city": rng.choice(["Amsterdam", "Tokyo", "Denver", ""])}
            locations.append(loc)
        rec = {"prefix": prefix, "backing_prefix": backing,
               "gcd": rng.choice([0, 1, 2, 5, 17]), "locations": locations}
        docs.append(FixtureDoc(f"{name}/{i:06d}", name,
                               _spans([("text", json.dumps(rec, sort_keys=True))]),
                               rec))
    return docs


def gen_utwente_laces_v4(scale: float = 1.0) -> list[FixtureDoc]:
    return _gen_laces("utwente.laces_v4", False, scale)


def gen_utwente_laces_v6(scale: float = 1.0) -> list[FixtureDoc]:
    return _gen_laces("utwente.laces_v6", True, scale)


def gen_peeringdb_fac(scale: float = 1.0) -> list[FixtureDoc]:
    """ref peeringdb/fac.py:52-166: facilities with whitespace-padded
    names, empty websites, invalid countries, 0.0 coordinates (falsy →
    no Point), social_media lists."""
    name = "peeringdb.fac"
    rng = _rng(name)
    n = max(8, int(40 * min(scale, 1.0)))
    docs = []
    for i in range(n):
        fac_name = f"{org_name(rng)} DC{i}"
        rec = {
            "id": 700 + i,
            "name": (f"  {fac_name} " if rng.random() < 0.1 else fac_name),
            "org_id": 1000 + (i % 50),
            "website": (f"https://fac{i}.example.net"
                        if rng.random() < 0.75 else ""),
            "country": (rng.choice(COUNTRIES).upper() if rng.random() < 0.85
                        else rng.choice(["XX", ""])),
            "city": rng.choice(["Frankfurt", "Ashburn", "Singapore"]),
            "latitude": (0.0 if rng.random() < 0.1
                         else round(rng.uniform(-60, 70), 4)),
            "longitude": (0.0 if rng.random() < 0.1
                          else round(rng.uniform(-180, 180), 4)),
        }
        if rng.random() < 0.5:
            rec["social_media"] = [
                {"service": "website", "identifier": f"https://social{i}.example.org"},
                {"service": "twitter", "identifier": f"@fac{i}"},
            ]
        else:
            rec["social_media"] = []
        docs.append(FixtureDoc(f"{name}/{i:06d}", name,
                               _spans([("text", json.dumps(rec, sort_keys=True))]),
                               rec))
    return docs


def gen_google_crux(scale: float = 1.0) -> list[FixtureDoc]:
    """ref google/crux_top1m_country.py:57-149: per-country CSV rows of
    (origin, rank); origins with ports and both schemes."""
    name = "google.crux_top1m_country"
    rng = _rng(name)
    n_cc = max(4, int(10 * min(scale, 1.0)))
    domains = domain_pool()
    docs = []
    seq = 0
    for i in range(n_cc):
        cc = COUNTRIES[(i * 3) % len(COUNTRIES)].upper()
        k = rng.randint(8, 25)
        for j in range(k):
            host = rng.choice(domains)
            if rng.random() < 0.3:
                host = f"www.{host}"
            scheme = rng.choice(["https", "http"])
            port = f":{rng.choice([8080, 443])}" if rng.random() < 0.1 else ""
            origin = f"{scheme}://{host}{port}"
            rank = rng.choice([1000, 5000, 10000, 50000, 100000])
            docs.append(FixtureDoc(f"{name}/{seq:06d}", name,
                                   _spans([("text", cc),
                                           ("text", f"{origin},{rank}")]),
                                   {"cc": cc, "origin": origin, "host": host,
                                    "rank": rank}))
            seq += 1
    return docs


GENERATORS.update({
    "openintel.infra_ns": gen_openintel_infra_ns,
    "openintel.umbrella1m": gen_openintel_umbrella1m,
    "utwente.laces_v4": gen_utwente_laces_v4,
    "utwente.laces_v6": gen_utwente_laces_v6,
    "peeringdb.fac": gen_peeringdb_fac,
    "google.crux_top1m_country": gen_google_crux,
})


# ---------------------------------------------------------------- ooni wave 2

def gen_ooni_httpinvalidrequestline(scale: float = 1.0) -> list[FixtureDoc]:
    """ref ooni/httpinvalidrequestline.py:15-65."""
    name = "ooni.httpinvalidrequestline"
    rng = _rng(name)
    records = []
    for _ in range(int(200 * scale)):
        rec = _ooni_base(rng)
        rec["test_keys"] = {"tampering": rng.random() < 0.15}
        records.append(rec)
    return _ooni_docs(name, records)


def gen_ooni_httpheaderfieldmanipulation(scale: float = 1.0) -> list[FixtureDoc]:
    """ref ooni/httpheaderfieldmanipulation.py:15-122: sub-fields
    sometimes missing (.get default False)."""
    name = "ooni.httpheaderfieldmanipulation"
    rng = _rng(name)
    subs = ["total", "request_line_capitalization",
            "header_name_capitalization", "header_field_value",
            "header_field_number"]
    records = []
    for _ in range(int(200 * scale)):
        rec = _ooni_base(rng)
        t = {"total": rng.random() < 0.2}
        for s in subs[1:]:
            if rng.random() < 0.9:
                t[s] = rng.random() < 0.1
        rec["test_keys"] = {"tampering": t}
        records.append(rec)
    return _ooni_docs(name, records)


def gen_ooni_riseupvpn(scale: float = 1.0) -> list[FixtureDoc]:
    """ref ooni/riseupvpn.py:21-35: api_failures list / ca_cert_status."""
    name = "ooni.riseupvpn"
    rng = _rng(name)
    records = []
    for _ in range(int(150 * scale)):
        rec = _ooni_base(rng)
        r = rng.random()
        rec["test_keys"] = {
            "api_failures": ([] if r < 0.6
                             else (["generic_timeout_error"] if r < 0.8
                                   else None)),
            "ca_cert_status": rng.random() < 0.85,
        }
        records.append(rec)
    return _ooni_docs(name, records)


def _gen_ooni_success(name: str, missing_rate: float,
                      scale: float) -> list[FixtureDoc]:
    rng = _rng(name)
    records = []
    for _ in range(int(150 * scale)):
        rec = _ooni_base(rng)
        if rng.random() < missing_rate:
            rec["test_keys"] = {"bootstrap": 1}  # no 'success' key
        else:
            rec["test_keys"] = {"success": rng.random() < 0.8}
        records.append(rec)
    return _ooni_docs(name, records)


def gen_ooni_vanillator(scale: float = 1.0) -> list[FixtureDoc]:
    """ref ooni/vanillator.py — success always present."""
    return _gen_ooni_success("ooni.vanillator", 0.0, scale)


def gen_ooni_torsf(scale: float = 1.0) -> list[FixtureDoc]:
    """ref ooni/torsf.py:25-27 — ~10% rows miss 'success' and pop."""
    return _gen_ooni_success("ooni.torsf", 0.1, scale)


def gen_ooni_facebookmessenger(scale: float = 1.0) -> list[FixtureDoc]:
    """ref ooni/facebookmessenger.py:22-32: rows missing dns/tcp pop."""
    name = "ooni.facebookmessenger"
    rng = _rng(name)
    records = []
    for _ in range(int(150 * scale)):
        rec = _ooni_base(rng)
        tk = {}
        if rng.random() > 0.05:
            tk["facebook_dns_blocking"] = rng.random() < 0.15
        if rng.random() > 0.05:
            tk["facebook_tcp_blocking"] = rng.random() < 0.1
        rec["test_keys"] = tk or {"noise": 1}
        records.append(rec)
    return _ooni_docs(name, records)


GENERATORS.update({
    "ooni.httpinvalidrequestline": gen_ooni_httpinvalidrequestline,
    "ooni.httpheaderfieldmanipulation": gen_ooni_httpheaderfieldmanipulation,
    "ooni.riseupvpn": gen_ooni_riseupvpn,
    "ooni.vanillator": gen_ooni_vanillator,
    "ooni.torsf": gen_ooni_torsf,
    "ooni.facebookmessenger": gen_ooni_facebookmessenger,
})


# ---------------------------------------------- atlas measurements / rdns

def gen_ripe_atlas_measurements(scale: float = 1.0) -> list[FixtureDoc]:
    """ref ripe/atlas_measurements.py:143-266: paginated measurement pages;
    hostname-or-IP targets, resolved_ips precedence over target_ip,
    duplicate ids, current_probes referencing atlas_probes fixture ids
    (incl. abandoned ones that must be excluded)."""
    name = "ripe.atlas_measurements"
    rng = _rng(name)
    n_probes = int(200 * min(scale, 1.0)) or 20
    probe_ids = [10000 + i for i in range(n_probes)]
    n = int(120 * min(scale, 1.0)) or 12
    domains = domain_pool()
    ms = []
    for i in range(n):
        af = rng.choice([4, 6])
        m = {"id": 5_000_000 + i, "af": af, "type": rng.choice(["ping", "traceroute"])}
        r = rng.random()
        if r < 0.55:
            m["target"] = rng.choice(domains)
        elif r < 0.75:
            m["target"] = ("198.51.100.7" if af == 4 else "2001:db8::7")  # IP literal → no hostname
        else:
            m["target"] = ""
        if rng.random() < 0.6:
            k = rng.randint(1, 3)
            if af == 6:
                m["resolved_ips"] = [
                    f"2001:0db8:{rng.randint(0, 0xffff):04x}::{rng.randint(1, 9)}"
                    for _ in range(k)]
            else:
                m["resolved_ips"] = [
                    f"203.0.{rng.randint(0, 255)}.{rng.randint(1, 254)}"
                    for _ in range(k)]
            if rng.random() < 0.15:
                m["resolved_ips"].append("")  # blank dropped
        elif rng.random() < 0.5:
            m["target_ip"] = ("192.0.2.55" if af == 4
                              else "2001:0db8:0:0:0:0:0:aa")
        if rng.random() < 0.7:
            m["target_asn"] = rng.choice(asn_pool())
        m["current_probes"] = rng.sample(probe_ids, rng.randint(0, 6))
        ms.append(m)
    # ~4% duplicated measurement records
    for m in rng.sample(ms, max(1, n // 25)):
        ms.append(dict(m))
    docs = []
    for i in range(0, len(ms), 50):
        page = {"results": ms[i:i + 50]}
        docs.append(FixtureDoc(f"{name}/{i // 50:06d}", name,
                               _spans([("text", json.dumps(page, sort_keys=True))]),
                               {"results": ms[i:i + 50]}))
    return docs


def gen_simulamet_rdns(scale: float = 1.0) -> list[FixtureDoc]:
    """ref simulamet/rirdata_rdns.py:29-55: dict-or-list jsonl entries;
    entries without NS rdatasets; empty prefixes/nameservers; duplicate
    (ns, prefix, ttl, source) rows."""
    name = "simulamet.rirdata_rdns"
    rng = _rng(name)
    n = int(150 * min(scale, 1.0)) or 15
    prefixes = valid_prefix_pool()
    docs = []
    for i in range(n):
        def entry():
            rdatasets = {}
            if rng.random() < 0.85:
                rdatasets["NS"] = [
                    f"ns{rng.randint(1, 4)}.{rng.choice(['example.net', 'example.org'])}."
                    for _ in range(rng.randint(1, 3))
                ]
                if rng.random() < 0.1:
                    rdatasets["NS"].append("")
            if rng.random() < 0.3:
                rdatasets["SOA"] = ["soa.example.net."]
            return {
                "source": rng.choice(["ripe", "apnic", "arin"]),
                "prefixes": ([rng.choice(prefixes)
                              for _ in range(rng.randint(1, 2))]
                             + ([""] if rng.random() < 0.05 else [])),
                "rdns": {"ttl": rng.choice([3600, 86400]),
                         "rdatasets": rdatasets},
            }

        payload = entry() if rng.random() < 0.7 else [entry(), entry()]
        docs.append(FixtureDoc(f"{name}/{i:06d}", name,
                               _spans([("text", json.dumps(payload,
                                                           sort_keys=True))]),
                               {"payload": payload}))
    return docs


GENERATORS.update({
    "ripe.atlas_measurements": gen_ripe_atlas_measurements,
    "simulamet.rirdata_rdns": gen_simulamet_rdns,
})


# ---------------------------------------------------------------- dnsgraph

def gen_openintel_dnsgraph(scale: float = 1.0,
                           name: str = "openintel.dnsgraph") -> list[FixtureDoc]:
    """ref openintel/__init__.py:452-672: typed edge lines. Includes CNAME
    chains of depth 1-3, a deliberate ALIAS_OF 2-cycle, trailing-dot keys,
    non-compressed IPv6 targets, duplicate rows, and same-edge rows with
    different props (all kept)."""
    rng = _rng(name)
    n_dom = max(6, int(25 * min(scale, 1.0)))
    domains = [f"dg{i}.example" for i in range(n_dom)]
    edges = []

    def e(rel, ft, fk, tt, tk, props=None):
        edges.append({"from_nodeType": ft, "from_nodeKey": fk,
                      "to_nodeType": tt, "to_nodeKey": tk,
                      "relation_name": rel, "properties": props or {}})

    for i, dom in enumerate(domains):
        dotted = dom + "." if rng.random() < 0.5 else dom
        e("PARENT", "DOMAIN", "example.", "DOMAIN", dotted)
        n_hosts = rng.randint(1, 3)
        hosts = [f"h{j}.{dom}" for j in range(n_hosts)]
        for h in hosts:
            e("PART_OF", "HOSTNAME", h + ".", "DOMAIN", dotted)
        ns = f"ns1.dg{(i + 1) % n_dom}.example"
        e("MANAGED_BY", "DOMAIN", dotted, "HOSTNAME", ns,
          {"ttl": str(rng.choice([300, 3600]))})
        # resolving host
        tail = hosts[0]
        if rng.random() < 0.5:
            ip = f"203.0.{rng.randint(0, 255)}.{rng.randint(1, 254)}"
        else:
            ip = f"2001:0db8:{rng.randint(0, 0xffff):04x}:0000::{rng.randint(1, 9)}"
        e("RESOLVES_TO", "HOSTNAME", tail, "IP", ip)
        if rng.random() < 0.3:  # same edge, different props → two links
            e("RESOLVES_TO", "HOSTNAME", tail, "IP", ip, {"rtt": "12"})
        # CNAME chain pointing at the resolving host
        depth = rng.randint(0, 3)
        prev = tail
        for d in range(depth):
            alias = f"cn{d}.{dom}"
            e("ALIAS_OF", "HOSTNAME", alias, "HOSTNAME", prev)
            prev = alias
        if rng.random() < 0.1 and depth >= 1:
            # alias loop: tail is alias of the last cname → cycle
            e("ALIAS_OF", "HOSTNAME", tail, "HOSTNAME", prev)
        if rng.random() < 0.15:
            # dangling cname chain that never resolves
            e("ALIAS_OF", "HOSTNAME", f"dead.{dom}", "HOSTNAME",
              f"gone.{dom}")
    # exact duplicate rows
    for ed in rng.sample(edges, max(1, len(edges) // 20)):
        edges.append(dict(ed))
    docs = []
    for i, ed in enumerate(edges):
        docs.append(FixtureDoc(f"{name}/{i:06d}", name,
                               _spans([("text", json.dumps(ed, sort_keys=True))]),
                               ed))
    return docs


GENERATORS["openintel.dnsgraph"] = gen_openintel_dnsgraph


def gen_ooni_stunreachability(scale: float = 1.0) -> list[FixtureDoc]:
    """ref ooni/stunreachability.py:24-66: stun:// URLs with hostname,
    hostname:port, IP-literal, and co.uk-suffix endpoints; matching and
    mismatching DNS query hostnames; missing inputs (popped)."""
    name = "ooni.stunreachability"
    rng = _rng(name)
    hosts = [f"stun{i}.{d}" for i, d in enumerate(domain_pool()[:40])]
    hosts += [f"stun.media{i}.co.uk" for i in range(4)]  # PSL 3-label
    records = []
    for i in range(int(200 * scale)):
        rec = _ooni_base(rng)
        r = rng.random()
        if r < 0.04:
            pass  # no input → popped
        elif r < 0.15:
            ip = f"198.51.100.{rng.randint(1, 254)}"
            rec["input"] = f"stun://{ip}:{rng.choice([3478, 19302])}"
        else:
            host = rng.choice(hosts)
            port = f":{rng.choice([3478, 19302])}" if rng.random() < 0.7 else ""
            rec["input"] = f"stun://{host}{port}"
        tk = {"failure": (None if rng.random() < 0.75
                          else "generic_timeout_error")}
        queries = []
        if "input" in rec and "//" in rec.get("input", "") and rng.random() < 0.7:
            endpoint_host = rec["input"].split("//")[-1].split(":")[0]
            qhost = (endpoint_host if rng.random() < 0.85
                     else f"cdn.{endpoint_host}")  # mismatch → warn-skip
            answers = []
            for _ in range(rng.randint(1, 3)):
                if rng.random() < 0.6:
                    answers.append({"answer_type": "A",
                                    "ipv4": f"203.0.{rng.randint(0, 255)}.{rng.randint(1, 254)}"})
                else:
                    answers.append({"answer_type": "AAAA",
                                    "ipv6": f"2606:2800:{rng.randint(1, 0xffff):x}::1"})
            if rng.random() < 0.1:
                answers.append({"answer_type": "A", "ipv4": "10.1.2.3"})  # non-global
            queries.append({
                "query_type": rng.choice(["A", "AAAA"]),
                "hostname": qhost,
                "failure": None if rng.random() < 0.9 else "dns_nxdomain_error",
                "answers": answers,
            })
        tk["queries"] = queries
        rec["test_keys"] = tk
        records.append(rec)
    return _ooni_docs(name, records)


GENERATORS["ooni.stunreachability"] = gen_ooni_stunreachability


def gen_bgpkit_as2rel_v6(scale: float = 1.0) -> list[FixtureDoc]:
    return gen_bgpkit_as2rel(scale, name="bgpkit.as2rel_v6")


def gen_ihr_hegemony_v6(scale: float = 1.0) -> list[FixtureDoc]:
    return gen_ihr_hegemony(scale, name="ihr.local_hegemony_v6")


GENERATORS.update({
    "bgpkit.as2rel_v6": gen_bgpkit_as2rel_v6,
    "ihr.local_hegemony_v6": gen_ihr_hegemony_v6,
})


def gen_openintel_infra_mx(scale: float = 1.0) -> list[FixtureDoc]:
    return gen_openintel(scale, name="openintel.infra_mx")


def gen_openintel_crux(scale: float = 1.0) -> list[FixtureDoc]:
    return gen_openintel(scale, name="openintel.crux")


def gen_openintel_toplist(scale: float = 1.0) -> list[FixtureDoc]:
    return gen_openintel(scale, name="openintel.toplist")


GENERATORS.update({
    "openintel.infra_mx": gen_openintel_infra_mx,
    "openintel.crux": gen_openintel_crux,
    "openintel.toplist": gen_openintel_toplist,
})


for _ds in ("crux", "jp", "nl", "rdns"):
    GENERATORS[f"openintel.dnsgraph_{_ds}"] = (
        lambda scale=1.0, _n=f"openintel.dnsgraph_{_ds}":
        gen_openintel_dnsgraph(scale, name=_n)
    )


def gen_pch_routing_v6(scale: float = 1.0) -> list[FixtureDoc]:
    """ref pch/daily_routing_snapshots_v6.py + show_bgp_parser: v6 tables
    wrap the network onto its own line (nexthop + metrics follow on one
    or two continuation lines); no classful shorthand in v6."""
    name = "pch.daily_routing_snapshots_v6"
    rng = _rng(name)
    pool = asn_pool()
    n_collectors = max(4, int(10 * min(scale, 2.0)))
    n_routes = max(8, int(30 * scale))
    docs = []
    for c in range(n_collectors):
        collector = f"route-collector.{COUNTRIES[c % len(COUNTRIES)]}{c}.pch.net"
        lines = [
            f"BGP table version is {2000 + c}, local router ID is 198.51.100.{c}",
            "Status codes: s suppressed, d damped, h history, * valid, > best",
            "Origin codes: i - IGP, e - EGP, ? - incomplete",
            "",
            "   Network          Next Hop            Metric LocPrf Weight Path",
        ]
        expected = set()
        last_pfx = None
        for r in range(n_routes):
            h = rng.randint(1, 0xFFFF)
            plen = rng.choice([40, 48])
            if plen == 40:
                h &= 0xFF00  # /40-aligned third hextet
                h = h or 0x100
            pfx = f"2001:db8:{h:x}::/{plen}"
            origin = rng.choice(pool)
            path = " ".join(
                str(x) for x in rng.sample(pool, rng.randint(1, 3)) + [origin]
            )
            kind = rng.random()
            if kind < 0.10:
                lines.append(f"s  {pfx} 2001:db8::1 0 100 {path} i")
                last_pfx = pfx
            elif kind < 0.18:
                lines.append(f"*> {pfx} 2001:db8::1 0 100 {path} ?")
                last_pfx = pfx
            elif kind < 0.30 and last_pfx is not None:
                # inherited prefix: v6 nexthop first token contains ':'
                lines.append(f"*  2001:db8::{r % 250 + 1} 0 100 {path} i")
                expected.add((last_pfx, origin))
            elif kind < 0.55:
                # fully wrapped: network / nexthop / metrics+path
                lines.append(f"*> {pfx}")
                lines.append(f"                 2001:db8::{r % 250 + 1}")
                lines.append(f"                 0 100 {path} i")
                last_pfx = pfx
                expected.add((pfx, origin))
            else:
                lines.append(f"*> {pfx} 2001:db8::{r % 250 + 1} 0 100 {path} i")
                last_pfx = pfx
                expected.add((pfx, origin))
        lines.append("")
        lines.append(f"Total number of prefixes {n_routes}")
        docs.append(FixtureDoc(
            f"{name}/{c:06d}", name,
            _spans([("text", collector), ("text", "\n".join(lines)),
                    ("media", f"blob://snapshot/{collector}")]),
            {"collector": collector, "expected": sorted(expected)},
        ))
    return docs


GENERATORS["pch.daily_routing_snapshots_v6"] = gen_pch_routing_v6


# ---------------------------------------------------------------- manrs

def gen_manrs_members(scale: float = 1.0) -> list[FixtureDoc]:
    """ref manrs/members.py:58-105: naive comma-split CSV of
    (org, areas, asns, act1..act4); ';'-joined multi-values; orgs
    without ASNs skipped; one header line."""
    name = "manrs.members"
    rng = _rng(name)
    n = max(10, int(50 * min(scale, 1.0)))
    pool = asn_pool()
    docs = [FixtureDoc(
        f"{name}/header", name,
        _spans([("text", "Organization,Areas Served,ASNs,"
                         "Action 1,Action 2,Action 3,Action 4")]),
        {"header": True},
    )]
    for i in range(n):
        org = org_name(rng).replace(",", "")
        if rng.random() < 0.08:
            asns = ""  # no ASN → skipped
        else:
            asns = ";".join(str(a) for a in
                            rng.sample(pool, rng.randint(1, 3)))
        areas = ";".join(rng.choice(COUNTRIES).upper()
                         for _ in range(rng.randint(1, 2)))
        acts = [rng.choice(["Yes", "No", ""]) for _ in range(4)]
        line = f"{org},{areas},{asns}," + ",".join(acts)
        docs.append(FixtureDoc(
            f"{name}/{i:06d}", name, _spans([("text", line)]),
            {"org": org, "areas": areas, "asns": asns, "acts": acts},
        ))
    return docs


GENERATORS["manrs.members"] = gen_manrs_members


for _ix in ("bcix", "ddix", "ixaustralia", "ixbr", "megaport", "netnod",
            "nzix", "pix", "sfmix", "six", "topix"):
    GENERATORS[f"alice_lg.{_ix}"] = (
        lambda scale=1.0, _n=f"alice_lg.{_ix}":
        gen_alice_lg(max(0.08, scale * 0.3), name=_n)  # small per-instance
    )
