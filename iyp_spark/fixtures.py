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


def gen_bgpkit_as2rel(scale: float = 1.0) -> list[FixtureDoc]:
    """FIXTURES.md §2.4 — ref iyp/crawlers/bgpkit/__init__.py:29-47."""
    name = "bgpkit.as2rel_v4"
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
    Mixes existing domains (tranco pool), new 2-label domains, and
    3-label hostnames; a few invalid lines (no comma)."""
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
            if r < 0.55:
                nm = rng.choice(pool)  # likely existing DomainName
            elif r < 0.75:
                w = rng.choice(ORG_WORDS).lower()
                nm = f"{w}{i}new.{rng.choice(TLDS)}"  # new 2-label domain
            else:
                sub = rng.choice(["www", "mail", "cdn", "api"])
                nm = f"{sub}.{rng.choice(pool)}"  # hostname
            line = f"{i + 1},{nm}"
            rec = {"rank": i + 1, "name": nm}
        docs.append(FixtureDoc(f"{name}/{i:06d}", name, _spans([("text", line)]), rec))
    return docs


def gen_ihr_hegemony(scale: float = 1.0) -> list[FixtureDoc]:
    """FIXTURES.md §2.10 — ref iyp/crawlers/ihr/__init__.py:49-81.
    Two timebins; only the first is kept by the reference."""
    name = "ihr.local_hegemony_v4"
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
