"""Post-processor tests on graph-level fixtures (FIXTURES.md §4) — seeded
node dictionaries, golden computed by brute-force Python (ipaddress), no
documents involved."""

from __future__ import annotations

import ipaddress
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from iyp_spark.schema import NODES_SCHEMA, TRIPLES_SCHEMA
from iyp_spark.store import GraphStore

PREFIXES = {
    # fe80::/10 and fc00::/7 are COARSE (shorter than the /16 v6 bucket) and
    # live above 10^38 — they overflow a decimal(38,0) representation and
    # exercise the broadcast-range path; 8.0.0.0/6 is the v4 coarse case.
    "BGPPrefix": ["10.0.0.0/8", "10.1.0.0/16", "10.1.2.0/24", "192.168.0.0/16",
                  "2001:db8::/32", "2001:db8:1::/48", "fe80::/10", "8.0.0.0/6"],
    "GeoPrefix": ["10.1.0.0/16", "172.16.0.0/12"],
    "RIRPrefix": ["10.0.0.0/8", "2001:db8::/32", "fc00::/7"],
}
IPS = ["10.1.2.3", "10.1.9.9", "10.9.9.9", "172.16.5.5", "9.9.9.9",
       "2001:db8:1::42", "2001:db8:ffff::1", "2a01::1",
       "fe80::1234", "fdab:1234::1", "ff02::fb"]


def seed_store(spark) -> GraphStore:
    root = tempfile.mkdtemp(prefix="iyp_post_")
    store = GraphStore(spark, root)
    rows = []
    for label, pfxs in PREFIXES.items():
        for p in pfxs:
            rows.append((label, p, 0, [label, "Prefix"], None))
    for ip in IPS:
        rows.append(("IP", ip, 0, ["IP"], None))
    for cc in ["JP", "US", "XX", "DE"]:
        rows.append(("Country", cc, 0, ["Country"], None))
    for url in ["https://www.example.com/page", "http://user@blog.example.org:8080/x",
                "https://nomatch.example.net/",
                "https://shop.example.co.uk/basket",   # multi-label public suffix
                "http://192.0.2.7/x",                  # IP host: tldextract fqdn == ''
                "https://co.uk/",                      # bare suffix: no domain label
                "https://cdn.example.unknowntld/js"]:  # unlisted TLD: no suffix
        rows.append(("URL", url, 0, ["URL"], None))
    for host in ["www.example.com", "blog.example.org", "shop.example.co.uk",
                 "192.0.2.7", "co.uk", "cdn.example.unknowntld"]:
        rows.append(("HostName", host, 0, ["HostName"], None))
    df = spark.createDataFrame(
        [(l, k, 0, labs, p) for l, k, _, labs, p in rows], NODES_SCHEMA
    ).withColumn("node_id", F.xxhash64("label", "key"))
    store.upsert_nodes(df)
    return store


def golden_lpm() -> set:
    """Brute-force reference semantics (iyp/post/ip2prefix.py:57-108)."""
    out = set()
    trees = {
        lab: [(ipaddress.ip_network(p), p) for p in pfxs]
        for lab, pfxs in PREFIXES.items()
    }
    for ip in IPS:
        addr = ipaddress.ip_address(ip)
        for lab, nets in trees.items():
            best = None
            for net, p in nets:
                if addr.version == net.version and addr in net:
                    if best is None or net.prefixlen > best[0].prefixlen:
                        best = (net, p)
            if best:
                out.add(("IP", ip, "PART_OF", lab, best[1]))
    for lab0, pfxs0 in PREFIXES.items():
        for p0 in pfxs0:
            c = ipaddress.ip_network(p0)
            if c.prefixlen == 0:
                continue
            for lab1, nets in trees.items():
                best = None
                for net, p in nets:
                    if net.version != c.version:
                        continue
                    covers = (net.network_address <= c.network_address
                              and net.broadcast_address >= c.broadcast_address)
                    if not covers:
                        continue
                    if lab0 == lab1 and net.prefixlen >= c.prefixlen:
                        continue
                    if lab0 != lab1 and net.prefixlen > c.prefixlen:
                        continue
                    if best is None or net.prefixlen > best[0].prefixlen:
                        best = (net, p)
                if best:
                    out.add((lab0, p0, "PART_OF", lab1, best[1]))
    return out


@pytest.fixture(scope="module")
def post_store(spark):
    store = seed_store(spark)
    yield store
    shutil.rmtree(store.root, ignore_errors=True)


def test_ip2prefix_lpm(post_store):
    from iyp_spark.post.ip2prefix import Ip2Prefix

    Ip2Prefix(post_store).run()
    emitted = {
        tuple(r)
        for r in post_store.read_triples("iyp.ip2prefix")
        .select("subj_label", "subj_key", "pred", "obj_label", "obj_key")
        .collect()
    }
    golden = golden_lpm()
    assert emitted == golden, (
        f"missing={sorted(golden - emitted)[:6]} extra={sorted(emitted - golden)[:6]}"
    )
    # network/prefixlen props added (ref :44-52)
    props = post_store.read_nodes("BGPPrefix").filter(
        F.col("key") == "10.1.2.0/24"
    ).first()["props"]
    assert props["network"] == "10.1.2.0" and props["prefixlen"] == "24"


def test_address_family(post_store):
    from iyp_spark.post.address_family import AddressFamily

    AddressFamily(post_store).run()
    rows = post_store.read_nodes().filter(
        F.array_contains("labels", "Prefix") | (F.col("label") == "IP")
    ).select("key", "props").collect()
    for r in rows:
        expect = "6" if ":" in r["key"] else "4"
        assert r["props"]["af"] == expect, r


def test_country_information(post_store):
    from iyp_spark.post.country_information import CountryInformation

    CountryInformation(post_store).run()
    rows = {r["key"]: r["props"] for r in post_store.read_nodes("Country").collect()}
    assert rows["JP"]["alpha3"] == "JPN" and rows["JP"]["name"] == "Japan"
    assert rows["DE"]["alpha3"] == "DEU"
    assert not rows["XX"] or "alpha3" not in rows["XX"]  # invalid skipped


def test_url2hostname(post_store):
    from iyp_spark.post.url2hostname import Url2Hostname

    Url2Hostname(post_store).run()
    emitted = {
        (r["subj_key"], r["obj_key"])
        for r in post_store.read_triples("iyp.url2hostname").collect()
    }
    # PSL semantics: the IP-host, bare-suffix, and unknown-TLD URLs must NOT
    # link even though matching HostName nodes exist (tldextract fqdn == '')
    assert emitted == {
        ("https://www.example.com/page", "www.example.com"),
        ("http://user@blog.example.org:8080/x", "blog.example.org"),
        ("https://shop.example.co.uk/basket", "shop.example.co.uk"),
    }


def test_clean_links(spark):
    from iyp_spark.post.clean_links import CleanLinks

    root = tempfile.mkdtemp(prefix="iyp_clean_")
    store = GraphStore(spark, root)
    try:
        ref = ("ooni.webconnectivity", "OONI", None, None, None, None)
        rows = [
            # duplicate (src,dst) COUNTRY edges → keep one
            (1, "COUNTRY", 2, "AS", "1", "Country", "JP", {"k": "a"}, ref, "ooni.webconnectivity"),
            (1, "COUNTRY", 2, "AS", "1", "Country", "JP", {"k": "b"}, ref, "ooni.webconnectivity"),
            (1, "COUNTRY", 3, "AS", "1", "Country", "US", None, ref, "ooni.webconnectivity"),
            # non-target pred untouched
            (1, "CENSORED", 4, "AS", "1", "URL", "x", None, ref, "ooni.webconnectivity"),
        ]
        df = spark.createDataFrame(rows, TRIPLES_SCHEMA)
        store.replace_triples("ooni.webconnectivity", df)
        res = CleanLinks(store).run()
        assert res["removed"] == 1
        left = store.read_triples().count()
        assert left == 3
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_post_passes_on_real_pipeline(spark):
    """Integration: post-processors find cross-crawler work on the real
    fixture graph (openintel IPs inside pfx2asn prefixes → LPM links;
    inetintel websites on openintel hosts → url2hostname links)."""
    import tempfile as tf

    from iyp_spark.crawlers import CRAWLER_ORDER
    from iyp_spark.fixtures import write_corpus
    from iyp_spark.framework import run_pipeline_batched
    from iyp_spark.post import POST_ORDER

    root = tf.mkdtemp(prefix="iyp_postint_")
    try:
        store = GraphStore(spark, root)
        write_corpus(store, scale=0.3)
        run_pipeline_batched(store, CRAWLER_ORDER)
        for post in POST_ORDER:
            post(store).run()
        assert store.read_triples("iyp.ip2prefix").count() > 0
        assert store.read_triples("iyp.url2hostname").count() > 0
        af = store.read_nodes("IP").first()["props"].get("af")
        assert af in ("4", "6")
    finally:
        shutil.rmtree(root, ignore_errors=True)
