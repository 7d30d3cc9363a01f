"""sources.ingest_* — compressed file intake (S3): Spark's text scan
decodes gz/bz2 from the extension; lines become document rows that the
ordinary crawlers consume unchanged."""

from __future__ import annotations

import bz2
import gzip
import json
import os
import tempfile

from pyspark.sql import functions as F

from iyp_spark.sources import ingest_lines, ingest_tagged_lines


def test_ingest_gz_and_bz2_lines(spark):
    d = tempfile.mkdtemp(prefix="iyp_src_")
    rows = [{"prefix": "192.0.2.0/24", "asn": 64500},
            {"prefix": "2001:db8::/32", "asn": 64501}]
    gz = os.path.join(d, "a.jsonl.gz")
    with gzip.open(gz, "wt") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    bz = os.path.join(d, "b.jsonl.bz2")
    with bz2.open(bz, "wt") as f:
        f.write(json.dumps({"prefix": "198.51.100.0/24", "asn": 64502}) + "\n")
        f.write("\n")  # blank skipped

    docs = ingest_lines(spark, [gz, bz], "bgpkit.pfx2asn")
    got = docs.collect()
    assert len(got) == 3
    assert all(r["crawler"] == "bgpkit.pfx2asn" for r in got)
    # spans carry the raw line; parseable back
    payloads = sorted(
        json.loads(r["spans"][0]["text"])["asn"] for r in got
    )
    assert payloads == [64500, 64501, 64502]
    # doc ids unique and file-scoped
    assert len({r["doc_id"] for r in got}) == 3


def test_ingest_tagged_files_feed_a_real_crawler(spark):
    """gz-compressed maxmind-style CSVs → documents → the actual
    maxmind crawler transform produces the COUNTRY links."""
    import tempfile as tf

    from iyp_spark.crawlers.geolite import MaxmindGeoliteCountry
    from iyp_spark.store import GraphStore

    d = tempfile.mkdtemp(prefix="iyp_src2_")
    loc = os.path.join(d, "locations.csv.gz")
    with gzip.open(loc, "wt") as f:
        f.write("geoname_id,locale_code,continent_code,continent_name,"
                "country_iso_code,country_name,is_in_european_union\n")
        f.write("3001,en,EU,Europe,DE,Germany,1\n")
        f.write("2999,en,AS,Asia,,,0\n")
    blocks = os.path.join(d, "blocks_v4.csv.gz")
    with gzip.open(blocks, "wt") as f:
        f.write("network,geoname_id\n")
        f.write("192.0.2.0/24,3001\n")
        f.write("198.51.100.0/24,\n")

    docs = ingest_tagged_lines(
        spark, {"location": loc, "block_v4": blocks},
        "maxmind.geolite_country", skip_header=True,
    )
    store = GraphStore(spark, tf.mkdtemp(prefix="iyp_src_lake_"))
    store.write_documents(docs)
    crawler = MaxmindGeoliteCountry(store)
    crawler.run()
    triples = {
        (r["subj_key"], r["pred"], r["obj_key"])
        for r in store.read_triples("maxmind.geolite_country").collect()
    }
    assert triples == {("192.0.2.0/24", "COUNTRY", "DE")}
