"""Structured Streaming ingest: exactly-once file-arrival semantics and
incremental triple construction (iyp_spark/streaming.py)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from iyp_spark.fixtures import GENERATORS, docs_to_rows
from iyp_spark.schema import DOCUMENTS_SCHEMA
from iyp_spark.store import GraphStore
from iyp_spark.streaming import incremental_triples, ingest_documents


def _drop(spark, drop_dir, docs, part):
    """Land one flat parquet file in the drop dir (file-arrival pattern)."""
    import glob

    tmp = tempfile.mkdtemp(prefix="iyp_drop_stage_")
    df = spark.createDataFrame(docs_to_rows(docs), DOCUMENTS_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(drop_dir, exist_ok=True)
    src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.move(src, os.path.join(drop_dir, f"{part}.parquet"))
    shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_ingest_exactly_once(spark):
    base = tempfile.mkdtemp(prefix="iyp_stream_")
    try:
        drop = os.path.join(base, "drop")
        cp = os.path.join(base, "cp")
        store = GraphStore(spark, os.path.join(base, "lake"))
        all_docs = GENERATORS["bgpkit.pfx2asn"](0.1)
        half = len(all_docs) // 2

        _drop(spark, drop, all_docs[:half], "part1")
        ingest_documents(spark, drop, store, cp)
        n1 = store.read_documents().count()
        assert n1 == half

        # second drop: only the NEW file is picked up
        _drop(spark, drop, all_docs[half:], "part2")
        ingest_documents(spark, drop, store, cp)
        n2 = store.read_documents().count()
        assert n2 == len(all_docs)

        # re-run with nothing new: no duplicates (exactly-once per file)
        ingest_documents(spark, drop, store, cp)
        assert store.read_documents().count() == len(all_docs)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_incremental_triple_construction(spark):
    from iyp_spark.crawlers import REGISTRY

    base = tempfile.mkdtemp(prefix="iyp_stream2_")
    try:
        drop = os.path.join(base, "drop")
        cp = os.path.join(base, "cp")
        store = GraphStore(spark, os.path.join(base, "lake"))
        docs = GENERATORS["bgpkit.pfx2asn"](0.1)
        half = len(docs) // 2

        _drop(spark, drop, docs[:half], "part1")
        incremental_triples(spark, store, REGISTRY["bgpkit.pfx2asn"], drop, cp)
        c1 = store.read_triples().count()
        assert c1 > 0

        _drop(spark, drop, docs[half:], "part2")
        incremental_triples(spark, store, REGISTRY["bgpkit.pfx2asn"], drop, cp)
        c2 = store.read_triples().count()
        assert c2 > c1

        # triples are well-formed ORIGINATE edges
        preds = {r["pred"] for r in store.read_triples().select("pred").distinct().collect()}
        assert preds == {"ORIGINATE"}
        # node dictionary merged incrementally too
        assert store.read_nodes("AS").count() > 0
    finally:
        shutil.rmtree(base, ignore_errors=True)
