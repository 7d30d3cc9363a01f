"""Structured Streaming ingest — incremental, file-arrival KG construction.

The reference is strictly batch (weekly dump, create_db.py:50-51); its
"incrementality" is fetch-cache resume (iyp/__init__.py:810-831). SURVEY
§2.9 maps that to an optional Trigger.AvailableNow file-arrival stream into
the documents table, which is what this module provides:

- ``ingest_documents``: new parquet drops land in the lake's documents
  table; the streaming checkpoint guarantees each file is ingested exactly
  once across restarts (the S7 resume semantics, engine-enforced).
- ``incremental_triples``: foreachBatch runs a crawler's transform on each
  newly-arrived micro-batch and appends the resulting triples — a crawler
  that keeps up with its source instead of re-reading it weekly. Batch ids
  are recorded in lineage, so a replayed batch is detectable. (On Iceberg
  the append would be an idempotent commit keyed by batch id.)

Both run with Trigger.AvailableNow: process everything new, then stop —
cron-friendly, no always-on cluster needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import DOCUMENTS_SCHEMA
from .store import GraphStore


def ingest_documents(
    spark: SparkSession, drop_dir: str, store: GraphStore, checkpoint_dir: str
) -> None:
    """Stream new document files from ``drop_dir`` into the documents table
    (exactly-once per file via the stream checkpoint)."""
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(drop_dir)
    )
    query = (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("crawler")
        .format("parquet")
        .option("path", store.documents_path)
        .start()
    )
    query.awaitTermination()


def incremental_triples(
    spark: SparkSession,
    store: GraphStore,
    crawler_cls,
    drop_dir: str,
    checkpoint_dir: str,
) -> None:
    """Incremental crawler: for every micro-batch of newly-arrived documents
    run the crawler's transform and append its triples + merge its nodes."""
    crawler = crawler_cls(store)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.filter(F.col("crawler") == crawler.NAME)
        if docs.isEmpty():
            return
        node_dfs, triple_dfs = crawler.transform(docs)
        triples = triple_dfs[0]
        for extra in triple_dfs[1:]:
            triples = triples.unionByName(extra)
        # foreachBatch is at-least-once: a crash between the write and the
        # stream-checkpoint commit replays this batch. append_triples_batch
        # writes files under deterministic batch-keyed names, so the replay
        # REPLACES them (no silent duplicates); the node upsert is a
        # key-merge and therefore idempotent by construction.
        n = store.append_triples_batch(crawler.NAME, triples, batch_id)
        for nd in node_dfs:
            store.upsert_nodes(nd, count_rows=False)
        store.log_lineage(crawler.NAME, f"stream_batch_{batch_id}", n, 0.0)

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(drop_dir)
    )
    query = (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(process_batch)
        .start()
    )
    query.awaitTermination()
