"""Distributed remote-dataset intake: bucket JSONL scans and paginated
REST fan-out (SURVEY §2 S5, S6).

S5 — parallel JSONL scan over a bucket listing. The reference downloads
OONI measurement files from S3 with an anonymous boto3 client driving a
multiprocessing pool (`ooni/utils/grabber.py:21-80`) and streams jsonl
objects per file (`simulamet/rirdata_rdns.py:57-130`). Spark-native, the
listing IS the parallelism: one `spark.read` over the path list (or a
recursive glob) plans one task per file split — no process pool, no
driver-side downloads, and the same code reads `s3a://` on a cluster.
The schema is EXPLICIT by contract: schema inference is a second full
pass over the data, which at 100 TB doubles the scan.

S6 — paginated REST scan. The reference pages three ways: offset windows
against a known total (`caida/asrank.py:41-51`), cursor `next` chains
(`ripe/atlas_probes.py:69-79`), and parallel futures per key with a page
cap and retry (`alice_lg/__init__.py:112-172`, `cloudflare/__init__.py:
63-77`). Spark-native, fetched pages become ROWS of the documents table:

- offset pagination fans out via `spark.range(n_pages)` — every task
  fetches its own page window concurrently (the futures pool, minus the
  pool);
- cursor chains are inherently sequential PER KEY (each `next` token
  comes from the previous page), so the chain walks inside the task
  while KEYS fan out across the cluster — exactly the reference's
  one-future-per-neighbor shape;
- retry with exponential backoff runs inside the task, per page.

This sandbox has no network, so fetchers are injected callables
(production drops in urllib/boto3; tests use local closures). Fetchers
are pickled to executors — keep them top-level functions or small
closures over plain data.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# payload-returning fetchers
OffsetFetcher = Callable[[int, int], str]  # (offset, limit) -> payload
CursorFetcher = Callable[[str, str | None], tuple[str, str | None]]
#                         (key, cursor)    -> (payload, next_cursor|None)


def scan_jsonl(
    spark: SparkSession,
    paths: list[str] | str,
    schema,
    recursive: bool = False,
    glob: str | None = None,
) -> DataFrame:
    """Parallel JSON-lines scan with an explicit schema and per-row file
    lineage (`_file`). ``paths`` may be a directory root with
    ``recursive=True`` + ``glob`` (e.g. "*.jsonl.gz") — the planner lists
    once and splits across tasks; gz/bz2 decode transparently from the
    extension. Explicit ``schema`` is required: letting Spark infer would
    read every byte twice, which is the difference between one and two
    100-TB scans."""
    reader = spark.read.schema(schema)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.json(paths)
    return df.withColumn("_file", F.input_file_name())


def _with_retry(fn: Callable, args: tuple, max_retries: int,
                backoff_s: float):
    """Call ``fn(*args)``, retrying transient failures with exponential
    backoff (the reference retries inside its futures the same way,
    `alice_lg/__init__.py:145-160`). Raises the last error after
    ``max_retries`` extra attempts."""
    for attempt in range(max_retries + 1):
        try:
            return fn(*args)
        except Exception:
            if attempt == max_retries:
                raise
            time.sleep(backoff_s * (2 ** attempt))


def _doc(crawler: str, tag: str, seq: int, spans: list[dict]) -> dict:
    return {
        "doc_id": f"{crawler}/{tag}/{seq:06d}",
        "spans": spans,
        "crawler": crawler,
    }


def _text_span(text: str, offset: int) -> dict:
    return {"kind": "text", "text": text, "media_ref": None,
            "offset": offset}


def fetch_offset_pages(
    spark: SparkSession,
    fetcher: OffsetFetcher,
    total: int,
    page_size: int,
    crawler: str,
    max_retries: int = 3,
    backoff_s: float = 0.05,
    partitions: int | None = None,
) -> DataFrame:
    """Offset-paginated fetch, fanned out across the cluster: page i's
    task calls ``fetcher(i*page_size, page_size)`` and emits the payload
    as one single-span document row. ``total`` typically comes from one
    driver-side probe request (the reference learns ``totalCount`` the
    same way, `caida/asrank.py:28-38`) — one request, then the remaining
    ``ceil(total/page_size)`` fetches are executor work. At production
    page counts, cap concurrency with ``partitions`` so the remote API
    sees a bounded worker pool (the reference caps at 4-8 workers)."""
    from .schema import DOCUMENTS_SCHEMA

    n_pages = max((total + page_size - 1) // page_size, 0)
    pages = spark.range(n_pages)
    if partitions is not None:
        pages = pages.repartition(partitions)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for pid in pdf["id"]:
                off = int(pid) * page_size
                payload = _with_retry(
                    fetcher, (off, page_size), max_retries, backoff_s)
                rows.append(_doc(crawler, "offset", int(pid),
                                 [_text_span(payload, 0)]))
            yield pd.DataFrame(rows, columns=["doc_id", "spans", "crawler"])

    return pages.mapInPandas(run, DOCUMENTS_SCHEMA)


def fetch_cursor_pages(
    spark: SparkSession,
    keys: DataFrame | Iterable[str],
    fetcher: CursorFetcher,
    crawler: str,
    max_pages: int = 10,
    max_retries: int = 3,
    backoff_s: float = 0.05,
) -> DataFrame:
    """Cursor-chain fetch: for every key, walk ``fetcher(key, cursor)``
    until it returns ``next_cursor=None`` or ``max_pages`` is hit (the
    reference caps route pages at 10/neighbor, `alice_lg/__init__.py:
    306`). Chains are sequential by construction; the fan-out is ACROSS
    keys — Spark partitions the key set so thousands of chains walk
    concurrently, one per task slot. Each page becomes a two-span
    document (span 0 = key, span 1 = payload) so downstream parses see
    which chain a page belongs to."""
    from .schema import DOCUMENTS_SCHEMA

    if not isinstance(keys, DataFrame):
        keys = spark.createDataFrame(
            [(k,) for k in keys], "key string")

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for key in pdf["key"]:
                cursor: str | None = None
                for seq in range(max_pages):
                    payload, cursor = _with_retry(
                        fetcher, (key, cursor), max_retries, backoff_s)
                    rows.append(_doc(
                        crawler, key, seq,
                        [_text_span(key, 0), _text_span(payload, 1)]))
                    if cursor is None:
                        break
            yield pd.DataFrame(rows, columns=["doc_id", "spans", "crawler"])

    return keys.select("key").mapInPandas(run, DOCUMENTS_SCHEMA)
