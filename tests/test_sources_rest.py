"""S5/S6 intake: parallel bucket JSONL scan and paginated REST fan-out.

The reference's download side (ooni/utils/grabber.py multiprocessing S3
pool; caida/asrank.py offset pages; ripe/atlas_probes.py cursor chains;
alice_lg futures + page cap + retry) re-expressed as cluster fan-out. No
network in the sandbox: fetchers are local closures, which is the
production seam too (drop in urllib/boto3 on a cluster)."""

from __future__ import annotations

import gzip
import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _bucket(tmp: str) -> int:
    """An S3-ish layout: <root>/<date>/<cc>/<n>.jsonl.gz + one stray
    non-jsonl file that the glob must ignore. Returns the file count."""
    n_files = 0
    for date in ("2024-01-01", "2024-01-02", "2024-01-03"):
        for cc in ("it", "ru", "us", "cn"):
            d = os.path.join(tmp, date, cc)
            os.makedirs(d, exist_ok=True)
            lines = [
                json.dumps({"mid": f"{date}/{cc}/{i}", "cc": cc,
                            "anomaly": i % 2 == 0})
                for i in range(5)
            ]
            with gzip.open(os.path.join(d, "0000.jsonl.gz"), "wt") as f:
                f.write("\n".join(lines) + "\n")
            n_files += 1
    with open(os.path.join(tmp, "README.txt"), "w") as f:
        f.write("not data\n")
    return n_files


def test_scan_jsonl_bucket_recursive_glob(spark):
    from iyp_spark.sources_rest import scan_jsonl

    tmp = tempfile.mkdtemp(prefix="iyp_s5_")
    n_files = _bucket(tmp)
    schema = T.StructType([
        T.StructField("mid", T.StringType()),
        T.StructField("cc", T.StringType()),
        T.StructField("anomaly", T.BooleanType()),
    ])
    df = scan_jsonl(spark, tmp, schema, recursive=True, glob="*.jsonl.gz")
    # explicit schema honored verbatim (no inference pass), lineage added
    assert [f.name for f in df.schema.fields] == ["mid", "cc", "anomaly",
                                                  "_file"]
    rows = df.collect()
    assert len(rows) == n_files * 5
    assert len({r["_file"] for r in rows}) == n_files  # README ignored
    assert {r["cc"] for r in rows} == {"it", "ru", "us", "cn"}
    anomalies = df.filter("anomaly").count()
    assert anomalies == n_files * 3  # i in {0,2,4} per file


def _offset_fetcher(total: int):
    """Deterministic fake API with an injected transient fault: every
    page's FIRST attempt fails (the retry loop runs inside the task, so a
    per-closure attempt map is visible across attempts)."""
    attempts: dict[int, int] = {}

    def fetch(offset: int, limit: int) -> str:
        attempts[offset] = attempts.get(offset, 0) + 1
        if attempts[offset] == 1:
            raise ConnectionError(f"transient at offset {offset}")
        return json.dumps(
            {"offset": offset,
             "asns": list(range(offset, min(offset + limit, total)))})

    return fetch


def test_offset_pages_fan_out_retry_and_parse(spark):
    """7 offset pages fetched as executor work (spark.range fan-out),
    each surviving one injected transient failure, then parsed
    pages->rows — the caida.asrank shape end-to-end."""
    from iyp_spark.sources_rest import fetch_offset_pages

    total, page = 65, 10
    docs = fetch_offset_pages(
        spark, _offset_fetcher(total), total, page,
        crawler="caida.asrank", backoff_s=0.01)
    rows = sorted(docs.collect(), key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in rows] == [
        f"caida.asrank/offset/{i:06d}" for i in range(7)]
    assert all(r["crawler"] == "caida.asrank" for r in rows)
    assert all(len(r["spans"]) == 1 and r["spans"][0]["kind"] == "text"
               for r in rows)

    # no per-row Python in the plan — MapInPandas only
    plan = docs._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan

    parsed = (
        docs.select(F.from_json(
            F.col("spans")[0]["text"],
            "offset INT, asns ARRAY<INT>").alias("p"))
        .select(F.explode("p.asns").alias("asn"))
    )
    assert sorted(r["asn"] for r in parsed.collect()) == list(range(total))


def test_offset_pages_exhausted_retries_raise(spark):
    from iyp_spark.sources_rest import fetch_offset_pages

    def always_down(offset: int, limit: int) -> str:
        raise ConnectionError("hard down")

    docs = fetch_offset_pages(spark, always_down, total=5, page_size=5,
                              crawler="x", max_retries=1, backoff_s=0.01)
    with pytest.raises(Exception, match="hard down"):
        docs.collect()


def test_cursor_chains_walk_per_key_with_page_cap(spark):
    """Cursor chains: sequential per key, parallel across keys, capped at
    max_pages (alice_lg's <=10 pages/neighbor guard). Chain lengths
    3 / 1 / 12 -> 3 / 1 / 10 pages."""
    from iyp_spark.sources_rest import fetch_cursor_pages

    chain_len = {"r1": 3, "r2": 1, "r3": 12}

    def fetch(key: str, cursor: str | None):
        seq = 0 if cursor is None else int(cursor)
        nxt = str(seq + 1) if seq + 1 < chain_len[key] else None
        return json.dumps({"key": key, "page": seq}), nxt

    docs = fetch_cursor_pages(
        spark, ["r1", "r2", "r3"], fetch, crawler="alice_lg.decix",
        max_pages=10, backoff_s=0.01)
    rows = sorted(docs.collect(), key=lambda r: r["doc_id"])
    per_key: dict[str, list] = {}
    for r in rows:
        key = r["spans"][0]["text"]
        per_key.setdefault(key, []).append(r)
    assert {k: len(v) for k, v in per_key.items()} == {
        "r1": 3, "r2": 1, "r3": 10}
    for key, krows in per_key.items():
        for seq, r in enumerate(krows):
            assert r["doc_id"] == f"alice_lg.decix/{key}/{seq:06d}"
            body = json.loads(r["spans"][1]["text"])
            assert body == {"key": key, "page": seq}
            assert [s["offset"] for s in r["spans"]] == [0, 1]
