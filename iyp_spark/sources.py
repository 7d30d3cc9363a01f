"""File-intake sources: raw fetched payloads → document rows (S1-S3, S5).

The reference decompresses in-process (gzip/bz2/lz4 wrappers around
requests bodies: ihr/rov.py:57-58 lz4.frame, caida/__init__.py:47 bz2,
ipinfo/ip_country.py:35 gzip, nro streams). Spark's text source handles
gz/bz2 (and on clusters lz4/zstd/snappy via Hadoop codecs)
TRANSPARENTLY from the file extension — the decompress "operator" is the
scan itself, split-parallel for bz2 and one-task-per-file for gz, which
is exactly how a 100-TB S3 ingest wants it (many files → many tasks).

``ingest_lines``: each input line becomes one single-span document.
``ingest_tagged_lines``: per-file kind tags (maxmind's location/block
files, iana's v4/v6/special registries) become span 0, the line span 1.

Line numbering within a file uses a window over a per-file monotonic id —
deterministic doc_ids without collecting anything to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _docs_from_lines(lines: DataFrame, crawler: str,
                     kind_col: F.Column | None) -> DataFrame:
    """(value, _file) → DOCUMENTS_SCHEMA rows with stable per-file seqs."""
    w = Window.partitionBy("_file").orderBy("_mono")
    numbered = (
        lines.withColumn("_mono", F.monotonically_increasing_id())
        .withColumn("_seq", F.row_number().over(w))
    )
    span = F.struct(
        F.lit("text").alias("kind"),
        F.col("value").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(0).alias("offset"),
    )
    spans = F.array(span)
    if kind_col is not None:
        tag = F.struct(
            F.lit("text").alias("kind"),
            kind_col.alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(0).alias("offset"),
        )
        body = F.struct(
            F.lit("text").alias("kind"),
            F.col("value").alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(1).alias("offset"),
        )
        spans = F.array(tag, body)
    return numbered.select(
        F.concat(
            F.lit(crawler), F.lit("/"),
            F.sha2(F.col("_file"), 256).substr(1, 12), F.lit("/"),
            F.format_string("%06d", F.col("_seq")),
        ).alias("doc_id"),
        spans.alias("spans"),
        F.lit(crawler).alias("crawler"),
    )


def ingest_lines(spark: SparkSession, paths: list[str] | str,
                 crawler: str, skip_blank: bool = True) -> DataFrame:
    """Read text files (plain or .gz/.bz2 — codec from extension) into
    one-span-per-line documents for ``crawler``."""
    lines = spark.read.text(paths).withColumn(
        "_file", F.input_file_name()
    )
    if skip_blank:
        lines = lines.filter(F.trim("value") != "")
    return _docs_from_lines(lines, crawler, None)


def ingest_tagged_lines(spark: SparkSession, tagged_paths: dict[str, str],
                        crawler: str, skip_blank: bool = True,
                        skip_header: bool = False) -> DataFrame:
    """Read {kind: path} text files into two-span documents
    (span 0 = kind, span 1 = line) — the multi-file crawlers' shape
    (maxmind location/block_v4/block_v6, iana v4/v6/special)."""
    out = None
    for kind, path in sorted(tagged_paths.items()):
        lines = spark.read.text(path).withColumn(
            "_file", F.input_file_name()
        )
        if skip_blank:
            lines = lines.filter(F.trim("value") != "")
        docs = _docs_from_lines(lines, crawler, F.lit(kind))
        if skip_header:
            docs = docs.filter(~F.col("doc_id").endswith("/000001"))
        out = docs if out is None else out.unionByName(docs)
    return out
