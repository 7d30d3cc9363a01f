"""File-intake sources: raw fetched payloads → document rows (S1-S3, S5).

The reference decompresses in-process (gzip/bz2/lz4 wrappers around
requests bodies: ihr/rov.py:57-58 lz4.frame, caida/__init__.py:47 bz2,
ipinfo/ip_country.py:35 gzip, ripe/roa.py:51-52 xz, tranco/top1m.py:47-49
and maxmind/geolite_country.py:69-96 zip, nro streams). Two Spark paths:

- gz/bz2 (and on clusters lz4/zstd/snappy via Hadoop codecs): Spark's text
  source decodes TRANSPARENTLY from the file extension — the decompress
  "operator" is the scan itself, split-parallel for bz2 and
  one-task-per-file for gz, which is exactly how a 100-TB S3 ingest wants
  it (many files → many tasks).
- xz / zip / lz4 (``ingest_compressed``): whole files read as BINARY spans
  (binaryFile source, one task per file — the same per-file parallelism
  the reference's per-download decompress has) and decompressed INSIDE
  mapInPandas: stdlib lzma/zipfile, and an in-repo LZ4-frame decoder used
  when the ``lz4`` package is absent (import-tried first). Lines become
  ordinary document rows; per-file sequence numbers are assigned inside
  the task (deterministic — the file's line order), so no window, no
  shuffle.

``ingest_lines``: each input line becomes one single-span document.
``ingest_tagged_lines``: per-file kind tags (maxmind's location/block
files, iana's v4/v6/special registries) become span 0, the line span 1.

Line numbering within a file uses a window over a per-file monotonic id —
deterministic doc_ids without collecting anything to the driver.
"""

from __future__ import annotations

import hashlib
import struct as _struct

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


# ---------------------------------------------------------------- binary-span
# decompression (S3 residual: xz / zip / lz4)

def _lz4_block(src: bytes, out: bytearray) -> None:
    """Decompress one raw LZ4 block, appending to ``out`` (history-aware:
    matches may reference bytes produced by PREVIOUS blocks when the frame
    is block-dependent)."""
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = src[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        out += src[i:i + lit_len]
        i += lit_len
        if i >= n:
            break  # last sequence: literals only
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise ValueError("corrupt lz4 block: zero offset")
        match_len = (token & 0xF)
        if match_len == 15:
            while True:
                b = src[i]
                i += 1
                match_len += b
                if b != 255:
                    break
        match_len += 4
        start = len(out) - offset
        if start < 0:
            raise ValueError("corrupt lz4 block: offset before start")
        for j in range(match_len):  # byte-wise: overlapping matches are legal
            out.append(out[start + j])


def lz4_frame_decompress(data: bytes) -> bytes:
    """Minimal LZ4 *frame* decoder (magic 0x184D2204) on top of
    ``_lz4_block`` — used only when the ``lz4`` package is unavailable.
    Checksums are skipped (xxhash is not in the stdlib); sizes and
    structure are still validated."""
    if len(data) < 7 or _struct.unpack("<I", data[:4])[0] != 0x184D2204:
        raise ValueError("not an lz4 frame")
    flg = data[4]
    if (flg >> 6) != 0b01:
        raise ValueError("unsupported lz4 frame version")
    has_content_size = bool(flg & 0x08)
    has_dict_id = bool(flg & 0x01)
    block_checksum = bool(flg & 0x10)
    content_checksum = bool(flg & 0x04)
    i = 6  # FLG + BD
    if has_content_size:
        i += 8
    if has_dict_id:
        i += 4
    i += 1  # header checksum byte (not validated)
    out = bytearray()
    while True:
        if i + 4 > len(data):
            raise ValueError("truncated lz4 frame")
        (bsize,) = _struct.unpack("<I", data[i:i + 4])
        i += 4
        if bsize == 0:  # EndMark
            if content_checksum:
                i += 4
            break
        uncompressed = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        block = data[i:i + bsize]
        i += bsize
        if block_checksum:
            i += 4
        if uncompressed:
            out += block
        else:
            _lz4_block(block, out)
    return bytes(out)


def decompress_bytes(data: bytes, codec: str, member: str | None = None) -> bytes:
    """One fetched payload → decompressed bytes. codec: xz|lzma|zip|gz|bz2|
    lz4. For zip, ``member`` picks the archive entry (default: the first
    file entry — tranco's top-1m.csv / maxmind's CSVs live one-per-zip)."""
    if codec in ("xz", "lzma"):
        import lzma

        return lzma.decompress(data)
    if codec == "zip":
        import io
        import zipfile

        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            names = [n for n in zf.namelist() if not n.endswith("/")]
            pick = member if member is not None else names[0]
            return zf.read(pick)
    if codec == "gz":
        import gzip

        return gzip.decompress(data)
    if codec == "bz2":
        import bz2

        return bz2.decompress(data)
    if codec == "lz4":
        try:
            import lz4.frame  # the production decoder when installed

            return lz4.frame.decompress(data)
        except ImportError:
            return lz4_frame_decompress(data)
    raise ValueError(f"unknown codec: {codec}")


def ingest_compressed(
    spark: SparkSession, paths: list[str] | str, crawler: str, codec: str,
    member: str | None = None, kind: str | None = None,
    skip_blank: bool = True, skip_header: bool = False,
    encoding: str = "utf-8",
) -> DataFrame:
    """xz/zip/lz4(/gz/bz2) files → one-span-per-line documents, decoded
    inside mapInPandas over BINARY file spans (S3's "decompress inside
    mapInPandas over binary media spans"). One task per file — matches the
    reference's per-download decompress parallelism; a 100-TB ingest is
    many files, hence many tasks. ``kind`` adds the two-span tagged shape
    (span 0 = kind, span 1 = line) used by multi-file crawlers."""
    from .schema import DOCUMENTS_SCHEMA

    if isinstance(paths, str):
        paths = [paths]

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                text = decompress_bytes(bytes(content), codec, member).decode(
                    encoding, errors="replace"
                )
                file_tag = hashlib.sha256(path.encode()).hexdigest()[:12]
                seq = 0
                for line in text.splitlines():
                    seq += 1
                    if skip_header and seq == 1:
                        continue
                    if skip_blank and not line.strip():
                        continue
                    spans = []
                    off = 0
                    if kind is not None:
                        spans.append({"kind": "text", "text": kind,
                                      "media_ref": None, "offset": off})
                        off += 1
                    spans.append({"kind": "text", "text": line,
                                  "media_ref": None, "offset": off})
                    rows.append({
                        "doc_id": f"{crawler}/{file_tag}/{seq:06d}",
                        "spans": spans,
                        "crawler": crawler,
                    })
            yield pd.DataFrame(rows, columns=["doc_id", "spans", "crawler"])

    files = spark.read.format("binaryFile").load(paths).select("path", "content")
    return files.mapInPandas(decode, DOCUMENTS_SCHEMA)


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
