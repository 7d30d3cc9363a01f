"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode step is a STUB (no image/audio libs in this container): it
derives deterministic fake metadata from the payload bytes, clearly marked.
Everything around it — binary column handling, output schema, Arrow batch
iteration, partition-preserving shape — is real and tested; swapping in a
real decoder (PIL/ffmpeg) changes only `_decode_payload`.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("byte_len", T.IntegerType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("n_frames", T.IntegerType(), False),
])


def _decode_payload(payload: bytes) -> tuple[int, int, int, int]:
    """STUB decoder — deterministic fake: real implementation would call an
    image/video library here. Raises nothing, returns metadata derived from
    byte length so the pipeline is end-to-end testable."""
    n = len(payload)
    return n, n % 640, (n * 7) % 480, n % 30 + 1


def decode_media(docs_with_payload: DataFrame) -> DataFrame:
    """(doc_id, payload binary) → decoded metadata via mapInPandas.

    The Arrow batch shape here is the real contract: payloads arrive as
    pyarrow binary arrays in pandas batches, outputs must match
    DECODED_SCHEMA exactly — this is what a real decode stage looks like.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_decode_payload(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                meta, columns=["byte_len", "width", "height", "n_frames"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return docs_with_payload.mapInPandas(decode, DECODED_SCHEMA)


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Treat document text bytes as an opaque media payload (the test
    corpus has no real blobs; the KG fixture corpus carries blob:// refs)."""
    return docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
