"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode step parses REAL container headers where the format is
self-describing with the stdlib alone — PNG IHDR and JPEG SOF dimensions
via ``struct`` — and falls back to a clearly-marked deterministic stub for
payloads that aren't recognized images (no pixel libs in this container).
Everything around it — binary column handling, output schema, Arrow batch
iteration, partition-preserving shape — is real and tested; swapping in a
full decoder (PIL/ffmpeg) changes only `_decode_payload`.
"""

from __future__ import annotations

import struct
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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# JPEG standalone markers (no length word follows): TEM, RSTn, SOI, EOI
_JPEG_STANDALONE = {0x01, *range(0xD0, 0xDA)}
# SOF markers carry dimensions; 0xC4 (DHT), 0xC8 (JPG ext), 0xCC (DAC) don't
_JPEG_SOF = set(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _png_dims(payload: bytes) -> tuple[int, int] | None:
    """Real PNG header parse: the IHDR chunk is mandatory-first (RFC 2083
    §4.1.1), so width/height are the two big-endian u32s at bytes 16..24."""
    if len(payload) < 24 or not payload.startswith(_PNG_MAGIC):
        return None
    if payload[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", payload[16:24])
    return (w, h) if w > 0 and h > 0 else None


def _jpeg_dims(payload: bytes) -> tuple[int, int] | None:
    """Real JPEG header parse: walk the marker segments from SOI until a
    SOF marker, whose segment body is (precision u8, height u16be,
    width u16be) — ITU T.81 §B.2.2. Returns None on any malformed walk."""
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(payload)
    while i + 1 < n:
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte padding before a marker
            i += 1
            continue
        if marker in _JPEG_STANDALONE:
            i += 2
            continue
        if i + 4 > n:
            return None
        (seg_len,) = struct.unpack(">H", payload[i + 2:i + 4])
        if seg_len < 2:
            return None
        if marker in _JPEG_SOF:
            if i + 9 > n:
                return None
            h, w = struct.unpack(">HH", payload[i + 5:i + 9])
            return (w, h) if w > 0 and h > 0 else None
        i += 2 + seg_len
    return None


def _decode_payload(payload: bytes) -> tuple[int, int, int, int]:
    """Decode media metadata with the stdlib alone: true width/height from
    PNG IHDR / JPEG SOF headers when the magic bytes match (single-frame →
    n_frames=1); otherwise a deterministic STUB derived from byte length —
    a full pixel/video decoder (PIL/ffmpeg) would replace only the
    fallback. Raises nothing, so the pipeline is end-to-end testable."""
    n = len(payload)
    dims = _png_dims(payload) or _jpeg_dims(payload)
    if dims is not None:
        return n, dims[0], dims[1], 1
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


FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("features", T.ArrayType(T.DoubleType(), False), False),
])


def extract_features(docs_with_payload: DataFrame, dim: int = 8) -> DataFrame:
    """(doc_id, payload binary) → fixed-``dim`` feature vector, the stage a
    real pipeline runs a vision/audio encoder in (CLIP, wav2vec, ...).

    The encoder is a STUB (deterministic modular projection of the byte
    length — exact in double, so the DuckDB oracle matches bitwise); the
    plumbing is real: Arrow batches in, a numpy (batch × dim) matrix built
    vectorized per batch, fixed-width ``array<double>`` out. The output
    column is drop-in compatible with ops.similarity / ops.dedup embedding
    inputs, so fake features flow through the real ANN / near-dup path.

    Scale path: embarrassingly parallel map, no shuffle; batch size bounds
    peak memory (dim doubles per row); a real GPU encoder slots into the
    same mapInPandas contract with spark.task.resource.gpu.amount set.
    """
    import numpy as np

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        coef = np.arange(dim) * 2 + 3  # (dim,)
        for pdf in batches:
            if not len(pdf):
                continue
            lens = pdf["payload"].map(len).to_numpy()[:, None]  # (n,1)
            feats = (lens * coef[None, :]) % 997 / 1000.0  # (n,dim) exact
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "features": list(feats),
            })

    return docs_with_payload.mapInPandas(encode, FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("src_w", T.IntegerType(), False),
    T.StructField("src_h", T.IntegerType(), False),
    T.StructField("out_w", T.IntegerType(), False),
    T.StructField("out_h", T.IntegerType(), False),
    T.StructField("scale_1000", T.IntegerType(), False),
])


def resize_media(docs_with_payload: DataFrame,
                 max_w: int = 224, max_h: int = 224) -> DataFrame:
    """Aspect-preserving fit-to-box resize metadata: decode dims (stub),
    compute the integer scale that fits (src_w, src_h) inside
    (max_w, max_h) without upscaling, emit output dims.

    All-integer math (scale in 1/1000ths, floor at each step) so the
    DuckDB oracle is exact. A real implementation resamples pixels in the
    same mapInPandas pass and emits a binary column alongside — the
    schema/batch contract here is that stage minus the pixel work.

    Scale path: pure map, no shuffle; output is O(1) per row.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            lens = pdf["payload"].map(len).to_numpy()
            # stub decode dims, clamped to ≥1 (a 0-dim image is undecodable)
            src_w = np.maximum(lens % 640, 1).astype("int64")
            src_h = np.maximum((lens * 7) % 480, 1).astype("int64")
            scale = np.minimum(
                np.minimum(1000 * max_w // src_w, 1000 * max_h // src_h),
                1000,
            )
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "src_w": src_w.astype("int32"),
                "src_h": src_h.astype("int32"),
                "out_w": np.maximum(src_w * scale // 1000, 1).astype("int32"),
                "out_h": np.maximum(src_h * scale // 1000, 1).astype("int32"),
                "scale_1000": scale.astype("int32"),
            })

    return docs_with_payload.mapInPandas(resize, RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame_ms", T.IntegerType(), False),
])


def sample_frames(docs_with_payload: DataFrame, every: int = 5) -> DataFrame:
    """Video frame sampling: one output row per kept frame (every
    ``every``-th frame of the stub-decoded ``n_frames``), with its
    timestamp at 25 fps. Variable-cardinality mapInPandas output — the
    shape a real ffmpeg keyframe extractor has (rows out ≠ rows in),
    built with numpy repeat/cumcount, not a per-row Python loop.

    Scale path: map-only fan-out; output cardinality is bounded by
    n_frames/every per doc, no shuffle until a downstream consumer
    aggregates.
    """
    import numpy as np

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            lens = pdf["payload"].map(len).to_numpy()
            n_frames = lens % 30 + 1
            n_kept = (n_frames + every - 1) // every  # ceil(n/every)
            doc_ids = np.repeat(pdf["doc_id"].to_numpy(), n_kept)
            # per-doc 0,1,2,... then scaled by `every`
            offsets = np.arange(n_kept.sum()) - np.repeat(
                np.concatenate(([0], np.cumsum(n_kept)[:-1])), n_kept)
            frame_idx = (offsets * every).astype("int32")
            yield pd.DataFrame({
                "doc_id": doc_ids,
                "frame_idx": frame_idx,
                "frame_ms": frame_idx * 40,
            })

    return docs_with_payload.mapInPandas(sample, FRAMES_SCHEMA)


AUDIO_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("container", T.StringType(), False),
    T.StructField("n_channels", T.IntegerType(), False),
    T.StructField("sample_rate_hz", T.IntegerType(), False),
    T.StructField("bits_per_sample", T.IntegerType(), False),
    T.StructField("n_samples", T.LongType(), False),
    T.StructField("duration_ms", T.LongType(), False),
])


def _wav_meta(payload: bytes):
    """Real WAV header parse with the stdlib alone: walk the RIFF chunk
    list (RFC 2361 / Microsoft WAVE spec) for the mandatory ``fmt `` chunk
    (channels u16le, sample rate u32le, bits-per-sample u16le at offsets
    2/4/14 of the chunk body) and the ``data`` chunk whose byte length
    gives the sample count. Returns (channels, rate, bits, n_samples) or
    None if the payload is not a well-formed PCM WAV."""
    if len(payload) < 12 or payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i, n = 12, len(payload)
    channels = rate = bits = None
    data_len = None
    while i + 8 <= n:
        cid = payload[i:i + 4]
        (clen,) = struct.unpack("<I", payload[i + 4:i + 8])
        body = payload[i + 8:i + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            channels, rate = struct.unpack("<HI", body[2:8])
            (bits,) = struct.unpack("<H", body[14:16])
        elif cid == b"data":
            data_len = clen
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if not channels or not rate or not bits or data_len is None:
        return None
    frame_bytes = channels * (bits // 8)
    if frame_bytes == 0:
        return None
    return channels, rate, bits, data_len // frame_bytes


def decode_audio(docs_with_payload: DataFrame) -> DataFrame:
    """(doc_id, payload binary) → audio metadata via mapInPandas — the
    audio twin of ``decode_media``. WAV payloads get a REAL RIFF header
    parse (stdlib struct, no media libs needed); anything else falls back
    to the same deterministic byte-length stub discipline as the image
    path (container 'stub', 1 channel, 16 kHz, 16-bit, one 'sample' per
    payload byte), so the full pipeline runs on synthetic corpora and is
    oracle-checkable, while real WAV bytes exercise the real parser.

    Scale path: embarrassingly parallel Arrow map, no shuffle; a real
    codec (soundfile/ffmpeg) replaces only the per-payload function."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                meta = _wav_meta(p)
                if meta is not None:
                    ch, rate, bits, n_samp = meta
                    out.append((doc_id, "wav", ch, rate, bits, n_samp,
                                n_samp * 1000 // rate))
                else:
                    n = len(p)
                    out.append((doc_id, "stub", 1, 16000, 16, n,
                                n * 1000 // 16000))
            yield pd.DataFrame(
                out, columns=["doc_id", "container", "n_channels",
                              "sample_rate_hz", "bits_per_sample",
                              "n_samples", "duration_ms"])

    return docs_with_payload.mapInPandas(decode, AUDIO_SCHEMA)
