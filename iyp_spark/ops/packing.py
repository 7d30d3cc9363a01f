"""Sequence packing — assembling documents into fixed-token-budget
training sequences, the last step between a filtered/dedup'd corpus and
the trainer's data loader.

Semantics: concat-then-chunk at document granularity (the GPT-style
packing discipline). Documents stream in a deterministic order within a
pack partition (source here; shard/domain in production); each document
is assigned to the sequence whose window its START offset falls in:

    seq_id = floor(cumulative_tokens_before_doc / budget)

This is one running-sum window per pack partition — no driver loop, no
UDF — and it is deterministic across runs and engines, so it is
oracle-checkable.

Scale: the window partitions by the pack key, so parallelism = number of
shards (at 10^12 docs you pack per shard/file-group, thousands of
independent partitions — exactly how loaders shard anyway). The running
sum is a single Exchange on the pack key; everything else is map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens_col


def pack_sequences(
    docs: DataFrame,
    budget: int = 256,
    pack_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """(pack_col, id_col, n_tokens, seq_id): each document mapped to its
    training-sequence number under a fixed token budget per sequence,
    packed in deterministic id order within each pack partition."""
    d = docs.select(id_col, pack_col, F.size(tokens_col()).alias("n_tokens"))
    w = (
        Window.partitionBy(pack_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = d.withColumn("cum", F.sum("n_tokens").over(w))
    return cum.select(
        pack_col,
        id_col,
        "n_tokens",
        F.floor((F.col("cum") - F.col("n_tokens")) / budget)
        .cast("long")
        .alias("seq_id"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping fixed-size chunking — the OTHER training-sequence
    discipline (long-context / retrieval corpora): each document is split
    into windows of ``chunk`` tokens starting every ``stride`` tokens
    (overlap = chunk - stride), the last window short if the tail doesn't
    fill. Chunk count for an n-token doc:

        K = 1                                if n <= chunk
            (n - chunk + stride - 1) div stride + 1   otherwise

    (integer arithmetic only — engine-portable). Empty docs emit nothing.

    Returns (id_col, chunk_idx, start_tok [1-based], n_chunk_tokens,
    chunk_text) — chunk_text re-joined with single spaces, which together
    with ``start_tok`` preserves span-order fidelity of the tokenization.

    Scale: the chunk index is exploded map-side from an in-row sequence
    (no shuffle at all — pure whole-stage-codegen projection of the
    corpus scan); output row count is sum(K_i), linear in corpus tokens.
    """
    if stride <= 0 or chunk <= 0:
        raise ValueError("chunk and stride must be positive")
    d = docs.select(id_col, tokens_col().alias("toks")).filter(
        F.size("toks") >= 1
    )
    k = F.when(F.size("toks") <= chunk, F.lit(1)).otherwise(
        F.expr(f"CAST((size(toks) - {chunk} + {stride} - 1) DIV {stride} AS INT) + 1")
    )
    d = d.withColumn("ci", F.explode(F.sequence(F.lit(0), k - 1)))
    piece = F.slice("toks", F.col("ci") * stride + 1, chunk)
    return d.select(
        id_col,
        F.col("ci").cast("int").alias("chunk_idx"),
        (F.col("ci") * stride + 1).cast("int").alias("start_tok"),
        F.size(piece).cast("int").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
