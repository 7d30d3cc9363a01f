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
