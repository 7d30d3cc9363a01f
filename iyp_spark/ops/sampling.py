"""Deterministic sampling operators for corpus mixing.

A training-data pipeline downsamples over-represented strata (language,
source, domain) to a target mixture. Random sampling is not reproducible
across runs/engines, so these operators rank within each stratum by a
content-independent deterministic hash (md5 of the doc id — identical
output in Spark and DuckDB, so every sample is oracle-checkable) and keep
a rank prefix. Re-running the job, on any engine, picks the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_balanced_sample(
    docs: DataFrame, strata_col: str = "lang", id_col: str = "doc_id"
) -> DataFrame:
    """Balanced per-stratum downsample: every stratum keeps exactly
    min-stratum-count rows, chosen by deterministic md5 rank — the
    equal-mixture special case of stratified sampling (rate_i = min_n /
    n_i). Returns (id_col, strata_col, rn) for the kept rows.

    Scale: one groupBy over the corpus for stratum counts (map-side
    combinable, |strata| result rows), one unpartitioned window over
    those |strata| rows for the global min (trivial), one rank window
    partitioned by stratum over the corpus — the stratum count is small
    and fixed, so skew within the rank window is the corpus's own
    stratum skew; at 10^12 docs swap row_number for a two-pass
    hash-threshold filter (keep md5 < n_keep/n_i quantile) to avoid
    single-reducer-per-stratum ranking. That refinement changes WHICH
    rows are kept, not the mixture, so it is a scale knob, not a
    semantics change.
    """
    counts = docs.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n"))
    counts = counts.withColumn(
        "min_n", F.min("n").over(Window.partitionBy())
    ).select(strata_col, "min_n")
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    ranked = docs.select(id_col, strata_col).withColumn(
        "rn", F.row_number().over(w)
    )
    return (
        ranked.join(F.broadcast(counts), strata_col)
        .filter(F.col("rn") <= F.col("min_n"))
        .select(id_col, strata_col, "rn")
    )
