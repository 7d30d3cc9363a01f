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


def sqrt_mixture_sample(
    docs: DataFrame, strata_col: str = "lang", id_col: str = "doc_id"
) -> DataFrame:
    """Temperature-0.5 mixture downsample: stratum i keeps quota_i =
    floor(sqrt(n_i * min_n)) rows — the geometric mean of the proportional
    mixture (keep everything, quota n_i) and the balanced mixture (quota
    min_n), i.e. the alpha=0.5 point of the p_i^alpha temperature-scaled
    sampling multilingual/multi-source training runs use to boost
    under-represented strata without flattening the head entirely.
    Row choice within a stratum is the same deterministic md5 rank as
    ``stratified_balanced_sample`` (reproducible across runs and engines).
    Returns (id_col, strata_col, rn, quota) for the kept rows.

    Engine-portability: n_i * min_n is exact in a double up to 2^53 and
    IEEE-754 sqrt is correctly rounded, so floor(sqrt(...)) is identical
    in Spark and DuckDB. Beyond 2^53 (only if the LARGEST stratum times
    the smallest exceeds 9e15) switch both sides to DECIMAL sqrt.

    Scale: identical shape to the balanced sampler — one map-side
    combinable stratum count, one broadcast of |strata| quota rows, one
    rank window per stratum (swap for the two-pass hash-threshold filter
    at 10^12 rows; that knob changes WHICH rows are kept, not the
    mixture)."""
    counts = docs.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n"))
    counts = counts.withColumn(
        "min_n", F.min("n").over(Window.partitionBy())
    ).select(
        strata_col,
        F.floor(F.sqrt(F.col("n") * F.col("min_n"))).cast("long").alias("quota"),
    )
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    ranked = docs.select(id_col, strata_col).withColumn(
        "rn", F.row_number().over(w)
    )
    return (
        ranked.join(F.broadcast(counts), strata_col)
        .filter(F.col("rn") <= F.col("quota"))
        .select(id_col, strata_col, "rn", "quota")
    )
