"""Temporal joins Spark lacks as built-ins, composed from DataFrame ops.

As-of join (``merge_asof`` / kdb ``aj`` / DuckDB ``ASOF JOIN``): for every
left row, the single right row with the greatest right timestamp ≤ the
left timestamp, per key. Spark has no native as-of join; the naive
range-join formulation (``l.k = r.k AND r.ts <= l.ts`` + a max-per-row
window) explodes to O(|matches|) intermediate rows — at 100 TB a
months-long event table makes that quadratic-ish per key.

Here it is the classic union-sort formulation instead:

1. tag left and right rows and union them (no join at all);
2. one shuffle: partition by key, sort by (ts, side) — right rows sort
   BEFORE left rows at equal ts, giving ``<=`` semantics;
3. ``last(right_col, ignorenulls=True)`` over the running window carries
   each right row's values forward to the left rows that follow it.

Cost: ONE shuffle of |L|+|R| rows (same as any join on the key), zero
row amplification, whole-stage codegen throughout — the plan a
sort-merge as-of would produce if Spark had one. Skewed keys behave like
any single-column shuffle (AQE skew splitting applies; the window is a
running frame, so within-partition cost is linear).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_L, _R = 1, 0  # sort order at equal ts: right (0) before left (1) → "<="


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``right_values`` from the
    latest ``right`` row of the same key with ``right_ts <= left_ts``
    (null when no such row — LEFT semantics).

    ``right`` should be unique per (key, ts) for a deterministic result
    (dedupe upstream, e.g. ``max_by`` per key+ts); with duplicates the
    union-sort keeps the last in partition sort order, which is
    tie-ambiguous exactly like DuckDB's ASOF JOIN.
    """
    l_cols = left.columns
    l_tag = left.select(
        F.col(left_on).alias("_k"),
        F.col(left_ts).cast("timestamp").alias("_t"),
        F.lit(_L).alias("_side"),
        *[F.col(c) for c in l_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c + suffix)
          for c in right_values],
    )
    r_tag = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_ts).cast("timestamp").alias("_t"),
        F.lit(_R).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols],
        *[F.col(c).alias(c + suffix) for c in right_values],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l_tag.unionByName(r_tag).select(
        "_side",
        *[F.col(c) for c in l_cols],
        *[F.last(c + suffix, ignorenulls=True).over(w).alias(c + suffix)
          for c in right_values],
    )
    return carried.filter(F.col("_side") == _L).drop("_side")
