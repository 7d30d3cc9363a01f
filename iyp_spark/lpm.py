"""Longest-prefix-match machinery shared by post/ip2prefix (IP→prefix and
prefix→covering-prefix trees, ref iyp/post/ip2prefix.py:25-108) and the
alice_lg crawler (member IP → PeeringLAN, ref
iyp/crawlers/alice_lg/__init__.py:344-369).

The reference builds a radix tree on the driver; at 10^12-document scale the
probe side doesn't fit one machine, so the tree becomes a join:

- every prefix gets fixed-width hex [start, end] bounds (canon.prefix_bounds)
  plus a coarse BUCKET — the top 8 bits for v4, the first hextet for v6;
- FINE prefixes (prefixlen >= bucket width) sit in exactly ONE bucket, so
  probe→prefix candidate generation is an EQUI-join on (af, bucket) with the
  range containment as a residual filter — shuffle-partitionable, never
  cartesian;
- COARSE prefixes (shorter than the bucket width: ::/0, v4 /7s, huge RIR
  blocks) are a provably tiny dimension — at most 2^8 (v4) / 2^16 (v6)
  DISTINCT networks exist that short — so they broadcast-range-join against
  the probes directly. No bucket explosion: the old design exploded a short
  prefix into every bucket it spans (a ::/0 row would emit 65,536 copies);
  the fine/coarse split removes the explode entirely.

Most-specific selection (search_best) stays with the caller: a row_number
window ordered by prefixlen desc over whatever grouping the caller needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .canon import ip_to_hex, prefix_bounds

V4_BUCKET_BITS = 8   # bucket = top octet  → 2 hex chars
V6_BUCKET_BITS = 16  # bucket = first hextet → 4 hex chars


def _bucket_chars(af_col: F.Column) -> F.Column:
    return F.when(af_col == 4, F.lit(V4_BUCKET_BITS // 4)).otherwise(
        F.lit(V6_BUCKET_BITS // 4)
    )


def prefix_intervals(df: DataFrame, prefix_col: str = "prefix") -> DataFrame:
    """Add (start, end, prefixlen, af, bucket, is_coarse) to a prefix table.

    ``bucket`` is the hex-string prefix of ``start`` (2 chars v4, 4 chars
    v6); null for coarse prefixes (they don't participate in the equi-join).
    Malformed prefixes (bounds null) are dropped, mirroring the reference's
    radix.add ValueError skip.
    """
    b = df.withColumn("_b", prefix_bounds(F.col(prefix_col))).select(
        "*",
        F.col("_b.start").alias("start"),
        F.col("_b.end").alias("end"),
        F.col("_b.prefixlen").alias("prefixlen"),
        F.col("_b.af").alias("af"),
    ).drop("_b").filter(F.col("start").isNotNull())
    is_coarse = F.when(F.col("af") == 4, F.col("prefixlen") < V4_BUCKET_BITS).otherwise(
        F.col("prefixlen") < V6_BUCKET_BITS
    )
    return b.withColumn("is_coarse", is_coarse).withColumn(
        "bucket",
        F.when(
            ~F.col("is_coarse"),
            F.substring(F.col("start"), F.lit(1), _bucket_chars(F.col("af"))),
        ),
    )


def probe_hex(df: DataFrame, ip_col: str) -> DataFrame:
    """Add (probe_hex, probe_af, probe_bucket) for an IP-address probe column."""
    out = df.withColumn("probe_hex", ip_to_hex(F.col(ip_col)))
    out = out.filter(F.col("probe_hex").isNotNull())
    out = out.withColumn(
        "probe_af", F.when(F.col(ip_col).contains(":"), F.lit(6)).otherwise(F.lit(4))
    )
    return out.withColumn(
        "probe_bucket",
        F.substring(F.col("probe_hex"), F.lit(1), _bucket_chars(F.col("probe_af"))),
    )


def lpm_candidates(probes: DataFrame, intervals: DataFrame) -> DataFrame:
    """All (probe, covering prefix) candidate pairs.

    ``probes`` must carry probe_hex/probe_af/probe_bucket (see probe_hex);
    ``intervals`` must come from prefix_intervals. Returns probes' columns +
    intervals' columns. The caller picks most-specific with a window.
    """
    fine = intervals.filter(~F.col("is_coarse"))
    coarse = intervals.filter(F.col("is_coarse")).drop("bucket")
    cand_fine = probes.join(
        fine,
        (probes.probe_af == fine.af)
        & (probes.probe_bucket == fine.bucket)
        & (probes.probe_hex >= fine.start)
        & (probes.probe_hex <= fine.end),
    ).drop("bucket")
    # coarse side: tiny by construction (< 2^16 distinct networks possible)
    cand_coarse = probes.join(
        F.broadcast(coarse),
        (probes.probe_af == coarse.af)
        & (probes.probe_hex >= coarse.start)
        & (probes.probe_hex <= coarse.end),
    )
    return cand_fine.unionByName(cand_coarse)
