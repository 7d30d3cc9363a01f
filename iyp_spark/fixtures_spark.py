"""Distributed corpus synthesizer — the bench-scale counterpart of
fixtures.py. Generates interleaved-span documents of the same schema and
statistical shape (Zipf-hot ASNs, ~2% malformed prefixes, mixed v4/v6,
media spans) entirely inside Spark, so corpora of tens of millions of
documents materialize in seconds across all cores.

Determinism comes from xxhash64(seq, salt) — no RNG, no Date.now —
so the same (crawler, n) always produces the same corpus. Content is NOT
row-identical to fixtures.py (correctness tests use the Python generator;
this one exists for throughput/scaling runs where volume matters).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fixtures import MALFORMED_PREFIXES, COUNTRIES, ORG_WORDS, asn_pool, prefix_pool


def _u(salt: str) -> F.Column:
    """Deterministic uniform [0,1) from the row's seq."""
    return (F.pmod(F.xxhash64(F.col("seq"), F.lit(salt)), F.lit(1_000_000))
            / F.lit(1_000_000.0))


def _pick(pool: list, salt: str) -> F.Column:
    arr = F.array(*[F.lit(x) for x in pool])
    return F.element_at(arr, (F.pmod(F.xxhash64(F.col("seq"), F.lit(salt)),
                                     F.lit(len(pool))) + 1).cast("int"))


def _zipf_asn(salt: str) -> F.Column:
    """Zipf-ish skewed pick from the 200-ASN pool: index = floor(200·u³),
    heavily favoring low indices (the hot-ASN skew the north star names)."""
    pool = asn_pool()
    arr = F.array(*[F.lit(x) for x in pool])
    idx = F.floor(F.pow(_u(salt), F.lit(3.0)) * len(pool)).cast("int") + 1
    return F.element_at(arr, idx)


def _span(offset: int, text: F.Column | None, media: F.Column | None) -> F.Column:
    return F.struct(
        (F.lit("text") if media is None else F.lit("media")).alias("kind"),
        (text if text is not None else F.lit(None).cast("string")).alias("text"),
        (media if media is not None else F.lit(None).cast("string")).alias("media_ref"),
        F.lit(offset).alias("offset"),
    )


def _base(spark: SparkSession, name: str, n: int) -> DataFrame:
    return (
        spark.range(n).withColumnRenamed("id", "seq")
        .withColumn("crawler", F.lit(name))
        .withColumn(
            "doc_id", F.concat(F.lit(name + "/"), F.lpad(F.col("seq"), 8, "0"))
        )
    )


def gen_pfx2asn(spark: SparkSession, n: int) -> DataFrame:
    name = "bgpkit.pfx2asn"
    pfx = F.when(_u("mal") < 0.02, _pick(MALFORMED_PREFIXES, "malpick")).otherwise(
        _pick(prefix_pool(), "pfx")
    )
    asn = _zipf_asn("asn").cast("string")
    return _base(spark, name, n).select(
        "doc_id", F.array(_span(0, pfx, None), _span(1, asn, None)).alias("spans"),
        "crawler",
    )


def gen_as_names(spark: SparkSession, n: int) -> DataFrame:
    name = "ripe.as_names"
    org = F.concat(
        _pick(ORG_WORDS, "w1"), _pick(ORG_WORDS, "w2"), F.lit(" "),
        _pick(["Inc", "LLC", "GmbH", "SA", "Ltd"], "suf"),
    )
    cc = F.upper(_pick(COUNTRIES, "cc"))
    asn = _pick(asn_pool(), "asn").cast("string")
    line = F.when(_u("bad") < 0.03, F.concat(asn, F.lit(" "))).otherwise(
        F.concat(asn, F.lit(" "), org, F.lit(", "), cc)
    )
    return _base(spark, name, n).select(
        "doc_id", F.array(_span(0, line, None)).alias("spans"), "crawler"
    )


def gen_asrank(spark: SparkSession, n: int) -> DataFrame:
    name = "caida.asrank"
    asn = _pick(asn_pool(), "asn")
    rec = F.to_json(
        F.struct(
            asn.cast("string").alias("asn"),
            F.concat(_pick(ORG_WORDS, "n1"), _pick(ORG_WORDS, "n2")).alias("asnName"),
            (F.col("seq") + 1).cast("int").alias("rank"),
            F.struct(F.upper(_pick(COUNTRIES, "cc")).alias("iso")).alias("country"),
            (F.round(_u("lat") * 130 - 60, 4)).alias("latitude"),
            (F.round(_u("lon") * 360 - 180, 4)).alias("longitude"),
        )
    )
    return _base(spark, name, n).select(
        "doc_id",
        F.array(
            _span(0, rec, None),
            _span(1, None, F.concat(F.lit("blob://logo/"), asn.cast("string"))),
        ).alias("spans"),
        "crawler",
    )


def gen_as2rel(spark: SparkSession, n: int) -> DataFrame:
    name = "bgpkit.as2rel_v4"
    rec = F.to_json(
        F.struct(
            _zipf_asn("a1").alias("asn1"),
            _zipf_asn("a2").alias("asn2"),
            F.pmod(F.xxhash64("seq", F.lit("rel")), F.lit(2)).cast("int").alias("rel"),
            (F.pmod(F.xxhash64("seq", F.lit("pc")), F.lit(500)) + 1)
            .cast("int").alias("peers_count"),
        )
    )
    return _base(spark, name, n).select(
        "doc_id", F.array(_span(0, rec, None)).alias("spans"), "crawler"
    )


def generate_corpus(spark: SparkSession, scale: float) -> DataFrame:
    """Same per-crawler proportions as fixtures.all_docs(scale)."""
    parts = [
        gen_pfx2asn(spark, int(1000 * scale)),
        gen_as_names(spark, int(800 * scale)),
        gen_asrank(spark, int(400 * scale)),
        gen_as2rel(spark, int(600 * scale)),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
