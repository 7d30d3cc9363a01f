"""caida.ixs + caida.ix_asns — CAIDA's IXP dataset, linked through two
levels of EXTERNAL_ID indirection.

Reference: iyp/crawlers/caida/ixs.py:56-204 and caida/ix_asns.py:55-91.
This pair is the canonical J2 *fallback-create-on-miss* expression
(ixs.py:137-146): an ix record whose ``pdb_id`` resolves through the
PeeringdbIXID EXTERNAL_ID edges reuses that IXP node; one that doesn't
creates a NEW IXP keyed by the CAIDA name. In Spark that is one left
broadcast join + ``coalesce(resolved_key, own_name)`` — no driver round
trip, and the "create" is just the ordinary node upsert of the unmatched
slice.

Schema quirks handled declaratively instead of per-line isinstance checks
(ixs.py:85-113):

- ``country`` / ``url`` are scalar-or-list JSON. ``get_json_object`` keeps
  the raw JSON text; ``from_json(..., array<string>)`` succeeds only for
  the list form, so ``coalesce(array_form, array(scalar_form))`` normalizes
  both to an array before one explode.
- country values go through iso3166 (``cc_convert.get``, accepts
  alpha2/alpha3/name): a broadcast token→alpha2 dimension built from the
  embedded ISO table; unmatched tokens drop (the reference warns + skips).
- ``prefixes`` is ``{af: [prefix...]}`` → ``map_values`` + flatten + one
  explode, canonicalized by the shared Arrow ``compress_prefix``.

``#``-prefixed metadata lines (modification-date comments, ixs.py:72-74)
are filtered out before parsing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..canon import compress_prefix
from ..data_iso3166 import COUNTRIES
from ..framework import SparkCrawler

IXS_SCHEMA = T.StructType([
    T.StructField("ix_id", T.LongType()),
    T.StructField("pdb_id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("prefixes", T.MapType(T.StringType(), T.ArrayType(T.StringType()))),
])


def iso3166_tokens(spark) -> DataFrame:
    """token (upper alpha2 | alpha3 | English name) → alpha2; the broadcast
    stand-in for iso3166 ``countries.get`` (ixs.py:92-103)."""
    rows = []
    for a2, (a3, name) in COUNTRIES.items():
        rows += [(a2, a2), (a3, a2), (name.upper(), a2)]
    return spark.createDataFrame(rows, "cc_token string, alpha2 string")


def scalar_or_list(line: F.Column, field: str) -> F.Column:
    """Normalize a scalar-or-list JSON field to array<string>
    (ixs.py:85-113's isinstance ladder)."""
    raw = F.get_json_object(line, f"$.{field}")
    as_arr = F.from_json(raw, "array<string>")
    return F.when(raw.isNull(), F.array().cast("array<string>")).otherwise(
        F.coalesce(as_arr, F.array(raw))
    )


class CaidaIxs(SparkCrawler):
    ORG = "CAIDA"
    URL = "https://publicdata.caida.org/datasets/ixps/"
    NAME = "caida.ixs"
    EXPECTED_PREDS = ["EXTERNAL_ID", "NAME", "COUNTRY", "WEBSITE", "MANAGED_BY"]
    NEEDS_EXISTING = True
    WAVE = 3  # reads PeeringdbIXID edges written by peeringdb.ix (wave 2)

    def _pdb_extid_map(self) -> DataFrame:
        """pdb extid → IXP key via the EXTERNAL_ID edges
        (batch_get_node_extid('PeeringdbIXID'), ixs.py:122)."""
        return (
            self.store.read_triples()
            .filter((F.col("pred") == "EXTERNAL_ID")
                    & (F.col("obj_label") == "PeeringdbIXID"))
            .select(
                F.col("obj_key").try_cast("long").alias("pdb_extid"),
                F.col("subj_key").alias("pdb_ixp"),
            )
            .dropDuplicates(["pdb_extid"])
        )

    def transform(self, docs: DataFrame):
        line = self.text_span(0)
        raw = (
            docs.filter(~F.trim(line).startswith("#"))
            .select(
                F.from_json(line, IXS_SCHEMA).alias("r"),
                scalar_or_list(line, "country").alias("countries"),
                scalar_or_list(line, "url").alias("urls"),
            )
            .select("r.*", "countries", "urls")
            .filter(F.col("name").isNotNull() & F.col("ix_id").isNotNull())
        )
        # fallback-create-on-miss (ixs.py:137-146): resolved pdb_id → reuse
        # that IXP key; otherwise the CAIDA name IS the new IXP's key
        ix = self.m(
            raw.join(F.broadcast(self._pdb_extid_map()),
                     raw.pdb_id == F.col("pdb_extid"), "left")
            .withColumn("ixp", F.coalesce(F.col("pdb_ixp"), F.col("name")))
        )
        created = ix.filter(F.col("pdb_ixp").isNull())  # the get_node() slice

        cc = (
            ix.select("ixp", F.explode("countries").alias("cc_raw"))
            .withColumn("cc_token", F.upper(F.trim("cc_raw")))
            .join(F.broadcast(iso3166_tokens(self.spark)), "cc_token")
            .dropDuplicates(["ixp", "alpha2"])
        )
        urls = ix.select("ixp", F.explode("urls").alias("url"))
        prefixes = (
            ix.select("ixp", F.explode(F.flatten(F.map_values("prefixes"))).alias("p"))
            .withColumn("prefix", compress_prefix(F.col("p")))
            .filter(F.col("prefix").isNotNull())
        )

        nodes = [
            self.make_nodes(created, "IXP", "ixp"),
            self.make_nodes(ix, "CaidaIXID", "ix_id"),
            self.make_nodes(ix, "Name", "name"),
            self.make_nodes(cc, "Country", "alpha2"),
            self.make_nodes(urls, "URL", "url"),
            self.make_nodes(prefixes, "PeeringLAN", "prefix",
                            extra_labels=["Prefix"]),
        ]
        triples = [
            self.make_triples(ix, "EXTERNAL_ID", "IXP", "ixp", "CaidaIXID", "ix_id"),
            self.make_triples(ix, "NAME", "IXP", "ixp", "Name", "name"),
            self.make_triples(cc, "COUNTRY", "IXP", "ixp", "Country", "alpha2"),
            self.make_triples(urls, "WEBSITE", "IXP", "ixp", "URL", "url"),
            self.make_triples(prefixes, "MANAGED_BY", "PeeringLAN", "prefix",
                              "IXP", "ixp"),
        ]
        return nodes, triples


class CaidaIxAsns(SparkCrawler):
    """caida.ix_asns — IXP memberships through the CaidaIXID indirection
    (ix_asns.py:55-91). Unlike ixs there is no fallback: an ix_id with no
    CaidaIXID edge drops (the file pair is internally consistent; the
    reference would pass a null endpoint). The flatdict props map carries
    the whole record (asn, ix_id)."""

    ORG = "CAIDA"
    URL = "https://publicdata.caida.org/datasets/ixps/"
    NAME = "caida.ix_asns"
    EXPECTED_PREDS = ["MEMBER_OF"]
    NEEDS_EXISTING = True
    WAVE = 4  # reads CaidaIXID edges written by caida.ixs (wave 3)

    def _caida_extid_map(self) -> DataFrame:
        return (
            self.store.read_triples()
            .filter((F.col("pred") == "EXTERNAL_ID")
                    & (F.col("obj_label") == "CaidaIXID"))
            .select(
                F.col("obj_key").try_cast("long").alias("caida_extid"),
                F.col("subj_key").alias("ixp"),
            )
            .dropDuplicates(["caida_extid"])
        )

    def transform(self, docs: DataFrame):
        line = self.text_span(0)
        raw = (
            docs.filter(~F.trim(line).startswith("#"))
            .select(F.from_json(line, "ix_id long, asn long").alias("r"))
            .select("r.*")
            .filter(F.col("asn").isNotNull() & F.col("ix_id").isNotNull())
        )
        mem = self.m(
            raw.join(F.broadcast(self._caida_extid_map()),
                     raw.ix_id == F.col("caida_extid"))
            .withColumn(
                "flat_mem",
                F.create_map(
                    F.lit("asn"), F.col("asn").cast("string"),
                    F.lit("ix_id"), F.col("ix_id").cast("string"),
                ),
            )
        )
        nodes = [self.make_nodes(mem, "AS", "asn")]
        triples = [
            self.make_triples(mem, "MEMBER_OF", "AS", "asn", "IXP", "ixp",
                              props_col=F.col("flat_mem")),
        ]
        return nodes, triples
