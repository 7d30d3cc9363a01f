"""ripe.as_names — AS NAME + COUNTRY from the RIPE asn.txt line format.

Reference: iyp/crawlers/ripe/as_names.py:29-66 — per line:
``asn, _, name_cc = line.partition(' '); name, _, cc = name_cc.rpartition(', ')``;
skip when any part empty or len(cc) > 2.

Spark plan: pure native string expressions (no Python at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..canon import canon_cc
from ..framework import SparkCrawler


class RipeAsNames(SparkCrawler):
    ORG = "RIPE NCC"
    URL = "https://ftp.ripe.net/ripe/asnames/asn.txt"
    NAME = "ripe.as_names"
    EXPECTED_PREDS = ["NAME", "COUNTRY"]

    def transform(self, docs: DataFrame):
        line = self.text_span(0)
        parsed = docs.select(line.alias("line")).select(
            # str.partition(' '): head / tail around FIRST space
            F.when(
                F.instr("line", " ") > 0,
                F.expr("substring(line, 1, instr(line, ' ') - 1)"),
            ).otherwise(F.col("line")).alias("asn_str"),
            F.when(
                F.instr("line", " ") > 0,
                F.expr("substring(line, instr(line, ' ') + 1)"),
            ).otherwise(F.lit("")).alias("name_cc"),
        )
        parsed = parsed.select(
            "asn_str",
            # str.rpartition(', '): split around LAST ', '; no sep → name=''
            F.when(
                F.col("name_cc").contains(", "),
                F.expr(
                    "substring(name_cc, 1, length(name_cc)"
                    " - length(substring_index(name_cc, ', ', -1)) - 2)"
                ),
            ).otherwise(F.lit("")).alias("name"),
            F.when(
                F.col("name_cc").contains(", "),
                F.substring_index("name_cc", ", ", -1),
            ).otherwise(F.lit("")).alias("cc"),
        )
        mentions = (
            parsed.filter(
                (F.col("asn_str") != "") & (F.col("name") != "") & (F.col("cc") != "")
                & (F.length("cc") <= 2)
            )
            .select(
                F.col("asn_str").try_cast("long").alias("asn"),
                F.col("name"),
                canon_cc(F.col("cc")).alias("cc"),
            )
            .filter(F.col("asn").isNotNull())
        )
        mentions = self.m(mentions)
        nodes = [
            self.make_nodes(mentions, "AS", "asn"),
            self.make_nodes(mentions, "Name", "name"),
            self.make_nodes(mentions, "Country", "cc"),
        ]
        # one-pass multi-predicate emission (melt): NAME + COUNTRY from a
        # single scan instead of two union branches re-running the parse
        triples = [
            self.melt_triples(mentions, "AS", "asn", [
                (None, "NAME", "Name", "name", None),
                (None, "COUNTRY", "Country", "cc", None),
            ])
        ]
        return nodes, triples
