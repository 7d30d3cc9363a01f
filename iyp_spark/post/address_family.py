"""address_family — af property (4/6) on every IP and Prefix node.

Reference: iyp/post/address_family.py:11-27 — four Cypher UPDATEs keyed on
CONTAINS ':' / '.'. Here: one node-dictionary enrichment with a native
when/otherwise expression (no UDF; SURVEY §2.10 maps this to pure columns).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..canon import af_of_key
from ..store import GraphStore

NAME = "iyp.address_family"


class AddressFamily:
    NAME = NAME
    EXPECTED_PREDS: list[str] = []

    def __init__(self, store: GraphStore):
        self.store = store

    def run(self) -> dict:
        nodes = self.store.read_nodes().filter(
            F.array_contains("labels", "Prefix")
            | F.array_contains("labels", "IP")
        )
        enriched = nodes.filter(af_of_key(F.col("key")).isNotNull()).select(
            "label",
            "key",
            F.create_map(
                F.lit("af"), af_of_key(F.col("key")).cast("string")
            ).alias("props"),
        )
        n = self.store.enrich_nodes(enriched)
        self.store.log_lineage(self.NAME, "materialize", n, 0.0)
        return {"post": self.NAME, "nodes": n}
