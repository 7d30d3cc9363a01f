"""country_information — enrich Country nodes with name and alpha-3 code.

Reference: iyp/post/country_information.py:13-33 (iso3166 lookup; invalid
codes logged and skipped). Here: broadcast join against the embedded ISO
3166 dimension (data_iso3166.py) — a join, not a per-row lookup.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..data_iso3166 import COUNTRIES
from ..store import GraphStore

NAME = "iyp.country_information"


class CountryInformation:
    NAME = NAME
    EXPECTED_PREDS: list[str] = []

    def __init__(self, store: GraphStore):
        self.store = store
        self.spark = store.spark

    def run(self) -> dict:
        dim = self.spark.createDataFrame(
            [(a2, a3, name) for a2, (a3, name) in COUNTRIES.items()],
            ["key", "alpha3", "name"],
        )
        countries = self.store.read_nodes("Country").select("label", "key")
        enriched = countries.join(F.broadcast(dim), "key").select(
            "label", "key",
            F.create_map(
                F.lit("name"), F.col("name"),
                F.lit("alpha3"), F.col("alpha3"),
            ).alias("props"),
        )
        n = self.store.enrich_nodes(enriched)
        self.store.log_lineage(self.NAME, "materialize", n, 0.0)
        return {"post": self.NAME, "nodes": n}
