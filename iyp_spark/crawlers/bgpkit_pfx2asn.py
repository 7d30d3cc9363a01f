"""bgpkit.pfx2asn — prefix→origin-AS triples (the minimum slice).

Reference: iyp/crawlers/bgpkit/pfx2asn.py:32-60. Dataflow there: stream
bz2 JSON, normalize prefix with ip_network().compressed (drop malformed),
get/create AS + BGPPrefix nodes (BGPPrefix additionally labeled Prefix),
emit ORIGINATE links with the entry as props.

Spark plan: partition-pruned documents scan → native span extraction →
Arrow pandas UDF canonicalization (compress_prefix) → dictionary rows +
ORIGINATE triples. No shuffle until the dictionary dedup groupBy; triple
materialization itself is shuffle-free (ids are hashes, not lookups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..canon import canon_asn, compress_prefix
from ..framework import SparkCrawler


class PfxToAsn(SparkCrawler):
    ORG = "BGPKIT"
    URL = "https://data.bgpkit.com/pfx2as/pfx2as-latest.json.bz2"
    NAME = "bgpkit.pfx2asn"
    EXPECTED_PREDS = ["ORIGINATE"]

    def transform(self, docs: DataFrame):
        mentions = (
            docs.select(
                compress_prefix(self.text_span(0)).alias("prefix"),
                canon_asn(self.text_span(1)).alias("asn"),
            )
            # malformed prefixes → null → dropped (ref :33-37 warning+continue)
            .filter(F.col("prefix").isNotNull() & F.col("asn").isNotNull())
        )
        mentions = self.m(mentions)
        as_nodes = self.make_nodes(mentions, "AS", "asn")
        # Prefix label added on top of BGPPrefix (ref :47-49 batch_add_node_label)
        pfx_nodes = self.make_nodes(mentions, "BGPPrefix", "prefix",
                                    extra_labels=["Prefix"])
        triples = self.make_triples(
            mentions.withColumn(
                "link_props",
                F.create_map(
                    F.lit("prefix"), F.col("prefix"),
                    F.lit("asn"), F.col("asn").cast("string"),
                ),
            ),
            "ORIGINATE", "AS", "asn", "BGPPrefix", "prefix",
            props_col=F.col("link_props"),
        )
        return [as_nodes, pfx_nodes], [triples]
