"""url2hostname — URL -PART_OF-> HostName for URLs whose fqdn is a known
HostName node.

Reference: iyp/post/url2hostname.py:13-39 — tldextract.extract(url).fqdn
per URL, linked only when the HostName exists (dict .get). Here the host
is extracted with a native regexp (authority part of the URL, lowered,
ports/userinfo stripped), then validated against the Public Suffix List
(psl.with_registered_domain): tldextract's .fqdn is non-empty only when
the host has both a public suffix and a domain label, so IP-literal hosts
and unknown TLDs drop out exactly like the reference. The existence test
is the inner join itself.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..framework import FIXED_FETCH_TIME
from ..psl import with_registered_domain
from ..store import GraphStore

NAME = "iyp.url2hostname"

# scheme://[userinfo@]HOST[:port][/...] → HOST
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"


class Url2Hostname:
    NAME = NAME
    EXPECTED_PREDS = ["PART_OF"]

    def __init__(self, store: GraphStore):
        self.store = store

    def run(self) -> dict:
        urls = with_registered_domain(
            self.store.read_nodes("URL").select(
                F.col("key").alias("url"), F.col("node_id").alias("url_id")
            ).withColumn("url_host", F.lower(F.regexp_extract("url", _HOST_RE, 1))),
            "url_host",
        ).withColumn(
            # tldextract .fqdn: the host itself iff suffix AND domain exist
            "fqdn",
            F.when(F.col("registered_domain").isNotNull(), F.col("url_host")),
        )
        hosts = self.store.read_nodes("HostName").select(
            F.col("key").alias("host"), F.col("node_id").alias("host_id")
        )
        ref = F.struct(
            F.lit(self.NAME).alias("reference_name"),
            F.lit("Internet Yellow Pages").alias("reference_org"),
            F.lit("https://iyp.iijlab.net").alias("reference_url_data"),
            F.lit(None).cast("string").alias("reference_url_info"),
            F.lit(FIXED_FETCH_TIME).alias("reference_time_fetch"),
            F.lit(FIXED_FETCH_TIME).alias("reference_time_modification"),
        )
        links = urls.join(hosts, urls.fqdn == hosts.host).select(
            F.col("url_id").alias("subj_id"),
            F.lit("PART_OF").alias("pred"),
            F.col("host_id").alias("obj_id"),
            F.lit("URL").alias("subj_label"),
            F.col("url").alias("subj_key"),
            F.lit("HostName").alias("obj_label"),
            F.col("host").alias("obj_key"),
            F.lit(None).cast("map<string,string>").alias("props"),
            ref.alias("reference"),
        )
        n = self.store.replace_triples(self.NAME, links)
        self.store.log_lineage(self.NAME, "materialize", n, 0.0)
        return {"post": self.NAME, "triples": n}
