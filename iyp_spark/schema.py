"""Table schemas for the KG lake.

Reference data model (SURVEY.md §1): Neo4j nodes with one identifying
property per label (iyp/__init__.py:254-324) and typed directed edges with
provenance properties (iyp/__init__.py:545-589, :701-708). Here:

- ``documents``: the interleaved input table (BASELINE.json input_hint).
- ``nodes``:     one dictionary of all labels; ``node_id = xxhash64(label, key)``
                 is deterministic, so entity linking never needs a
                 write-then-read round-trip.
- ``triples``:   the fact table, partitioned by ``reference_name`` (crawler)
                 — partition pruning replaces the reference's range index on
                 reference_name (iyp/__init__.py:201-227).
- ``lineage``:   per (crawler, stage) metrics + checkpoint state (north rule:
                 resumable with lineage + metrics).
"""

from __future__ import annotations

from pyspark.sql import types as T

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # 'text' | 'media'
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),  # "<crawler>/<seq>"
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), False),
        T.StructField("crawler", T.StringType(), False),  # partition column
    ]
)

REFERENCE_STRUCT = T.StructType(
    [
        # mandatory provenance props; ref iyp/__init__.py:701-708, enforced :614-617
        T.StructField("reference_name", T.StringType(), False),
        T.StructField("reference_org", T.StringType(), False),
        T.StructField("reference_url_data", T.StringType(), True),
        T.StructField("reference_url_info", T.StringType(), True),
        T.StructField("reference_time_fetch", T.TimestampType(), True),
        T.StructField("reference_time_modification", T.TimestampType(), True),
    ]
)

NODES_SCHEMA = T.StructType(
    [
        T.StructField("label", T.StringType(), False),  # primary label (partition col)
        T.StructField("key", T.StringType(), False),  # canonicalized natural key
        T.StructField("node_id", T.LongType(), False),  # xxhash64(label, key)
        T.StructField("labels", T.ArrayType(T.StringType()), False),  # incl. subtypes
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("subj_id", T.LongType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj_id", T.LongType(), False),
        # denormalized endpoint keys: golden-compare + query without dim join;
        # dictionary-encoded in parquet so the cost at scale is modest.
        T.StructField("subj_label", T.StringType(), False),
        T.StructField("subj_key", T.StringType(), False),
        T.StructField("obj_label", T.StringType(), False),
        T.StructField("obj_key", T.StringType(), False),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("reference", REFERENCE_STRUCT, False),
        T.StructField("reference_name", T.StringType(), False),  # partition column
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("crawler", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("rows", T.LongType(), False),
        T.StructField("seconds", T.DoubleType(), False),
        T.StructField("status", T.StringType(), False),  # 'complete' | 'failed'
        T.StructField("run_id", T.StringType(), False),
        T.StructField("finished_at", T.TimestampType(), False),
    ]
)

# Node key property per label; mirrors the unique-constraint map of the
# reference (iyp/__init__.py:179-199 creates one per label at first use).
NODE_KEY_PROP = {
    "AS": "asn",
    "Prefix": "prefix",
    "BGPPrefix": "prefix",
    "RIRPrefix": "prefix",
    "GeoPrefix": "prefix",
    "PeeringLAN": "prefix",
    "IP": "ip",
    "DomainName": "name",
    "HostName": "name",
    "AuthoritativeNameServer": "name",
    "Name": "name",
    "Country": "country_code",
    "Organization": "name",
    "IXP": "name",
    "Tag": "label",
    "URL": "url",
    "Ranking": "name",
    "OpaqueID": "id",
    "PeeringdbOrgID": "id",
    "PeeringdbIXID": "id",
    "PeeringdbNetID": "id",
    "CaidaOrgID": "id",
    "Point": "position",
    "Estimate": "name",
    "AtlasProbe": "id",
}
