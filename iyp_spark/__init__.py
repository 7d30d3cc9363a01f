"""iyp_spark — a from-scratch PySpark-native knowledge-graph construction engine.

Reproduces the computation of InternetHealthReport/internet-yellow-pages
(reference at /root/reference, cited per-module as ``file:line``) with an
idiomatic Spark architecture:

- input: an "interleaved documents" lake table
  ``(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``
  — one document per crawler payload record (BASELINE.json input_hint);
- parse: native column expressions / Arrow pandas UDFs (never per-row Python);
- entity linking: deterministic node ids ``xxhash64(label, key)`` — no
  write-then-read cycle (reference: iyp/__init__.py:254-446 round-trips to
  Neo4j per batch); crawlers that must link only *pre-existing* nodes use a
  broadcast semi-join against the node dictionary;
- materialize: node-dictionary table + triples fact table, partitioned by
  ``reference_name`` (the crawler) so a re-run is an idempotent dynamic
  partition overwrite (reference rerun semantics: iyp/__init__.py:660-687);
- canonicalization: connected-components over alias/sibling edges.

Layout:
    session.py    Spark session factory (AQE, Arrow, skew-join configs)
    schema.py     table schemas + canonical predicate names
    canon.py      property canonicalization (functions; ref iyp/__init__.py:18-60)
    store.py      GraphStore: lake tables, partition-replace, lineage, resume
    framework.py  SparkCrawler base (sources/sinks; ref iyp/__init__.py BaseCrawler)
    crawlers/     one module per reference crawler (operators)
    post/         derived-triple jobs (post-processing passes; plans)
    graph/        query surface over the triples table (gallery patterns)
    ops/          large-scale training-data ops (dedup, similarity, text, multimodal)
    fixtures.py   deterministic synthetic document corpus (FIXTURES.md)
    golden.py     straight-line Python re-implementation = correctness oracle
"""

__version__ = "0.1.0"
