"""Large-scale training-data pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) — first-class components alongside the
KG crawlers. All implemented as DataFrame programs: cross-engine-checkable
(DuckDB oracles in entry_queries) and scale-ready (no driver-side loops,
no per-row Python except Arrow-batched mapInPandas where stated)."""
