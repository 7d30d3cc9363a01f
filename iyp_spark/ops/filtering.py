"""Corpus quality filtering — the composed "keep set" apply step that
turns raw scraped documents into a training corpus: length floor, heuristic
quality floor, language-ID gate, and exact-duplicate representative
selection, in ONE DataFrame program.

This is the filter stack web-scale corpus builds run between ingest and
dedup/packing (the C4/Gopher/RefinedWeb-style rule pipeline): each signal
is an existing vectorized operator (`ops.text`), so the whole filter is
native column expressions + one fingerprint-keyed aggregate — no UDFs, no
per-row Python, fully oracle-checkable.

Scale: the three signal passes are map-side projections fused by Catalyst
over ONE corpus scan each (a production build computes all signals in a
single select — kept separate here so each stays independently
oracle-checked); the only exchange is the fingerprint min-id aggregate
(map-side-combinable groupBy on the md5 key, uniform by construction) and
its join back, which AQE plans as a shuffle join on the same key — one
shuffle total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import fingerprint, lang_guess, quality_score


def quality_filter(
    docs: DataFrame,
    min_tokens: int = 10,
    min_quality: float = 0.5,
) -> DataFrame:
    """The kept corpus after the rule stack:

    - ``n_tokens >= min_tokens`` (length floor),
    - composite ``quality >= min_quality`` (stopword + type-token ratio,
      floor-truncated to 1e-4 so the threshold compare is engine-exact),
    - ``lang_guess != 'unknown'`` (language-ID gate),
    - exact-duplicate representative only: the MIN doc_id of each
      normalized-text md5 fingerprint group survives.

    Returns (doc_id, n_tokens, quality, lang_guess) for kept docs.
    """
    q = quality_score(docs).select("doc_id", "n_tokens", "quality")
    lg = lang_guess(docs).select("doc_id", "lang_guess")
    fp = fingerprint(docs).select("doc_id", "fp")
    rep = fp.groupBy("fp").agg(F.min("doc_id").alias("rep_id"))
    kept_rep = fp.join(rep, "fp").filter(
        F.col("doc_id") == F.col("rep_id")
    ).select("doc_id")
    return (
        q.join(lg, "doc_id")
        .join(kept_rep, "doc_id")
        .filter(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("quality") >= min_quality)
            & (F.col("lang_guess") != "unknown")
        )
        .select("doc_id", "n_tokens", "quality", "lang_guess")
    )
