"""Corpus quality filtering — the composed "keep set" apply step that
turns raw scraped documents into a training corpus: length floor, heuristic
quality floor, language-ID gate, and exact-duplicate representative
selection, in ONE DataFrame program.

This is the filter stack web-scale corpus builds run between ingest and
dedup/packing (the C4/Gopher/RefinedWeb-style rule pipeline). The signals
reuse the exact column expressions of the standalone operators in
``ops.text`` (each independently oracle-checked), but are evaluated in a
SINGLE projection over ONE corpus scan — so the whole filter is one
map-side pass plus exactly ONE exchange: the fingerprint window that picks
each exact-duplicate group's min-id representative. (The first version
joined the three standalone operators on doc_id — 4 scans and 4 shuffles
for the same rows; the plan fence below pins the collapsed shape.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import LANG_MARKERS, STOPWORDS_EN, _hits, tokens_col, trunc4


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

    Scale: one corpus scan, every signal map-side (whole-stage codegen);
    the single exchange is the fingerprint-partitioned min window — md5
    keys are uniform by construction, so no skew handling is needed.
    """
    n = F.size("toks")
    stop_raw = _hits(STOPWORDS_EN) / n
    ttr_raw = F.size(F.array_distinct("toks")) / n
    hits = {lang: _hits(markers) for lang, markers in LANG_MARKERS.items()}
    lang = (
        F.when(
            (hits["en"] >= hits["de"]) & (hits["en"] >= hits["fr"]) & (hits["en"] > 0),
            F.lit("en"),
        )
        .when((hits["de"] >= hits["fr"]) & (hits["de"] > 0), F.lit("de"))
        .when(hits["fr"] > 0, F.lit("fr"))
        .otherwise(F.lit("unknown"))
    )
    fp = F.md5(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    sig = docs.select("doc_id", "text", tokens_col().alias("toks")).select(
        "doc_id",
        n.alias("n_tokens"),
        trunc4((F.lit(1.0) - stop_raw + ttr_raw) / F.lit(2.0)).alias("quality"),
        lang.alias("lang_guess"),
        fp.alias("fp"),
    )
    rep = F.min("doc_id").over(Window.partitionBy("fp"))
    return (
        sig.withColumn("rep_id", rep)
        .filter(
            (F.col("doc_id") == F.col("rep_id"))
            & (F.col("n_tokens") >= min_tokens)
            & (F.col("quality") >= min_quality)
            & (F.col("lang_guess") != "unknown")
        )
        .select("doc_id", "n_tokens", "quality", "lang_guess")
    )
