"""Text analysis operators: tokenization stats, quality scoring, language
ID (stopword-hit heuristic), document fingerprinting.

All pure native column expressions (JVM-side, whole-stage codegen) — the
engines' md5/regexp primitives are identical across Spark and DuckDB, which
is what makes these oracle-checkable bit-for-bit.

Numeric-portability note: ratios are emitted via floor-truncation
(floor(x·10⁴)/10⁴) rather than round() — Spark rounds the binary double,
DuckDB rounds its shortest decimal repr, so round() diverges on half-way
points; floor of the identical double is exact in both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def trunc4(col: F.Column) -> F.Column:
    return F.floor(col * F.lit(10000.0)) / F.lit(10000.0)


def tokens_col(text_col="text") -> F.Column:
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )


# GPT-2-style pre-tokenizer pattern, simplified to the subset that means
# the same thing in Java regex (Spark) and RE2 (DuckDB oracle): common
# English contractions, space-prefixed letter runs, digit runs, punctuation
# runs, whitespace runs. (The upstream pattern's `\s+(?!\S)` lookahead is
# not RE2-expressible and only affects trailing-space split granularity.)
BPE_ISH_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def bpe_token_count(docs: DataFrame) -> DataFrame:
    """doc_id, n_bpe_tokens (BPE-ish pre-tokenizer pieces), n_ws_tokens
    (whitespace tokens) — the two token-budget estimates a training-data
    pipeline prices documents with. Pure native regexp, codegen'd."""
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(BPE_ISH_PATTERN), 0))
        .alias("n_bpe_tokens"),
        F.size(tokens_col()).alias("n_ws_tokens"),
    )


def token_stats(docs: DataFrame) -> DataFrame:
    """doc_id, n_tokens, n_chars, avg_token_len."""
    toks = tokens_col()
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars"),
        trunc4(
            F.length(F.expr("replace(text, ' ', '')")) / F.size(toks)
        ).alias("avg_token_len"),
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style within-document repetition signals: the fraction of
    tokens that are repeats (1 - distinct/total) and the share of the
    document's word bigrams taken by its single most frequent bigram —
    the two cheapest detectors of boilerplate / degenerate generation
    loops in a pretraining corpus.

    Returns (doc_id, n_tokens, n_distinct_tokens, dup_token_frac,
    top_bigram_frac); docs with <2 tokens get top_bigram_frac 0.

    Scale: bigrams are built map-side with zip_with over two slices (no
    self-join); the only shuffle is the (doc_id, bigram) count, map-side
    combinable and keyed by doc_id so it rides the corpus partitioning.
    """
    d = docs.select("doc_id", tokens_col().alias("toks"))
    n_bg = F.greatest(F.size("toks") - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(F.col("toks"), 1, n_bg),
        F.slice(F.col("toks"), 2, n_bg),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    base = d.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct_tokens"),
        bigrams.alias("bigrams"),
    )
    counts = (
        base.select("doc_id", F.explode("bigrams").alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("max_bg"), F.sum("cnt").alias("n_bg"))
    )
    return base.join(counts, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        trunc4(
            (F.col("n_tokens") - F.col("n_distinct_tokens")) / F.col("n_tokens")
        ).alias("dup_token_frac"),
        trunc4(
            F.coalesce(F.col("max_bg") / F.col("n_bg"), F.lit(0.0))
        ).alias("top_bigram_frac"),
    )


STOPWORDS_EN = ["the", "a", "of", "and", "in"]


def _hits(markers: list[str]) -> F.Column:
    return F.size(F.filter(F.col("toks"), lambda t: t.isin(markers)))


def quality_score(docs: DataFrame) -> DataFrame:
    """Stopword ratio + type-token ratio → composite quality score.

    Mirrors the shape of heuristic quality filters in web-scale corpora:
    cheap, vectorized, fully expressible without UDFs.
    """
    toks = tokens_col()
    d = docs.select("doc_id", toks.alias("toks"))
    n = F.size("toks")
    stop_raw = _hits(STOPWORDS_EN) / n
    ttr_raw = F.size(F.array_distinct("toks")) / n
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        trunc4(stop_raw).alias("stop_ratio"),
        trunc4(ttr_raw).alias("type_token_ratio"),
        trunc4((F.lit(1.0) - stop_raw + ttr_raw) / F.lit(2.0)).alias("quality"),
    )


LANG_MARKERS = {
    "en": ["the", "a", "of"],
    "de": ["der", "die", "das"],
    "fr": ["le", "la", "les"],
}


def lang_guess(docs: DataFrame) -> DataFrame:
    """n-gram/stopword-hit language ID heuristic: count marker-word hits per
    language, argmax with deterministic tie order en > de > fr, 'unknown'
    when all zero."""
    toks = tokens_col()
    d = docs.select("doc_id", toks.alias("toks"))
    hits = {lang: _hits(markers) for lang, markers in LANG_MARKERS.items()}
    best = (
        F.when(
            (hits["en"] >= hits["de"]) & (hits["en"] >= hits["fr"]) & (hits["en"] > 0),
            F.lit("en"),
        )
        .when((hits["de"] >= hits["fr"]) & (hits["de"] > 0), F.lit("de"))
        .when(hits["fr"] > 0, F.lit("fr"))
        .otherwise(F.lit("unknown"))
    )
    return d.select(
        "doc_id",
        hits["en"].alias("en_hits"),
        hits["de"].alias("de_hits"),
        hits["fr"].alias("fr_hits"),
        best.alias("lang_guess"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Content fingerprint: md5 over whitespace-normalized lowered text
    (the exact-dedup key); prefix kept as a short locality-friendly hash."""
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fp"),
        F.substring(F.md5(norm), 1, 8).alias("fp8"),
    )
