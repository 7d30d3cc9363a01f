"""Public Suffix List classification — tldextract semantics as broadcast
hash joins.

The reference classifies names with ``tldextract`` against the Mozilla
Public Suffix List: registered_domain in cisco/umbrella_top1m.py:99-104 and
fqdn in post/url2hostname.py:26-29 / ooni/webconnectivity.py:57. tldextract
walks the labels right-to-left through a PSL trie; here the trie becomes a
BOUNDED number of broadcast hash joins — one per candidate-suffix depth —
so classification is a pure projection pipeline with zero shuffles:

- a name's candidate suffixes are its last 1..MAX_K labels (MAX_K = the
  deepest rule in the list, 5 in the published data);
- candidate k joins the k-label rules dimension (exact + exception rules on
  the literal labels, wildcard rules on the candidate with its leftmost
  label replaced by '*');
- precedence per the PSL algorithm: an exception rule wins (public suffix =
  rule minus its leftmost label), else the match with the most labels;
- no match → no public suffix → registered_domain is null (tldextract
  returns '' rather than applying the PSL's implicit '*' rule).

``PSL_ICANN`` / ``PSL_PRIVATE`` are loaded from the byte-complete
published list vendored at ``data/public_suffix_list.dat``
(publicsuffix.org, MPL-2.0 data file, carries its own license header;
this copy is the Debian ``publicsuffix`` package's
``/usr/share/publicsuffix/public_suffix_list.dat``): ~9.5k rules —
every ccTLD/gTLD, all second-level registries, full-TLD wildcards
(*.bd *.ck …), the jp designated-city wildcard+exception pairs and
geographic rules, the US k12/cc/lib hierarchies, and the complete
PRIVATE section. Unicode rules additionally register their punycode
(IDNA) form, matching tldextract's snapshot behavior, so xn-- names
seen in DNS data classify identically. ``MAX_K`` is derived from the
data (5). The full list still broadcasts — ~10k rows split across five
depth dimensions is kilobytes — and the plan shape is unchanged from
the round-2 snapshot.

tldextract parity: the reference's ``tldextract.extract`` DEFAULT excludes
the PSL private section, so ``include_private=False`` (the default here)
matches cisco/umbrella_top1m.py:99-104 and post/url2hostname.py:26-29;
pass ``include_private=True`` for private-aware classification (the
tldextract ``include_psl_private_domains=True`` mode).

The straight-line ``py_registered_domain`` mirror is the golden oracle used
by tests — same data, independent implementation.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_PSL_DATA = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "data", "public_suffix_list.dat"
)


def _punycode(rule: str) -> str | None:
    """The IDNA (punycode) form of a unicode rule, or None if a label
    refuses to encode (Python's idna codec is IDNA-2003; the handful of
    rules it rejects simply keep only their unicode form)."""
    bang = rule.startswith("!")
    try:
        enc = ".".join(
            lbl if lbl == "*" or lbl.isascii()
            else lbl.encode("idna").decode("ascii")
            for lbl in rule.lstrip("!").split(".")
        )
    except UnicodeError:
        return None
    return ("!" if bang else "") + enc


def load_psl(path: str = _PSL_DATA) -> tuple[list[str], list[str]]:
    """Parse the published PSL file into (icann_rules, private_rules).
    Format per publicsuffix.org: one rule per line up to the first
    whitespace; // comments; the ===BEGIN/END ICANN|PRIVATE DOMAINS===
    markers delimit the sections. Unicode rules also register their
    punycode form (tldextract snapshot parity)."""
    icann: list[str] = []
    private: list[str] = []
    section: list[str] | None = None
    with open(path, encoding="utf-8") as f:
        for ln in f:
            ln = ln.strip()
            if not ln:
                continue
            if ln.startswith("//"):
                if "BEGIN ICANN" in ln:
                    section = icann
                elif "BEGIN PRIVATE" in ln:
                    section = private
                elif "END ICANN" in ln or "END PRIVATE" in ln:
                    section = None
                continue
            if section is None:
                continue
            rule = ln.split()[0].lower()
            section.append(rule)
            if not rule.isascii():
                puny = _punycode(rule)
                if puny is not None and puny != rule:
                    section.append(puny)
    return icann, private


PSL_ICANN, PSL_PRIVATE = load_psl()

PSL_SNAPSHOT = PSL_ICANN + PSL_PRIVATE  # back-compat alias (full rule set)

MAX_K = max(r.lstrip("!").count(".") + 1 for r in PSL_SNAPSHOT)

# (rule_labels_tuple, kind, private) — kind: 'exact'|'wildcard'|'exception'
_PARSED = []
for _r, _priv in [(r, False) for r in PSL_ICANN] + [(r, True) for r in PSL_PRIVATE]:
    if _r.startswith("!"):
        _PARSED.append((tuple(_r[1:].split(".")), "exception", _priv))
    elif _r.startswith("*."):
        _PARSED.append((tuple(_r.split(".")), "wildcard", _priv))
    else:
        _PARSED.append((tuple(_r.split(".")), "exact", _priv))


# ---------------------------------------------------------------- python
# golden-oracle mirror of the PSL algorithm (and of tldextract's behavior
# for unlisted TLDs: no implicit '*' rule)

def _rule_sets(include_private: bool):
    keep = (lambda p: True) if include_private else (lambda p: not p)
    exact = {r for r, k, p in _PARSED if k == "exact" and keep(p)}
    wild = {r for r, k, p in _PARSED if k == "wildcard" and keep(p)}
    exc = {r for r, k, p in _PARSED if k == "exception" and keep(p)}
    return exact, wild, exc


_SETS = {False: _rule_sets(False), True: _rule_sets(True)}


def py_public_suffix(name: str, include_private: bool = False) -> str | None:
    """Number of labels the public suffix of ``name`` spans, as the suffix
    string; None when no rule matches."""
    exact, wild, exc = _SETS[include_private]
    labels = name.lower().split(".")
    best = None  # (is_exception, n_labels)
    for k in range(1, min(len(labels), MAX_K) + 1):
        cand = tuple(labels[-k:])
        if cand in exc:
            return ".".join(cand[1:])  # exception wins immediately
        if cand in exact or (("*",) + cand[1:]) in wild:
            if best is None or k > best:
                best = k
    return ".".join(labels[-best:]) if best else None


def py_registered_domain(name: str, include_private: bool = False) -> str | None:
    """tldextract.extract(name).registered_domain (lower-cased); None when
    there is no suffix or no domain label left of it."""
    if not name:
        return None
    lower = name.lower()
    suffix = py_public_suffix(lower, include_private)
    if suffix is None:
        return None
    n_suffix = suffix.count(".") + 1
    labels = lower.split(".")
    if len(labels) <= n_suffix:
        return None  # the name IS a public suffix
    return ".".join(labels[-(n_suffix + 1):])


def py_fqdn(name: str, include_private: bool = False) -> str | None:
    """tldextract.extract(name).fqdn: the name itself iff it has both a
    suffix and a domain label."""
    return name.lower() if py_registered_domain(name, include_private) else None


# ---------------------------------------------------------------- spark

# per-session dim cache: the full list is ~10k rules, and rebuilding the
# five depth dims through py4j on every classification call is pure
# overhead — keyed by applicationId so a restarted session gets fresh
# DataFrames, never stale handles
_DIM_CACHE: dict[tuple[str, int, bool], DataFrame | None] = {}


def _dim(spark: SparkSession, k: int,
         include_private: bool = False) -> DataFrame | None:
    """Rules whose match key has exactly k labels, as a broadcast dim:
    (psl_key, psl_suffix_labels). Exception rules match on their literal
    labels but yield a suffix one label shorter; wildcard rules match on
    the '*.'-key. Exceptions get priority via negative encoding resolved
    by the caller."""
    ck = (spark.sparkContext.applicationId, k, include_private)
    if ck in _DIM_CACHE:
        return _DIM_CACHE[ck]
    rows = []
    for labels, kind, priv in _PARSED:
        if len(labels) != k or (priv and not include_private):
            continue
        key = ".".join(labels)
        if kind == "exception":
            rows.append((key, -(k - 1)))  # negative = exception, wins
        else:
            rows.append((key, k))
    dim = (
        spark.createDataFrame(rows, "psl_key string, psl_suffix_labels int")
        if rows else None
    )
    _DIM_CACHE[ck] = dim
    return dim


def with_registered_domain(
    df: DataFrame, name_col: str, out_col: str = "registered_domain",
    include_private: bool = False,
) -> DataFrame:
    """Add ``out_col`` (and ``public_suffix``) computed from ``name_col``.

    MAX_K broadcast left joins (one per candidate depth) + one projection;
    no shuffle, no UDF — survives any input cardinality.
    ``include_private=False`` (default) matches the reference's tldextract
    defaults; True additionally treats PSL private-section hosting
    suffixes (s3.amazonaws.com, github.io, …) as public suffixes.
    """
    spark = df.sparkSession
    lower = F.lower(F.col(name_col))
    labels = F.split(lower, r"\.")
    n = F.size(labels)
    match_cols: list[Column] = []
    for k in range(1, MAX_K + 1):
        cand = F.when(n >= k, F.concat_ws(".", F.slice(labels, n - k + 1, F.lit(k))))
        wcand = (
            F.when(n >= k,
                   F.concat_ws(".", F.lit("*"), F.slice(labels, n - k + 2, F.lit(k - 1))))
            if k >= 2 else F.lit(None).cast("string")
        )
        dim = _dim(spark, k, include_private)
        if dim is None:
            continue
        dim_d = dim.withColumnRenamed("psl_key", f"_pk{k}").withColumnRenamed(
            "psl_suffix_labels", f"_pm{k}"
        )
        dim_w = dim.filter(F.col("psl_key").startswith("*.")).withColumnRenamed(
            "psl_key", f"_pwk{k}"
        ).withColumnRenamed("psl_suffix_labels", f"_pwm{k}")
        df = df.withColumn(f"_cand{k}", cand).join(
            F.broadcast(dim_d), F.col(f"_cand{k}") == F.col(f"_pk{k}"), "left"
        ).drop(f"_pk{k}")
        match_cols.append(F.col(f"_pm{k}"))
        if k >= 2:
            df = df.withColumn(f"_wcand{k}", wcand).join(
                F.broadcast(dim_w), F.col(f"_wcand{k}") == F.col(f"_pwk{k}"), "left"
            ).drop(f"_pwk{k}")
            match_cols.append(F.col(f"_pwm{k}"))
    # precedence: any exception match (negative) wins with |value| labels;
    # otherwise the largest positive match
    matches = F.array_compact(F.array(*match_cols))
    exc = F.array_min(F.filter(matches, lambda m: m < 0))
    best = F.coalesce(-exc, F.array_max(F.filter(matches, lambda m: m >= 0)))
    suffix = F.when(
        best.isNotNull() & (n >= best),
        F.concat_ws(".", F.slice(labels, n - best + 1, best)),
    )
    rd = F.when(
        suffix.isNotNull() & (n > best),
        F.concat_ws(".", F.slice(labels, n - best, best + 1)),
    )
    out = df.withColumn("public_suffix", suffix).withColumn(out_col, rd)
    drop = [c for c in out.columns
            if c.startswith(("_cand", "_wcand", "_pm", "_pwm"))]
    return out.drop(*drop)
