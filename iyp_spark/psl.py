"""Public Suffix List classification — tldextract semantics as broadcast
hash joins.

The reference classifies names with ``tldextract`` against the Mozilla
Public Suffix List: registered_domain in cisco/umbrella_top1m.py:99-104 and
fqdn in post/url2hostname.py:26-29 / ooni/webconnectivity.py:57. tldextract
walks the labels right-to-left through a PSL trie; here the trie becomes a
BOUNDED number of broadcast hash joins — one per candidate-suffix depth —
so classification is a pure projection pipeline with zero shuffles:

- a name's candidate suffixes are its last 1..MAX_K labels (MAX_K = the
  deepest rule in the list, 3 in this snapshot, 5 for the full PSL);
- candidate k joins the k-label rules dimension (exact + exception rules on
  the literal labels, wildcard rules on the candidate with its leftmost
  label replaced by '*');
- precedence per the PSL algorithm: an exception rule wins (public suffix =
  rule minus its leftmost label), else the match with the most labels;
- no match → no public suffix → registered_domain is null (tldextract
  returns '' rather than applying the PSL's implicit '*' rule).

``PSL_SNAPSHOT`` is a frozen subset of the public list (publicsuffix.org,
public domain data) — enough to exercise every rule kind (exact,
multi-label, wildcard, exception); production swaps in the full list, which
still broadcasts (≈10k rows) without changing the plan shape.

The straight-line ``py_registered_domain`` mirror is the golden oracle used
by tests — same data, independent implementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

PSL_SNAPSHOT = """
com net org io info biz dev app xyz online site club shop edu gov mil int
ac ad ae af ag ai al am ao aq ar at au aw ax az ba bb be bf bg bh bi bj bm
bn bo br bs bt bw by bz ca cc cd cf cg ch ci cl cm cn co cr cu cv cw cx cy
cz de dj dk dm do dz ec ee eg es et eu fi fj fk fm fo fr ga gb gd ge gg gh
gi gl gm gn gq gr gs gt gu gw gy hk hm hn hr ht hu id ie il im in iq ir is
it je jm jo jp ke kg kh ki km kn kp kr kw ky kz la lb lc li lk lr ls lt lu
lv ly ma mc md me mg mh mk ml mm mn mo mp mq mr ms mt mu mv mw mx my mz na
nc ne nf ng ni nl no np nr nu nz om pa pe pf pg ph pk pl pm pn pr ps pt pw
py qa re ro rs ru rw sa sb sc sd se sg sh si sk sl sm sn so sr ss st sv sx
sy sz tc td tf tg th tj tk tl tm tn to tr tt tv tw tz ua ug uk us uy uz va
vc ve vg vi vn vu wf ws ye yt za zm zw
co.uk org.uk ac.uk gov.uk net.uk sch.uk me.uk ltd.uk plc.uk
com.au net.au org.au edu.au gov.au asn.au id.au
co.jp ne.jp or.jp ac.jp ad.jp ed.jp go.jp gr.jp lg.jp
com.br net.br org.br gov.br edu.br
com.cn net.cn org.cn gov.cn edu.cn ac.cn
co.in net.in org.in firm.in gen.in ind.in
co.za net.za org.za gov.za web.za
com.mx org.mx net.mx gob.mx edu.mx
com.ar net.ar org.ar gob.ar edu.ar
com.tr net.tr org.tr gov.tr edu.tr
co.kr ne.kr or.kr re.kr go.kr ac.kr
com.sg net.sg org.sg edu.sg gov.sg
com.hk net.hk org.hk edu.hk gov.hk
co.nz net.nz org.nz govt.nz ac.nz school.nz
co.id net.id or.id web.id ac.id
com.tw net.tw org.tw edu.tw gov.tw
co.th in.th ac.th go.th or.th
com.my net.my org.my edu.my gov.my
co.il net.il org.il ac.il gov.il
com.eg net.eg org.eg edu.eg gov.eg
act.edu.au nsw.edu.au qld.edu.au vic.edu.au
*.ck !www.ck
*.kawasaki.jp !city.kawasaki.jp
""".split()

MAX_K = max(r.lstrip("!").count(".") + 1 for r in PSL_SNAPSHOT)

# (rule_labels_tuple, kind) — kind: 'exact' | 'wildcard' | 'exception'
_PARSED = []
for _r in PSL_SNAPSHOT:
    if _r.startswith("!"):
        _PARSED.append((tuple(_r[1:].split(".")), "exception"))
    elif _r.startswith("*."):
        _PARSED.append((tuple(_r.split(".")), "wildcard"))
    else:
        _PARSED.append((tuple(_r.split(".")), "exact"))


# ---------------------------------------------------------------- python
# golden-oracle mirror of the PSL algorithm (and of tldextract's behavior
# for unlisted TLDs: no implicit '*' rule)

_EXACT = {r for r, k in _PARSED if k == "exact"}
_WILD = {r for r, k in _PARSED if k == "wildcard"}       # ('*', 'ck')
_EXC = {r for r, k in _PARSED if k == "exception"}


def py_public_suffix(name: str) -> str | None:
    """Number of labels the public suffix of ``name`` spans, as the suffix
    string; None when no rule matches."""
    labels = name.lower().split(".")
    best = None  # (is_exception, n_labels)
    for k in range(1, min(len(labels), MAX_K) + 1):
        cand = tuple(labels[-k:])
        if cand in _EXC:
            return ".".join(cand[1:])  # exception wins immediately
        if cand in _EXACT or (("*",) + cand[1:]) in _WILD:
            if best is None or k > best:
                best = k
    return ".".join(labels[-best:]) if best else None


def py_registered_domain(name: str) -> str | None:
    """tldextract.extract(name).registered_domain (lower-cased); None when
    there is no suffix or no domain label left of it."""
    if not name:
        return None
    lower = name.lower()
    suffix = py_public_suffix(lower)
    if suffix is None:
        return None
    n_suffix = suffix.count(".") + 1
    labels = lower.split(".")
    if len(labels) <= n_suffix:
        return None  # the name IS a public suffix
    return ".".join(labels[-(n_suffix + 1):])


def py_fqdn(name: str) -> str | None:
    """tldextract.extract(name).fqdn: the name itself iff it has both a
    suffix and a domain label."""
    return name.lower() if py_registered_domain(name) else None


# ---------------------------------------------------------------- spark

def _dim(spark: SparkSession, k: int) -> DataFrame | None:
    """Rules whose match key has exactly k labels, as a broadcast dim:
    (psl_key, psl_suffix_labels). Exception rules match on their literal
    labels but yield a suffix one label shorter; wildcard rules match on
    the '*.'-key. Exceptions get priority via negative encoding resolved
    by the caller."""
    rows = []
    for labels, kind in _PARSED:
        if len(labels) != k:
            continue
        key = ".".join(labels)
        if kind == "exception":
            rows.append((key, -(k - 1)))  # negative = exception, wins
        else:
            rows.append((key, k))
    if not rows:
        return None
    return spark.createDataFrame(rows, "psl_key string, psl_suffix_labels int")


def with_registered_domain(
    df: DataFrame, name_col: str, out_col: str = "registered_domain"
) -> DataFrame:
    """Add ``out_col`` (and ``public_suffix``) computed from ``name_col``.

    MAX_K broadcast left joins (one per candidate depth) + one projection;
    no shuffle, no UDF — survives any input cardinality.
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
        dim = _dim(spark, k)
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
