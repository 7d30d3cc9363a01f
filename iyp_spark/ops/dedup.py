"""Deduplication operators for web-scale corpora.

- exact:   hash-groupBy on a normalized content fingerprint
- MinHash+LSH: word-shingles → per-band min-hash signature → band-bucket
  self-join → candidate pairs (sub-quadratic; the scale path)
- n-gram Jaccard: exact similarity verification on candidate pairs
- SimHash: 16-bit bitwise-majority signature (Hamming-bucketable)

Engine-portability note: md5 is the shared hash (identical output in Spark
and DuckDB), so every signature here is oracle-checkable. At production
scale you would swap md5 for xxhash64 — one line per operator.

Scale analysis (10^12 docs): the only shuffles are (a) the groupBy building
per-(doc,band) minima — map-side partial aggregation applies — and (b) the
band-bucket join, whose key cardinality is ~n_bands × n_buckets, uniform by
construction (hash values), so no skew salting is needed; AQE handles any
residual imbalance from giant duplicate clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens_col, trunc4

N_BANDS = 8


def with_mutants(docs: DataFrame, exact_every: int = 5, near_every: int = 7) -> DataFrame:
    """Synthesize duplicates deterministically inside the query (the test
    corpus has no natural dups): exact copies for doc_id % exact_every == 0
    (id+10000), near-dups (tail-truncated) for doc_id % near_every == 0
    (id+20000)."""
    base = docs.select("doc_id", "text")
    exact = base.filter(F.col("doc_id") % exact_every == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    near = base.filter(F.col("doc_id") % near_every == 0).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.expr("substring(text, 1, greatest(length(text) - 40, 20))").alias("text"),
    )
    return base.unionByName(exact).unionByName(near)


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """Exact dedup: group by content hash, keep min doc_id (the canonical
    representative), report duplicate clusters."""
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    return (
        docs.select("doc_id", F.md5(norm).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_copies") > 1)
    )


def shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct word k-grams per document."""
    d = docs.select("doc_id", tokens_col().alias("toks"))
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("toks") - (k - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(F.col("toks"), i, k), " "),
    )
    return d.select("doc_id", F.explode(F.array_distinct(sh)).alias("sh"))


def minhash_signatures(docs: DataFrame | None = None, n_bands: int = N_BANDS,
                       k: int = 3, sh: DataFrame | None = None) -> DataFrame:
    """(doc_id, band, sig): per-band min-hash with r=2 rows per band —
    band b's signature is the CONCAT of two independent 16-bit minima,
    carved as 4-hex-char windows from a 64-char digest pool built from
    TWO md5 calls (md5('0:'+sh) || md5('1:'+sh)), so the per-shingle hash
    work stays 2 digests regardless of bands×rows (the hot map-side stage
    at corpus scale). r matters: with r=1 a pair at Jaccard s becomes an
    LSH candidate with prob 1-(1-s)^b — at b=8 even s=0.3 pairs collide
    53% of the time, and on template-heavy corpora the band join output
    explodes quadratically with false positives (measured 147k candidate
    pairs for a 6.7k-doc corpus). r=2 squares the per-band match prob to
    s^2 (s=0.9 → recall ~1-1e-6; s=0.3 → 7.7% candidate rate), collapsing
    the join output ~10× for free. Fixed-width lowercase hex means string
    MIN == numeric MIN, and md5+substr reproduce identically in DuckDB,
    keeping the oracle hash-exact; a 16-bit min-statistic adds only ~1e-3
    accidental per-row collision, squared per band.

    Formulation: explode shingles, hash on the exploded rows, then ONE
    groupBy computing all n_bands minima as conditional aggregates. The
    aggregation is map-side partial (hash-combine before the exchange), so
    the shuffle carries ONE row per document — the explode's ~n_tokens×
    row amplification never crosses the wire. A fully map-side variant
    (per-row higher-order `transform`+`array_min`, zero shuffle) was
    MEASURED 2-3× SLOWER despite the cleaner shuffle story: Spark's
    higher-order array expressions are CodegenFallback — every lambda
    element evaluation is interpreted with boxing — while the exploded
    formulation keeps md5 and the min-aggregates inside whole-stage
    codegen. CPU dominates a tiny per-doc shuffle at any scale, so
    codegen wins; fenced by test_minhash_plan_single_md5_pass. The
    trailing stack() restores the (doc_id, band, sig) long shape the
    band-bucket join expects.

    ``sh`` lets a caller thread a precomputed (doc_id, sh) DataFrame
    through, so pipelines that need shingles for BOTH signatures and
    Jaccard verification (jaccard_verified_pairs, canonical_docs)
    materialize the tokenize+explode stage exactly once."""
    if sh is None:
        sh = shingles(docs, k=k)
    pool = F.concat(
        F.md5(F.concat_ws(":", F.lit(0), F.col("sh"))),
        F.md5(F.concat_ws(":", F.lit(1), F.col("sh"))),
    )
    mins = sh.withColumn("_h", pool).groupBy("doc_id").agg(
        *[
            F.min(F.substring("_h", 8 * b + 1 + 4 * half, 4)).alias(f"m{b}_{half}")
            for b in range(n_bands)
            for half in (0, 1)
        ]
    )
    return mins.select(
        "doc_id",
        F.expr(
            "stack(%d, %s) as (band, sig)"
            % (
                n_bands,
                ", ".join(f"{b}, concat(m{b}_0, m{b}_1)" for b in range(n_bands)),
            )
        ),
    )


def lsh_candidate_pairs(docs: DataFrame | None = None,
                        max_bucket: int | None = None,
                        sh: DataFrame | None = None) -> DataFrame:
    """MinHash-LSH near-dup candidates: docs sharing any band signature.

    ``max_bucket`` bounds the self-join's worst case: a bucket of n docs
    emits n·(n-1)/2 pairs, so one degenerate hot bucket — boilerplate
    pages, empty-ish docs whose shingle sets collapse to the same minima —
    turns the join quadratic at corpus scale (AQE skew-splitting spreads
    the *work* across tasks but cannot shrink the *output*). Buckets
    larger than the cap are dropped entirely: a giant bucket is an
    exact/boilerplate cluster that `exact_dedup_groups` already catches at
    linear cost, and near-dup recall for it is preserved by the other
    n_bands-1 bands anyway. The bucket-size count is a window over the
    same (band, sig) keys the join shuffles on, so AQE reuses one
    exchange — the cap costs no extra shuffle. Default None = exhaustive
    (the oracle-checked semantics); at 100 TB set a few thousand."""
    sig = minhash_signatures(docs, sh=sh)
    if max_bucket is not None:
        bw = Window.partitionBy("band", "sig")
        sig = (
            sig.withColumn("_bn", F.count(F.lit(1)).over(bw))
            .filter(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


def jaccard_verified_pairs(docs: DataFrame | None = None,
                           threshold: float = 0.5,
                           sh: DataFrame | None = None) -> DataFrame:
    """n-gram Jaccard verification of LSH candidates: true |A∩B| / |A∪B|
    over distinct word 3-gram sets, filtered to >= threshold.

    The shingle DataFrame feeds THREE consumers — the minhash signatures
    behind the candidate join, the per-doc set sizes, and the
    intersection join itself — so it is computed once and persisted
    (MEMORY_AND_DISK). Tokenize+explode over the full corpus is the
    dominant map cost of the dedup pipeline; recomputing it per consumer
    would double-scan the heaviest stage at 100 TB (at that scale, stage
    the shingle table to the lake instead of caching — same one-pass
    shape, swap ``persist`` for a parquet write + re-read)."""
    if sh is None:
        from pyspark import StorageLevel

        # repartition by doc_id BEFORE persisting: the corpus scan may be
        # one task (single-row-group file), and a 1-partition cache
        # serializes every downstream consumer's md5/join work; doc_id
        # partitioning is also what the set-size aggregate and the
        # intersection join key on
        sh = (shingles(docs).repartition(F.col("doc_id"))
              .persist(StorageLevel.MEMORY_AND_DISK))
    # materialize the candidate pairs once — they feed both the id
    # pre-filter and the intersection join, and recomputing them would
    # run the signature+band-join pipeline twice
    cand = lsh_candidate_pairs(sh=sh).localCheckpoint(eager=False)
    # §3.2 pre-filter: only candidate docs' shingles participate in the
    # verification; semi-join the (big) shingle table down to them BEFORE
    # the intersection exchange instead of shuffling every doc's shingles
    # (the per-doc set sizes are only ever read for candidate pairs, so
    # computing them on the filtered table is value-identical)
    cand_ids = (
        cand.select(F.col("id_a").alias("doc_id"))
        .unionByName(cand.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    sh_cand = sh.join(cand_ids, "doc_id", "leftsemi")
    sizes = sh_cand.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh_cand.alias("a")
    b = sh_cand.alias("b")
    inter = (
        cand.join(a, cand.id_a == F.col("a.doc_id"))
        .join(b, (cand.id_b == F.col("b.doc_id")) & (F.col("a.sh") == F.col("b.sh")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, inter.id_a == F.col("sa.doc_id"))
        .join(sb, inter.id_b == F.col("sb.doc_id"))
        .select(
            "id_a", "id_b",
            trunc4(
                F.col("n_inter")
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """SimHash: per bit position i (1..bits), majority vote over the token
    multiset of ±1 keyed on the i-th hex digit of md5(token); signature =
    the assembled integer. Near-dups land within small Hamming distance.

    Formulation: one token explode, ONE groupBy with `bits` conditional
    ±1 sums (bit i's vote reads the i-th hex digit of the shared `_h`
    digest column), then the signature assembles from the wide row. The
    md5 is evaluated once per token row — the Project producing `_h` sits
    below the aggregate and Catalyst does not inline it into the `bits`
    sum expressions (plan-fenced) — and the aggregation is map-side
    partial, so the shuffle carries one row per document. Two rejected
    formulations, both measured: (a) per-bit explode ×bits + two groupBys
    (r3) — `bits`× the aggregate input rows for no benefit; (b) fully
    map-side higher-order `filter`+`size` over an in-row digest array,
    zero shuffle — 11× slower, because Spark's higher-order array
    expressions are CodegenFallback (interpreted per element) while this
    version stays inside whole-stage codegen end-to-end. Zero-token docs
    produce no exploded rows and are absent from the result (a majority
    vote over nothing is meaningless)."""
    toks = docs.select(
        "doc_id", F.explode(tokens_col()).alias("t")
    ).select("doc_id", F.md5("t").alias("_h"))
    # vote for bit i = "is hex digit i in 89abcdef" — over lowercase hex
    # that is exactly one ordinal comparison, digit >= '8' ('8','9' <
    # 'a'..'f' in ASCII and '0'..'7' sort below '8'), so each of the
    # `bits` conditional sums costs one substring + one compare instead
    # of an 8-way isin scan per token row
    agg = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.substring("_h", i, 1) >= "8", 1).otherwise(-1)
            ).alias(f"s{i}")
            for i in range(1, bits + 1)
        ]
    )
    votes = [
        F.when(F.col(f"s{i}") > 0, F.lit(1 << (i - 1))).otherwise(F.lit(0))
        for i in range(1, bits + 1)
    ]
    total = votes[0]
    for v in votes[1:]:
        total = total + v
    return agg.select("doc_id", total.cast("long").alias("simhash"))


def canonical_docs(docs: DataFrame) -> DataFrame:
    """Cluster canonicalization — the *apply* step of dedup. The pair
    emitters above (exact fingerprint groups, verified near-dup pairs)
    only report evidence; a training pipeline needs each document mapped
    to ONE canonical representative so the dedup'd corpus is a simple
    filter (``doc_id == canonical_id``). Duplicate relations are not
    transitive-closed by the pair emitters (A≈B and B≈C may be found
    without A≈C), so the mapping is connected components over the union
    of exact-dup edges and verified near-dup edges; the canonical id is
    the component minimum — the same min-label convention the KG side
    uses for alias canonicalization (graph/canonicalize.py, SURVEY §J10).

    Returns (doc_id, canonical_id, cluster_size) for every corpus doc —
    unique docs map to themselves with cluster_size 1.

    Scale: the CC input is only the *duplicate-evidence* edges (a few %
    of the corpus even at heavy duplication), never all docs; each CC
    round is one equi-join + one min-agg over that small edge set, and
    alias/dup chains are short (2-4 rounds to fixpoint). The final map
    back onto the corpus is a left join on doc_id — broadcastable
    whenever dup clusters are rare, shuffle-hash otherwise.
    """
    from pyspark import StorageLevel

    from ..graph.canonicalize import connected_components

    corpus = with_mutants(docs)
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    fp = corpus.select("doc_id", F.md5(norm).alias("fp"))
    # min-root per fingerprint as a WINDOW over the one fp pass: the old
    # groupBy + self-join evaluated the corpus md5 scan on both join
    # sides (two full fingerprint passes + a join for one column)
    wfp = Window.partitionBy("fp")
    exact_edges = (
        fp.withColumn("root", F.min("doc_id").over(wfp))
        .filter(F.col("doc_id") != F.col("root"))
        .select(F.col("doc_id").alias("src"), F.col("root").alias("dst"))
    )
    # ONE shingle materialization for the whole pipeline: persisted here,
    # threaded through signatures, candidate join, and Jaccard verification
    # (this stage was recomputed twice before — it dominated the query).
    # Repartitioned by doc_id first: the corpus scan is one task on
    # single-row-group inputs and a 1-partition cache serializes every
    # consumer's hashing/join work.
    sh = (shingles(corpus).repartition(F.col("doc_id"))
          .persist(StorageLevel.MEMORY_AND_DISK))
    near_edges = jaccard_verified_pairs(sh=sh).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    comp = connected_components(exact_edges.unionByName(near_edges))
    mapped = (
        corpus.select("doc_id")
        .join(comp, corpus.doc_id == comp.node_id, "left")
        .select(
            "doc_id",
            F.coalesce("component_id", "doc_id").alias("canonical_id"),
        )
    )
    # cluster sizes from the (small) component labeling alone, not from a
    # second evaluation of `mapped`: every CC node is a corpus doc (the
    # evidence edges are built from corpus ids), so the member count per
    # canonical id is the component's node count, and docs absent from
    # the labeling are singletons (size 1 via the coalesce). The old
    # `mapped.groupBy(...)` + self-join computed the corpus-wide mapping
    # twice.
    sizes = comp.groupBy(F.col("component_id").alias("canonical_id")).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return mapped.join(sizes, "canonical_id", "left").select(
        "doc_id", "canonical_id",
        F.coalesce("cluster_size", F.lit(1).cast("long")).alias("cluster_size"),
    )


def contamination(docs: DataFrame, eval_mod: int = 97, k: int = 5) -> DataFrame:
    """Train/eval decontamination: flag training documents that share any
    word k-gram with the (small) held-out eval split — the standard
    benchmark-leakage check before a corpus feeds a training run. The
    eval split here is deterministic (base doc_id % eval_mod == 0); the
    training side is the mutant-augmented corpus minus those exact ids,
    so planted copies of eval docs are guaranteed leaks the op must find.

    Returns (doc_id, n_shared_ngrams) for contaminated training docs only.

    Scale: eval benchmark suites are tiny next to a 10^12-doc corpus, so
    the eval k-gram set is broadcast and the join is map-side — the only
    shuffle is the final per-doc count, map-side-combinable. k=5 keeps
    incidental same-topic collisions near zero while catching verbatim
    spans.
    """
    eval_docs = docs.filter(F.col("doc_id") % eval_mod == 0)
    # eval n-grams come straight from the (tiny) eval split — shingling
    # the full corpus twice (once per join side) would double the
    # pipeline's only expensive stage
    eval_ngrams = shingles(eval_docs, k=k).select("sh").distinct()
    eval_ids = eval_docs.select("doc_id")
    train = shingles(with_mutants(docs), k=k).join(
        F.broadcast(eval_ids), "doc_id", "left_anti"
    )
    return (
        train.join(F.broadcast(eval_ngrams), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )


# ---------------------------------------------------------------------
# Embedding-cosine near-duplicate detection (sign-LSH over hyperplanes)
# ---------------------------------------------------------------------
EMB_BANDS = 2
EMB_BITS = 8  # bits per band; bucket space = 2^EMB_BITS per band


def emb_with_mutants(emb: DataFrame, exact_every: int = 5,
                     near_every: int = 7) -> DataFrame:
    """Synthesize duplicate *embeddings* inside the query (the synthetic
    vectors are i.i.d. — no natural near-pairs): exact copies for
    vec_id % exact_every == 0 (id+100000) and perturbed copies
    (x + 0.02·sign(x), ≈0.012 rad ⇒ cos ≈ 0.99993) for
    vec_id % near_every == 0 (id+200000). All math in double so the
    DuckDB oracle reproduces it bit-for-bit."""
    base = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("vec")
    )
    exact = base.filter(F.col("vec_id") % exact_every == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "vec"
    )
    near = base.filter(F.col("vec_id") % near_every == 0).select(
        (F.col("vec_id") + 200000).alias("vec_id"),
        F.transform(
            "vec", lambda x: x + F.when(x >= 0, F.lit(0.02)).otherwise(F.lit(-0.02))
        ).alias("vec"),
    )
    return base.unionByName(exact).unionByName(near)


def _emb_projection(b: int) -> F.Column:
    """Integer-quantized projection of ``vec`` onto deterministic ±1
    hyperplane #b. The hyperplane sign for (dim i, bit b) is a middle bit
    of an LCG — reproducible in any engine with 64-bit integer + double
    arithmetic. Each term is floor-quantized to 1e-6 BEFORE summation so
    the sum is an exact integer — float addition is not associative, and
    Spark's fold order differs from DuckDB's SUM order; integer addition
    makes the bucket keys engine-independent."""
    return F.expr(
        f"aggregate(transform(vec, (x, i) -> "
        f"  CAST(FLOOR(x * (CASE WHEN CAST(FLOOR((1103515245L*(i + 97*{b}) + 12345) / 65536) AS BIGINT) % 2 = 0 "
        f"       THEN 1.0D ELSE -1.0D END) * 1000000.0D) AS BIGINT)), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


def embedding_neardup_pairs(emb: DataFrame,
                            threshold: float = 0.99,
                            max_bucket: int | None = None) -> DataFrame:
    """Embedding-cosine near-dup: sign-LSH (random-hyperplane) bucketing →
    band-bucket self-join for candidates → exact cosine verification.

    Scale path (10^12 vectors): the projections are per-row map work (no
    shuffle, whole-stage codegen); the only shuffle is the band-bucket
    equi-join whose key space is EMB_BANDS × 2^EMB_BITS uniform buckets —
    widen EMB_BITS with corpus size to keep buckets O(rows/2^bits). This is
    sub-quadratic vs the O(N²) brute-force cosine join; recall is the
    standard (1-(1-cos^bits)^bands) LSH trade and the verify stage makes
    precision exact."""
    n_bits = EMB_BANDS * EMB_BITS
    sig = emb_with_mutants(emb).select(
        "vec_id", "vec",
        *[(_emb_projection(b) >= 0).cast("int").alias(f"s{b}") for b in range(n_bits)],
    )
    band_cols = [
        sum(
            F.col(f"s{g * EMB_BITS + j}") * F.lit(1 << j)
            for j in range(EMB_BITS)
        ).cast("long").alias(f"band{g}")
        for g in range(EMB_BANDS)
    ]
    sig = sig.select("vec_id", "vec", *band_cols)
    buckets = sig.select(
        "vec_id",
        F.expr(
            "stack(%d, %s) as (band, bucket)"
            % (EMB_BANDS,
               ", ".join(f"{g}, band{g}" for g in range(EMB_BANDS)))
        ),
    )
    if max_bucket is not None:
        # same quadratic-output bound as lsh_candidate_pairs: one hot
        # bucket (e.g. a zero-vector cluster that every hyperplane signs
        # identically) emits n²/2 candidate rows; the count-window runs on
        # the join's own keys, so the cap adds no shuffle
        bw = Window.partitionBy("band", "bucket")
        buckets = (
            buckets.withColumn("_bn", F.count(F.lit(1)).over(bw))
            .filter(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
    cand = (
        buckets.alias("a")
        .join(buckets.alias("b"),
              (F.col("a.band") == F.col("b.band"))
              & (F.col("a.bucket") == F.col("b.bucket"))
              & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()
    )
    n = sig.select(
        "vec_id", "vec",
        F.sqrt(
            F.aggregate(
                F.zip_with("vec", "vec", lambda x, y: x * y),
                F.lit(0.0), lambda acc, x: acc + x,
            )
        ).alias("nrm"),
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        cand.join(n.select(F.col("vec_id").alias("id_a"),
                           F.col("vec").alias("va"), F.col("nrm").alias("na")),
                  "id_a")
        .join(n.select(F.col("vec_id").alias("id_b"),
                       F.col("vec").alias("vb"), F.col("nrm").alias("nb")),
              "id_b")
        .withColumn("cos", dot / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= threshold)
        .select(
            "id_a", "id_b",
            (F.floor(F.col("cos") * 1000000) / 1000000).alias("cos"),
        )
    )


def dup_ngram_fraction(docs: DataFrame, n: int = 3) -> DataFrame:
    """Cross-document duplicated n-gram fraction — the corpus-level twin of
    the within-doc repetition stats (ops.text.repetition_stats): for each
    document, the share of its DISTINCT word n-grams that also occur in at
    least one OTHER document. This is the quality/contamination signal
    large-corpus filtering pipelines threshold on (a high shared-n-gram
    share marks boilerplate / templated / copied text that per-pair MinHash
    may miss when no single pair crosses the Jaccard bar).

    Returns (doc_id, n_ngrams, n_shared, dup_bp) where dup_bp =
    (n_shared * 10000) div n_ngrams — basis points, BIGINT-exact in any
    engine. Docs with fewer than ``n`` tokens emit nothing.

    Scale: n-grams are assembled map-side from an in-row sequence (no
    self-join); the per-n-gram document count is ONE map-side-combinable
    groupBy on the n-gram (distinct-per-doc first, also map-side
    partial); the membership join keys on the n-gram string and the final
    per-doc aggregate is combinable. Hot n-grams (stopword runs) are
    bounded because the doc-count side has ONE row per n-gram — the join
    fans out only to the documents that contain it, which is the output
    size anyway; AQE skew-split handles a pathological boilerplate
    n-gram."""
    toks = docs.select("doc_id", tokens_col().alias("toks")).filter(
        F.size("toks") >= n
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(toks) - {n}), "
                f"i -> concat_ws(' ', {', '.join(f'toks[i + {j}]' for j in range(n))}))"
            )
        ).alias("g"),
    ).distinct()
    doc_count = grams.groupBy("g").agg(F.count(F.lit(1)).alias("nd"))
    return (
        grams.join(doc_count, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum((F.col("nd") >= 2).cast("long")).alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_ngrams",
            "n_shared",
            F.expr("(n_shared * 10000L) div n_ngrams").alias("dup_bp"),
        )
    )
