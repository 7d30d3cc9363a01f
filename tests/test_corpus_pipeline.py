"""End-to-end corpus pipeline: the four apply-steps composed the way a
training-data build actually runs them — dedup canonicalization →
benchmark decontamination → stratified sampling → sequence packing.
Each op has its own unit tests and DuckDB oracle; this test fences the
COMPOSITION: stages accept each other's outputs, nothing is silently
dropped or duplicated between stages, and the whole chain is
deterministic end-to-end (two runs produce identical batches — the
property that makes a 10^12-doc corpus build resumable/reproducible)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _run_chain(spark):
    from iyp_spark.ops.dedup import canonical_docs, contamination
    from iyp_spark.ops.packing import pack_sequences
    from iyp_spark.ops.sampling import stratified_balanced_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # 1. dedup apply: keep only canonical representatives
    mapping = canonical_docs(docs)
    keep = mapping.filter(F.col("doc_id") == F.col("canonical_id")).select(
        "doc_id"
    )
    dedup = docs.join(keep, "doc_id")

    # 2. decontamination: drop training docs sharing 5-grams with the
    #    deterministic eval split
    leaks = contamination(docs).select("doc_id")
    clean = dedup.join(leaks, "doc_id", "left_anti")

    # 3. balanced stratified sample over language
    sample = stratified_balanced_sample(clean, strata_col="lang")

    # 4. pack the sampled docs into fixed-budget training sequences per
    #    source shard
    packed = pack_sequences(
        clean.join(sample.select("doc_id"), "doc_id"),
        budget=128,
        pack_col="source",
    )
    return docs, mapping, dedup, clean, sample, packed


def test_corpus_to_training_batches_composition(spark):
    docs, mapping, dedup, clean, sample, packed = _run_chain(spark)
    n_docs = docs.count()

    # the mapping covers the whole mutant-augmented corpus, and every
    # planted EXACT mutant (id+10000) collapses onto a smaller canonical
    # id — so no exact mutant is ever its own representative (near-dup
    # mutants at id+20000 only collapse when Jaccard verification passes,
    # which short docs legitimately fail)
    assert mapping.count() > n_docs
    mutant_roots = mapping.filter(
        (F.col("doc_id") >= 10000) & (F.col("doc_id") < 20000)
        & (F.col("doc_id") == F.col("canonical_id"))
    )
    assert mutant_roots.count() == 0

    # dedup keeps a subset of the original docs, one per cluster
    n_dedup = dedup.count()
    assert 0 < n_dedup <= n_docs
    assert dedup.select("doc_id").distinct().count() == n_dedup

    # decontamination only removes rows, and none of the EVAL split ids
    # themselves are flagged (they are held out, not contaminated)
    assert clean.count() <= n_dedup
    from iyp_spark.ops.dedup import contamination

    flagged = {r["doc_id"] for r in contamination(docs).collect()}
    assert not any(i % 97 == 0 for i in flagged)

    # the sample is exactly balanced: every language keeps the same count
    per_lang = {
        r["lang"]: r["n"]
        for r in sample.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert len(set(per_lang.values())) == 1
    assert min(per_lang.values()) > 0

    # packing loses and invents nothing: one output row per sampled doc,
    # sequence numbering starts at 0 in every pack partition and is
    # non-decreasing in doc-id order (the deterministic packing order)
    assert packed.count() == sample.count()
    firsts = (
        packed.groupBy("source").agg(F.min("seq_id").alias("s0")).collect()
    )
    assert all(r["s0"] == 0 for r in firsts)
    rows = packed.orderBy("source", "doc_id").collect()
    last = {}
    for r in rows:
        assert r["seq_id"] >= last.get(r["source"], 0)
        last[r["source"]] = r["seq_id"]


def test_corpus_to_training_batches_deterministic(spark):
    *_, sample1, packed1 = _run_chain(spark)
    *_, sample2, packed2 = _run_chain(spark)
    s1 = sorted((r["doc_id"], r["lang"], r["rn"]) for r in sample1.collect())
    s2 = sorted((r["doc_id"], r["lang"], r["rn"]) for r in sample2.collect())
    assert s1 == s2
    p1 = sorted(
        (r["source"], r["doc_id"], r["n_tokens"], r["seq_id"])
        for r in packed1.collect()
    )
    p2 = sorted(
        (r["source"], r["doc_id"], r["n_tokens"], r["seq_id"])
        for r in packed2.collect()
    )
    assert p1 == p2
