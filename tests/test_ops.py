"""Unit checks for the training-data ops beyond the DuckDB oracle gate:
semantic properties (recall of planted duplicates) that a hash-compare
alone would not explain."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_embedding_neardup_finds_planted_pairs(spark, emb):
    """Every planted exact copy (vec_id+100000, cos = 1.0) is recovered;
    planted perturbed copies (vec_id+200000, cos ~ 0.996) are recovered
    at >= 90% recall (sign-LSH recall is probabilistic by construction:
    1-(1-cos_angle)^bits per band); no false pair below the threshold."""
    from iyp_spark.ops.dedup import embedding_neardup_pairs

    pairs = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_neardup_pairs(emb).collect()
    }
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]

    exact_expected = {(i, i + 100000) for i in ids if i % 5 == 0}
    missing_exact = exact_expected - set(pairs)
    assert not missing_exact, f"exact copies always collide: {missing_exact}"
    for p in exact_expected:
        # floor-trunc of dot/(n*n) lands at 0.999999 for identical vectors
        assert pairs[p] >= 0.999999

    near_expected = {(i, i + 200000) for i in ids if i % 7 == 0}
    found_near = near_expected & set(pairs)
    assert len(found_near) >= 0.9 * len(near_expected)
    for p in found_near:
        assert pairs[p] >= 0.99

    # precision is exact: the verify stage filters candidates by true cos
    assert all(c >= 0.99 for c in pairs.values())


def test_minhash_signatures_one_row_per_doc_band(spark):
    """The one-pass aggregation emits exactly n_bands signature rows per
    document (the shape the band-bucket join expects)."""
    from iyp_spark.ops.dedup import N_BANDS, minhash_signatures, shingles

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sig = minhash_signatures(shingles(docs))
    counts = sig.groupBy("doc_id").count().select("count").distinct().collect()
    assert [r["count"] for r in counts] == [N_BANDS]
