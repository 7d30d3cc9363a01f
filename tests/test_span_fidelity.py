"""Span-sequence invariant (BASELINE.json input_hint): the parse stage must
preserve per-document span sequence (kind, text, media_ref, order) exactly —
evidenced by round-tripping the exploded span table back into documents."""

from __future__ import annotations

from pyspark.sql import functions as F

from iyp_spark.fixtures import all_docs


def exploded_span_table(df):
    """The engine's canonical exploded view of documents — every downstream
    parse reads from this (or from the array directly); it must be lossless."""
    return df.select(
        "doc_id",
        F.posexplode("spans").alias("pos", "span"),
    ).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
        "pos",
    )


def test_span_roundtrip_exact(store, corpus):
    docs = store.read_documents()
    flat = exploded_span_table(docs)

    # position within array must equal the recorded offset
    assert flat.filter(F.col("pos") != F.col("offset")).count() == 0

    # reconstruct the array and diff against the original, both directions
    rebuilt = (
        flat.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("offset", "kind", "text", "media_ref"))
            ).alias("spans_r")
        )
        .select(
            "doc_id",
            F.transform(
                "spans_r",
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ).alias("spans"),
        )
    )
    orig = docs.select("doc_id", "spans")
    assert orig.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(orig).count() == 0


def test_corpus_matches_fixture_docs(store, corpus):
    """The parquet round-trip of the generator is lossless vs the in-memory
    fixture docs (kind, text, media_ref, offset per doc)."""
    expected = {
        d.doc_id: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d.spans]
        for d in all_docs(0.3)
    }
    got = {
        r["doc_id"]: [tuple(s) for s in r["spans"]]
        for r in store.read_documents().collect()
    }
    assert got == expected
