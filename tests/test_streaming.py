"""Structured Streaming ingest: exactly-once file-arrival semantics and
incremental triple construction (iyp_spark/streaming.py)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from iyp_spark.fixtures import GENERATORS, docs_to_rows
from iyp_spark.schema import DOCUMENTS_SCHEMA
from iyp_spark.store import GraphStore
from iyp_spark.streaming import incremental_triples, ingest_documents


def _drop(spark, drop_dir, docs, part):
    """Land one flat parquet file in the drop dir (file-arrival pattern)."""
    import glob

    tmp = tempfile.mkdtemp(prefix="iyp_drop_stage_")
    df = spark.createDataFrame(docs_to_rows(docs), DOCUMENTS_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(drop_dir, exist_ok=True)
    src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.move(src, os.path.join(drop_dir, f"{part}.parquet"))
    shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_ingest_exactly_once(spark):
    base = tempfile.mkdtemp(prefix="iyp_stream_")
    try:
        drop = os.path.join(base, "drop")
        cp = os.path.join(base, "cp")
        store = GraphStore(spark, os.path.join(base, "lake"))
        all_docs = GENERATORS["bgpkit.pfx2asn"](0.1)
        half = len(all_docs) // 2

        _drop(spark, drop, all_docs[:half], "part1")
        ingest_documents(spark, drop, store, cp)
        n1 = store.read_documents().count()
        assert n1 == half

        # second drop: only the NEW file is picked up
        _drop(spark, drop, all_docs[half:], "part2")
        ingest_documents(spark, drop, store, cp)
        n2 = store.read_documents().count()
        assert n2 == len(all_docs)

        # re-run with nothing new: no duplicates (exactly-once per file)
        ingest_documents(spark, drop, store, cp)
        assert store.read_documents().count() == len(all_docs)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_incremental_triple_construction(spark):
    from iyp_spark.crawlers import REGISTRY

    base = tempfile.mkdtemp(prefix="iyp_stream2_")
    try:
        drop = os.path.join(base, "drop")
        cp = os.path.join(base, "cp")
        store = GraphStore(spark, os.path.join(base, "lake"))
        docs = GENERATORS["bgpkit.pfx2asn"](0.1)
        half = len(docs) // 2

        _drop(spark, drop, docs[:half], "part1")
        incremental_triples(spark, store, REGISTRY["bgpkit.pfx2asn"], drop, cp)
        c1 = store.read_triples().count()
        assert c1 > 0

        _drop(spark, drop, docs[half:], "part2")
        incremental_triples(spark, store, REGISTRY["bgpkit.pfx2asn"], drop, cp)
        c2 = store.read_triples().count()
        assert c2 > c1

        # triples are well-formed ORIGINATE edges
        preds = {r["pred"] for r in store.read_triples().select("pred").distinct().collect()}
        assert preds == {"ORIGINATE"}
        # node dictionary merged incrementally too
        assert store.read_nodes("AS").count() > 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_stateful_first_seen_dedup_across_runs(spark):
    """applyInPandasWithState cross-batch dedup: a fingerprint emitted in
    run 1 is suppressed in run 2 (per-key state survives restart via the
    stream checkpoint); only genuinely new content is emitted."""
    from iyp_spark.streaming import first_seen_documents

    base = tempfile.mkdtemp(prefix="iyp_stream3_")
    try:
        drop = os.path.join(base, "drop")
        cp = os.path.join(base, "cp")
        out = os.path.join(base, "firstseen")
        docs = GENERATORS["bgpkit.pfx2asn"](0.1)
        a, b = docs[:30], docs[30:60]

        # run 1: fresh docs + an exact duplicate of a[0] under another id
        import copy

        dup = copy.deepcopy(a[0])
        dup.doc_id = a[0].doc_id + "_copy"
        _drop(spark, drop, a + [dup], "part1")
        first_seen_documents(spark, drop, out, cp)
        out1 = spark.read.parquet(out)
        fps1 = {r["fp"] for r in out1.collect()}
        # the duplicate collapses into a[0]'s fingerprint
        assert out1.count() == len(fps1) == 30

        # run 2: re-drop duplicates of run-1 content plus new docs
        dups2 = []
        for d in a[:5]:
            d2 = copy.deepcopy(d)
            d2.doc_id = d.doc_id + "_again"
            dups2.append(d2)
        _drop(spark, drop, b + dups2, "part2")
        first_seen_documents(spark, drop, out, cp)
        out2 = spark.read.parquet(out)
        fps2 = {r["fp"] for r in out2.collect()}
        # only the 30 new fingerprints were added; replayed content silent
        assert out2.count() == 60
        assert fps1 < fps2 and len(fps2) == 60
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_watermark_windowed_aggregation_drops_late_events(spark):
    """Event-time windows finalize when the watermark (max event time - 2h)
    passes them; a finalized window is emitted exactly once and an event
    arriving behind the watermark is dropped, not re-aggregated."""
    import datetime as dt

    from iyp_spark.streaming import EVENTS_SCHEMA, windowed_event_counts

    base = tempfile.mkdtemp(prefix="iyp_stream4_")

    def t(h, m):
        return dt.datetime(2026, 1, 1, h, m)

    def drop_events(rows, part):
        df = spark.createDataFrame(
            [(i, ts, 1, "click", 1.0, "{}") for i, ts in enumerate(rows)],
            EVENTS_SCHEMA,
        )
        stage = os.path.join(base, f"stage_{part}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        import glob

        os.makedirs(os.path.join(base, "drop"), exist_ok=True)
        shutil.move(
            glob.glob(os.path.join(stage, "part-*.parquet"))[0],
            os.path.join(base, "drop", f"{part}.parquet"),
        )

    def run():
        windowed_event_counts(
            spark, os.path.join(base, "drop"), os.path.join(base, "out"),
            os.path.join(base, "cp"),
        )
        out = os.path.join(base, "out")
        if not [f for f in os.listdir(out) if f.endswith(".parquet")]:
            return {}
        return {
            (r["win_start"].hour, r["event_type"]): r["n_events"]
            for r in spark.read.parquet(out).collect()
        }

    try:
        # run 1: hours 0 (3 events) and 1 (1 event); nothing finalized yet
        drop_events([t(0, 10), t(0, 20), t(0, 40), t(1, 30)], "p1")
        assert run() == {}

        # run 2: an event at 05:00 advances the watermark to 03:00,
        # finalizing the hour-0 and hour-1 windows
        drop_events([t(5, 0)], "p2")
        assert run() == {(0, "click"): 3, (1, "click"): 1}

        # run 3: a late event at 00:20 (behind the 03:00 watermark) is
        # dropped; 08:00 advances the watermark to 06:00, finalizing the
        # 05:00 window. Hour 0 is NOT re-emitted or re-counted.
        drop_events([t(0, 20), t(8, 0)], "p3")
        assert run() == {(0, "click"): 3, (1, "click"): 1, (5, "click"): 1}
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_compact_triples_preserves_rows_and_shrinks_files(spark):
    """Lake maintenance: many micro-batch appends leave one small file per
    batch; compact_triples must rewrite the partition to the computed file
    count (1 here — tiny bytes), preserve the row multiset EXACTLY, leave
    other partitions untouched, and be idempotent."""
    from pyspark.sql import functions as F

    from iyp_spark.schema import TRIPLES_SCHEMA

    base = tempfile.mkdtemp(prefix="iyp_compact_")
    try:
        store = GraphStore(spark, os.path.join(base, "lake"))
        ref = F.struct(
            F.lit("crawlerA").alias("reference_name"),
            F.lit("org").alias("reference_org"),
            F.lit("u").alias("reference_url_data"),
            F.lit(None).cast("string").alias("reference_url_info"),
            F.lit("2024-01-01T00:00:00Z").alias("reference_time_fetch"),
            F.lit("2024-01-01T00:00:00Z").alias("reference_time_modification"),
        )

        def batch(lo, hi):
            return spark.range(lo, hi).select(
                F.col("id").alias("subj_id"), F.lit("ORIGINATE").alias("pred"),
                (F.col("id") + 10_000).alias("obj_id"),
                F.lit("AS").alias("subj_label"),
                F.col("id").cast("string").alias("subj_key"),
                F.lit("Prefix").alias("obj_label"),
                F.col("id").cast("string").alias("obj_key"),
                F.lit(None).cast("map<string,string>").alias("props"),
                ref.alias("reference"),
            )

        for b in range(6):
            store.append_triples_batch("crawlerA", batch(b * 10, b * 10 + 10), b)
        store.replace_triples("crawlerB", batch(0, 5).withColumn(
            "reference", F.struct(
                F.lit("crawlerB").alias("reference_name"),
                *[F.col(f"reference.{f}").alias(f)
                  for f in ("reference_org", "reference_url_data",
                            "reference_url_info", "reference_time_fetch",
                            "reference_time_modification")])))

        before_rows = sorted(
            (r["subj_id"], r["obj_id"])
            for r in store.read_triples("crawlerA").collect())
        assert len(before_rows) == 60

        n_before, n_after = store.compact_triples("crawlerA")
        assert n_before >= 6 and n_after == 1, (n_before, n_after)
        after_rows = sorted(
            (r["subj_id"], r["obj_id"])
            for r in store.read_triples("crawlerA").collect())
        assert after_rows == before_rows
        # other partition untouched; compaction is idempotent
        assert store.read_triples("crawlerB").count() == 5
        again = store.compact_triples("crawlerA")
        assert again == (1, 1)
        # absent partition: graceful no-op
        assert store.compact_triples("nope") == (0, 0)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_iceberg_rewrite_data_files_sql_text(spark):
    """The catalog-side compaction statement (unit-testable text)."""
    from iyp_spark.store_iceberg import rewrite_data_files_sql

    sql = rewrite_data_files_sql("lake", "lake.iyp.triples", "crawlerA",
                                 target_file_bytes=1024)
    assert sql.startswith("CALL lake.system.rewrite_data_files(")
    assert "table => 'lake.iyp.triples'" in sql
    assert "'target-file-size-bytes', '1024'" in sql
    assert "reference_name" in sql
    # unscoped: whole-table compaction has no where clause
    assert "where" not in rewrite_data_files_sql("lake", "lake.iyp.triples")


def test_session_windows_merge_and_finalize(spark):
    """Session windows: an event within the gap EXTENDS the open session —
    across micro-batches — and a session is emitted exactly once, when the
    watermark passes last-event + gap."""
    import datetime as dt
    import glob

    from iyp_spark.streaming import EVENTS_SCHEMA, sessionized_user_activity

    base = tempfile.mkdtemp(prefix="iyp_stream5_")

    def t(h, m):
        return dt.datetime(2026, 1, 1, h, m)

    def drop_events(rows, part):
        df = spark.createDataFrame(
            [(i, ts, uid, "click", 1.0, "{}") for i, (ts, uid) in enumerate(rows)],
            EVENTS_SCHEMA,
        )
        stage = os.path.join(base, f"stage_{part}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        os.makedirs(os.path.join(base, "drop"), exist_ok=True)
        shutil.move(
            glob.glob(os.path.join(stage, "part-*.parquet"))[0],
            os.path.join(base, "drop", f"{part}.parquet"),
        )

    def run():
        sessionized_user_activity(
            spark, os.path.join(base, "drop"), os.path.join(base, "out"),
            os.path.join(base, "cp"),
        )
        out = os.path.join(base, "out")
        if not [f for f in os.listdir(out) if f.endswith(".parquet")]:
            return {}
        return {
            (r["user_id"], r["sess_start"].strftime("%H:%M"),
             r["sess_end"].strftime("%H:%M")): r["n_events"]
            for r in spark.read.parquet(out).collect()
        }

    try:
        # run 1: user 1 starts a session at 00:00; nothing finalized
        drop_events([(t(0, 0), 1)], "p1")
        assert run() == {}

        # run 2: 00:10 is inside the 30-min gap -> MERGES into the open
        # session (cross-batch state), extending its end to 00:40; a
        # 05:00 event (user 2) advances the watermark to 03:00, which
        # passes 00:40 -> user 1's session emits once with BOTH events
        drop_events([(t(0, 10), 1), (t(5, 0), 2)], "p2")
        assert run() == {(1, "00:00", "00:40"): 2}

        # run 3: 09:00 advances the watermark to 07:00, finalizing user
        # 2's session; a late 00:05 event (behind the watermark) is
        # dropped — the emitted user-1 session is NOT reopened or re-sent
        drop_events([(t(0, 5), 1), (t(9, 0), 2)], "p3")
        assert run() == {(1, "00:00", "00:40"): 2, (2, "05:00", "05:30"): 1}
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_stream_stream_attribution_join(spark):
    """Watermarked stream-stream inner join: clicks attribute to the
    impression within the 1h horizon; out-of-horizon clicks never match;
    a click behind the watermark is dropped; re-runs append only NEW
    matches (exactly-once across AvailableNow restarts)."""
    import datetime as dt
    import glob

    from iyp_spark.streaming import EVENTS_SCHEMA, stream_stream_attribution

    base = tempfile.mkdtemp(prefix="iyp_stream5_")

    def t(h, m):
        return dt.datetime(2026, 1, 1, h, m)

    def drop(side, rows, part):
        df = spark.createDataFrame(
            [(i, ts, uid, side, 1.0, "{}") for i, (uid, ts) in enumerate(rows)],
            EVENTS_SCHEMA,
        )
        stage = os.path.join(base, f"stage_{side}_{part}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        os.makedirs(os.path.join(base, side), exist_ok=True)
        shutil.move(
            glob.glob(os.path.join(stage, "part-*.parquet"))[0],
            os.path.join(base, side, f"{part}.parquet"),
        )

    def run():
        stream_stream_attribution(
            spark, os.path.join(base, "imp"), os.path.join(base, "clk"),
            os.path.join(base, "out"), os.path.join(base, "cp"),
        )
        out = os.path.join(base, "out")
        if not [f for f in os.listdir(out) if f.endswith(".parquet")]:
            return set()
        return {
            (r["user_id"], r["imp_ts"].minute + 60 * r["imp_ts"].hour,
             r["clk_ts"].minute + 60 * r["clk_ts"].hour, r["delay_s"])
            for r in spark.read.parquet(out).collect()
        }

    try:
        # impressions for users 1 and 2 at 00:00; clicks: u1 at 00:30
        # (match), u1 at 02:30 (outside 1h horizon), u2 at 00:20 (match)
        drop("imp", [(1, t(0, 0)), (2, t(0, 0))], "p1")
        drop("clk", [(1, t(0, 30)), (1, t(2, 30)), (2, t(0, 20))], "p1")
        got1 = run()
        assert got1 == {(1, 0, 30, 1800), (2, 0, 20, 1200)}

        # a late click still matches while the impression state lives:
        # the GLOBAL watermark is min over both streams (imp max is 00:00,
        # so wm < 0) — that is the documented join-state contract
        drop("clk", [(2, t(0, 40)), (1, t(0, 10))], "p2")
        got2 = run()
        assert got2 == got1 | {(2, 0, 40, 2400), (1, 0, 10, 600)}

        # advance BOTH watermarks to 04:00 (events at 06:00, late = 2h):
        # impressions at 00:00 can only match clicks <= 01:00 < wm, so
        # their state is EVICTED after this batch (the bounded-state
        # guarantee); the 06:00 imp+clk pair itself matches with delay 0
        drop("imp", [(9, t(6, 0))], "p2")
        drop("clk", [(9, t(6, 0))], "p3")
        got3 = run()
        assert got3 == got2 | {(9, 360, 360, 0)}

        # state gone + input behind the watermark: an old click for the
        # 00:00 impression can never match again
        drop("clk", [(1, t(0, 50))], "p4")
        assert run() == got3

        # idempotent re-run with nothing new
        assert run() == got3
    finally:
        shutil.rmtree(base, ignore_errors=True)
