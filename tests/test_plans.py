"""Physical-plan audits (BASELINE.md "No per-row Python" criterion and the
scale-readiness checks SURVEY §4 promises):

- every crawler's parse/transform plan uses only Arrow-vectorized Python
  (ArrowEvalPython / MapInPandas), NEVER row-at-a-time BatchEvalPython;
- the documents scan partition-prunes on the crawler column;
- dimension joins in the query library go broadcast.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iyp_spark.crawlers import CRAWLER_ORDER, REGISTRY


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_per_row_python_in_crawler_plans(store, corpus, name):
    crawler = REGISTRY[name](store)
    nodes, triples = crawler.transform(store.read_documents(crawler=name))
    for df in list(nodes) + list(triples):
        plan = plan_of(df)
        assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
        # unbounded cross products never survive a 100x scale-up; the only
        # nested-loop joins allowed are broadcast range joins against
        # provably tiny dimensions (lpm coarse side, price bands)
        assert "CartesianProduct" not in plan, f"{name}: cartesian join"


def test_documents_scan_partition_prunes(store, corpus):
    scan = store.read_documents(crawler="bgpkit.pfx2asn").select("doc_id")
    plan = plan_of(scan)
    assert "PartitionFilters" in plan and "crawler" in plan


def test_dim_joins_broadcast(spark):
    from iyp_spark.entry_queries import QUERIES

    plan = plan_of(QUERIES["revenue_per_region"](spark, "/root/testdata/sf0.01"))
    assert plan.count("BroadcastHashJoin") >= 3


def test_ivf_query_reads_index_no_recompute(spark):
    """The round-2 scale-killer fence: ann_ivf_topk must QUERY the
    persisted IVF index (inverted-list scan + broadcast cell-join + one
    top-k rank window), never retrain or re-assign: no N×K expansion
    ranked through a row_number window, no Python at query time. The
    build-time assignment path (map-side Arrow argmax, shuffle-free) is
    checked separately."""
    from iyp_spark.entry_queries import QUERIES
    from iyp_spark.ops.similarity import (lloyd_refined_centroids,
                                          seed_centroid_rows, with_norm,
                                          _argmax_cell)

    df = QUERIES["ann_ivf_topk"](spark, "/root/testdata/sf0.001")
    plan = plan_of(df)
    assert plan.count("Window [") == 1, "query must only rank the final top-k"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, \
        "query time must not recompute assignments in Python"
    assert "BroadcastHashJoin" in plan, "cell-join must broadcast the query side"

    # build-time assignment: one Arrow UDF projection, no join/window/shuffle
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    seeds = seed_centroid_rows(emb)
    assign_plan = plan_of(with_norm(emb).withColumn("cell", _argmax_cell(seeds)))
    assert "ArrowEvalPython" in assign_plan
    assert "Exchange" not in assign_plan, "assignment must be shuffle-free"
    assert "Window" not in assign_plan


def test_ivf_nprobe2_plan_single_window(spark):
    """Multi-probe keeps the query's plan shape: probe-cell selection is
    a tiny sorted-aggregate (HashAggregate), NOT a second window — the
    final top-k rank stays the only Window, and there is still no Python
    and no cartesian product at query time."""
    from iyp_spark.entry_queries import QUERIES

    plan = plan_of(QUERIES["ann_ivf_topk_nprobe2"](spark, "/root/testdata/sf0.001"))
    assert plan.count("Window [") == 1, "probe selection must not add a window"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


@pytest.mark.parametrize("qname", sorted(__import__("iyp_spark.entry_queries", fromlist=["QUERIES"]).QUERIES))
def test_no_per_row_python_in_entry_queries(spark, qname):
    """Every driver-contract query stays Arrow-or-JVM (BatchEvalPython
    banned) and shuffle-joins on keys (CartesianProduct banned — the only
    nested-loop joins allowed are broadcast range joins against provably
    tiny dimensions)."""
    from iyp_spark.entry_queries import QUERIES

    plan = plan_of(QUERIES[qname](spark, "/root/testdata/sf0.001"))
    assert "BatchEvalPython" not in plan, f"{qname}: row-at-a-time Python UDF"
    assert "CartesianProduct" not in plan, f"{qname}: cartesian join"


def test_quality_filter_plan_single_scan_single_exchange(spark):
    """The composed rule stack must evaluate every signal in ONE
    projection over ONE corpus scan (not re-join the standalone operators
    on doc_id — 4 scans / 4 shuffles for the same rows); the only
    exchange is the fingerprint-window picking the dup representative."""
    from iyp_spark.entry_queries import QUERIES

    plan = plan_of(QUERIES["corpus_quality_filter"](spark, "/root/testdata/sf0.001"))
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange") == 1, plan
    assert "BatchEvalPython" not in plan


def test_pmi_global_topn_is_take_ordered(spark):
    """pmi_collocations' global top-n must be an orderBy+limit
    (TakeOrderedAndProject — parallel per-partition partial top-n), not a
    single-partition row_number window over every bigram surviving
    min_count (VERDICT r5: the one plan that would not ship to 1000
    executors). The only Window left ranks the <= top_n rows AFTER the
    limit."""
    from iyp_spark.entry_queries import QUERIES

    plan = plan_of(QUERIES["pmi_collocations"](spark, "/root/testdata/sf0.001"))
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("Window [") == 1, plan
    # the window must sit ABOVE the limit (parents print first)
    assert plan.index("Window [") < plan.index("TakeOrderedAndProject"), plan


def test_checkpoint_reset_stats_strips_compounded_estimates(spark):
    """Iterative loops checkpoint per round; Spark's localCheckpoint
    carries the origin plan's ESTIMATED stats onto the LogicalRDD, and
    the size-only estimator multiplies estimates through joins — so a
    loop joining two iteration-dependent tables compounds the estimate's
    bit length geometrically until the planner burns minutes on
    BigInteger products (observed on a 30-edge chain). The reset helper
    must return the checkpoint with a LEAF-DEFAULT estimate, and the
    data unchanged."""
    from pyspark.sql import functions as F

    from iyp_spark.ckpt import checkpoint_reset_stats

    df = spark.range(1000).selectExpr("id as a")
    big = df
    for _ in range(4):
        big = (big.join(big.selectExpr("a as b"), F.col("a") == F.col("b"))
               .select("a"))
    plain = big.localCheckpoint(eager=True)
    inflated = int(str(plain._jdf.queryExecution().optimizedPlan()
                       .stats().sizeInBytes()))
    ck = checkpoint_reset_stats(big)
    reset = int(str(ck._jdf.queryExecution().optimizedPlan()
                    .stats().sizeInBytes()))
    assert inflated > (1 << 80), "premise: plain checkpoint compounds stats"
    assert reset <= (1 << 70), f"stats not stripped: 2^{reset.bit_length()}"
    assert ck.count() == 1000
