"""localCheckpoint with origin-statistics stripping for iterative loops.

Spark's ``Dataset.localCheckpoint`` (4.x) deliberately carries the
checkpointed plan's *estimated* statistics onto the resulting LogicalRDD
(``LogicalRDD.apply``'s ``originStats``), so the size-only stats visitor
keeps compounding estimates ACROSS loop iterations. The visitor multiplies
child estimates through joins, so an iterative algorithm that joins two
iteration-dependent tables per round (e.g. connected-components graph
contraction: quotient-edges ⋈ labels ⋈ labels) grows the estimate's BIT
LENGTH geometrically — after ~15 rounds the planner is doing
million-bit BigInteger products inside ``canBroadcastBySize`` and a
30-edge toy graph takes 40+ minutes of pure driver-side planning.

``checkpoint_reset_stats`` materializes the local checkpoint and rebuilds
the LogicalRDD WITHOUT the origin stats, so every loop iteration restarts
from the default leaf estimate. Join-strategy quality is unaffected in
practice: the inflated estimates were far above every broadcast threshold
anyway, and AQE re-plans each shuffle from ACTUAL runtime sizes. If the
internal LogicalRDD surgery ever fails (Spark upgrade), the plain
checkpoint is returned — correctness never depends on this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LOGICAL_RDD = "org.apache.spark.sql.execution.LogicalRDD"


def checkpoint_reset_stats(df: DataFrame, eager: bool = True) -> DataFrame:
    """``df.localCheckpoint(eager)`` with origin statistics stripped."""
    ck = df.localCheckpoint(eager=eager)
    try:
        spark = df.sparkSession
        jvm = spark._jvm  # noqa: SLF001
        jdf = ck._jdf  # noqa: SLF001
        lp = jdf.queryExecution().logical()
        if lp.getClass().getName() != _LOGICAL_RDD:
            return ck
        co = getattr(getattr(jvm.org.apache.spark.sql.execution,
                             "LogicalRDD$"), "MODULE$")
        none = getattr(getattr(jvm.scala, "None$"), "MODULE$")
        sess = jdf.sparkSession()
        # LogicalRDD(output, rdd, outputPartitioning, outputOrdering,
        #            isStreaming, stream)(session, originStats,
        #            originConstraints) — rebuild with empty origin stats
        newlp = co.apply(
            lp.productElement(0), lp.rdd(), lp.productElement(2),
            lp.productElement(3), lp.productElement(4), lp.productElement(5),
            sess, none, none,
        )
        dsco = getattr(getattr(jvm.org.apache.spark.sql.classic,
                               "Dataset$"), "MODULE$")
        return DataFrame(dsco.ofRows(sess, newlp), spark)
    except Exception:
        return ck
