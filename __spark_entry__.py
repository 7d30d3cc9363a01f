"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` / ``oracle_sql()`` — per-operator DataFrame programs and their
DuckDB-checkable ANSI-SQL oracles (implemented in iyp_spark.entry_queries).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue + top customer per
    region (multi-dim broadcast join + agg + window), the shape of the
    engine's entity-link-then-aggregate pipeline."""
    from iyp_spark.entry_queries import tbl, _money
    from pyspark.sql import Window as W

    sf_dir = "/root/testdata/sf0.001"
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region")
    per_cust = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "c_custkey", "c_name")
        .agg(F.round(F.sum(_money(F.col("o_totalprice"))), 2).cast("double").alias("cust_rev"))
    )
    w = W.partitionBy("r_name").orderBy(F.desc("cust_rev"), F.asc("c_custkey"))
    return (
        per_cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("r_name", "c_custkey", "c_name", "cust_rev")
        .orderBy("r_name")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from iyp_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from iyp_spark.entry_queries import ORACLES

    return dict(ORACLES)
