"""Salted equi-join (ops/skew.py): salting must be semantically invisible
(row-for-row equal to the plain join, hot keys or not), physically real
(the salt is part of the join key, so a hot key spreads over n_salts
shuffle partitions), and deterministic (salt = pure function of row
values)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iyp_spark.ops.skew import salted_equi_join


@pytest.fixture()
def skewed(spark):
    """Fact table with one hot key: key 7 carries 500 of 560 rows (the
    Zipf-hot-ASN shape), keys 0..59 one row each."""
    hot = spark.range(500).select(
        F.lit(7).alias("k"), (F.col("id") * 3).alias("v"))
    cold = spark.range(60).select(
        F.col("id").cast("int").alias("k"), F.lit(-1).cast("long").alias("v"))
    return hot.unionByName(cold)


@pytest.fixture()
def dim(spark):
    # keys 0..49 only → keys 50..59 are unmatched (exercises left-null)
    return spark.range(50).select(
        F.col("id").cast("int").alias("dk"),
        F.concat(F.lit("seg_"), (F.col("id") % 5).cast("string")).alias("seg"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_inner_equals_plain_join(spark, skewed, dim):
    plain = skewed.join(dim, skewed["k"] == dim["dk"], "inner")
    salted = salted_equi_join(skewed, dim, "k", "dk", n_salts=8)
    assert _rows(salted) == _rows(plain)
    assert salted.columns == plain.columns  # _salt never leaks


def test_left_join_unmatched_left_rows_appear_once(spark, skewed, dim):
    plain = skewed.join(dim, skewed["k"] == dim["dk"], "left")
    salted = salted_equi_join(skewed, dim, "k", "dk", n_salts=8, how="left")
    assert _rows(salted) == _rows(plain)
    unmatched = salted.filter(F.col("dk").isNull())
    assert unmatched.count() == 10  # keys 50..59, exactly once each


def test_equals_plain_join_without_broadcast(spark, skewed, dim):
    """Force the sort-merge path (the case salting exists for) and check
    equality there too — plus that the salt actually reaches the join key."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        salted = salted_equi_join(skewed, dim, "k", "dk", n_salts=8)
        plan = salted._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "_salt" in plan, "salt must be part of the join key"
        assert "CartesianProduct" not in plan
        plain = skewed.join(dim, skewed["k"] == dim["dk"], "inner")
        assert _rows(salted) == _rows(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_hot_key_spreads_over_salt_partitions(spark, skewed):
    """The point of the exercise: the hot key's 500 rows land on several
    distinct (key, salt) values, not one."""
    salts = (
        skewed.filter(F.col("k") == 7)
        .withColumn("_s", F.pmod(F.xxhash64("k", "v"), F.lit(8)).cast("int"))
        .select("_s").distinct().count()
    )
    assert salts == 8


def test_semi_and_anti(spark, skewed, dim):
    semi = salted_equi_join(skewed, dim, "k", "dk", n_salts=4, how="left_semi")
    anti = salted_equi_join(skewed, dim, "k", "dk", n_salts=4, how="left_anti")
    assert semi.columns == skewed.columns
    assert semi.count() == 550  # 500 hot (k=7 matches) + cold keys 0..49
    assert anti.count() == 10


def test_rejects_right_sided_joins(spark, skewed, dim):
    with pytest.raises(ValueError, match="left-sided"):
        salted_equi_join(skewed, dim, "k", "dk", how="right")
    with pytest.raises(ValueError, match="n_salts"):
        salted_equi_join(skewed, dim, "k", "dk", n_salts=0)
