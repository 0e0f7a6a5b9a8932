"""Salted skew helpers: exact equality with unsalted plans + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from maap_data_pipelines_spark.operators.skew import (
    replicated_skew_join,
    salted_sum_count,
)


def _skewed_df(spark):
    # one hot key (~90% of rows) + 200 cold keys
    hot = spark.range(20_000).select(
        F.lit("hot").alias("k"), (F.col("id") % 97).cast("long").alias("v")
    )
    cold = spark.range(2_000).select(
        F.concat(F.lit("cold"), (F.col("id") % 200).cast("string")).alias("k"),
        (F.col("id") % 31).cast("long").alias("v"),
    )
    return hot.unionAll(cold)


def test_salted_sum_count_equals_plain_groupby(spark):
    df = _skewed_df(spark)
    plain = {
        r.k: (r.total, r.n_rows)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }
    salted = {r.k: (r.total, r.n_rows) for r in salted_sum_count(df, "k", "v").collect()}
    assert salted == plain
    # two-phase: the salted plan must contain >= 2 hash-partition exchanges
    plan = salted_sum_count(df, "k", "v")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("hashpartitioning") >= 2


def test_replicated_skew_join_equals_plain_join(spark):
    big = _skewed_df(spark)
    dim = spark.createDataFrame(
        [("hot", 1)] + [(f"cold{i}", i % 7) for i in range(200)], ["k", "w"]
    )
    plain = sorted(
        (r.k, r.v, r.w) for r in big.join(dim, "k").select("k", "v", "w").collect()
    )
    salted = sorted(
        (r.k, r.v, r.w)
        for r in replicated_skew_join(big, dim, "k").select("k", "v", "w").collect()
    )
    assert salted == plain
