"""Bucketed co-located join: correct results AND no exchange in the plan."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from maap_data_pipelines_spark.sinks import write_bucketed_table


@pytest.fixture()
def bucketed_pair(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    orders = spark.range(1000).select(
        F.col("id").alias("orderkey"), (F.col("id") % 7).alias("custgrp")
    )
    lines = spark.range(5000).select(
        (F.col("id") % 1000).alias("orderkey"), (F.col("id") % 13).alias("qty")
    )
    write_bucketed_table(orders, "b_orders", "orderkey", n_buckets=8, path=str(wh / "b_orders"))
    write_bucketed_table(lines, "b_lines", "orderkey", n_buckets=8, path=str(wh / "b_lines"))
    yield "b_orders", "b_lines"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")


def test_bucketed_join_no_shuffle(spark, bucketed_pair):
    t1, t2 = bucketed_pair
    a, b = spark.table(t1), spark.table(t2)
    # disable broadcast so the join would otherwise need a full shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "orderkey").groupBy("custgrp").agg(F.sum("qty").alias("s"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucket co-location: no exchange below the join
        join_part = plan.split("HashAggregate")[-1]
        assert "Exchange" not in join_part, join_part
        expected = {
            r.custgrp: r.s
            for r in spark.range(1000)
            .select(F.col("id").alias("orderkey"), (F.col("id") % 7).alias("custgrp"))
            .join(
                spark.range(5000).select(
                    (F.col("id") % 1000).alias("orderkey"),
                    (F.col("id") % 13).alias("qty"),
                ),
                "orderkey",
            )
            .groupBy("custgrp")
            .agg(F.sum("qty").alias("s"))
            .collect()
        }
        assert {r.custgrp: r.s for r in joined.collect()} == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_three_table_bucketed_join_no_shuffle(spark, bucketed_pair, tmp_path):
    """Chained fact-fact-fact join on the shared bucket key: ZERO exchanges.

    The 100 TB claim is that bucketing pays one write-time shuffle and
    then EVERY join on that key is exchange-free — not just the first.
    """
    t1, t2 = bucketed_pair
    rets = spark.range(300).select(
        (F.col("id") * 3 % 1000).alias("orderkey"), F.lit(1).alias("returned")
    )
    write_bucketed_table(
        rets, "b_rets", "orderkey", n_buckets=8, path=str(tmp_path / "b_rets")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table(t1)
            .join(spark.table(t2), "orderkey")
            .join(spark.table("b_rets"), "orderkey")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_rets")


def test_bucket_pruning_point_lookup(spark, bucketed_pair):
    """Equality filter on the bucket key scans 1 bucket of 8, not the table.

    Bucket pruning is the read-side payoff beyond joins: a point lookup
    touches 1/n_buckets of the files with no index structure at all.
    """
    t1, _ = bucketed_pair
    # a bare filter has no join/agg to exploit the partitioning, so the
    # auto-bucketed-scan heuristic would fall back to a plain scan and
    # skip pruning; forcing the bucketed scan is what a point-lookup-heavy
    # workload would do
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        plan = (
            spark.table(t1)
            .filter(F.col("orderkey") == 417)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")


def test_mismatched_bucket_counts_coalesce(spark, bucketed_pair, tmp_path):
    """8-bucket x 4-bucket join with bucket coalescing: still no shuffle.

    Tables bucketed at different granularities (e.g. a fact re-bucketed
    finer as it grew) can still co-join shuffle-free: Spark coalesces the
    8-bucket side down to 4 at read time instead of exchanging either
    side — the knob that makes bucket-count evolution survivable without
    rewriting history.
    """
    t1, _ = bucketed_pair
    coarse = spark.range(500).select(
        (F.col("id") * 2).alias("orderkey"), F.lit("c").alias("tag")
    )
    write_bucketed_table(
        coarse, "b_coarse", "orderkey", n_buckets=4, path=str(tmp_path / "b_coarse")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
    try:
        j = spark.table(t1).join(spark.table("b_coarse"), "orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == 500  # orderkey 0..998 even ∩ 0..999 = 500 rows
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.bucketing.coalesceBucketsInJoin.enabled")
        spark.sql("DROP TABLE IF EXISTS b_coarse")
