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
