"""Sinks: partitioned parquet writes + batched submission receipts."""

from __future__ import annotations

import os

from maap_data_pipelines_spark import sinks
from maap_data_pipelines_spark.plans.stac import build_stac_items, stac_item_json


def test_write_items_partitioned(spark, sf_dir, tmp_path):
    items = build_stac_items(spark, sf_dir)
    out = str(tmp_path / "catalog")
    sinks.write_items_partitioned(items, out, partition_cols=("collection",))
    parts = sorted(p for p in os.listdir(out) if p.startswith("collection="))
    assert len(parts) == 7  # coll-0 .. coll-6
    back = spark.read.parquet(out)
    assert back.count() == items.count()
    # partition pruning: reading one collection only lists that directory
    one = spark.read.parquet(out).filter("collection = 'coll-3'")
    n3 = items.filter("collection = 'coll-3'").count()
    assert one.count() == n3


def test_submit_items_receipts(spark, sf_dir):
    docs = stac_item_json(spark, sf_dir).withColumnRenamed("asset_id", "item_id")
    receipts = sinks.submit_items(
        docs.withColumn("item_id", docs.item_id.cast("string")),
        endpoint="https://ingest.invalid/items",
        batch_size=50,
    )
    rows = receipts.collect()
    assert len(rows) == docs.count()
    assert all(r.status == 200 for r in rows)
    assert all(0 < r.batch_size <= 50 for r in rows)


def test_submit_items_custom_transport_failure(spark, sf_dir):
    docs = stac_item_json(spark, sf_dir).limit(10).withColumnRenamed("asset_id", "item_id")

    def failing_transport(payload, endpoint):
        return 503

    receipts = sinks.submit_items(
        docs.withColumn("item_id", docs.item_id.cast("string")),
        endpoint="x",
        transport=failing_transport,
    )
    assert {r.status for r in receipts.collect()} == {503}
