"""End-to-end pipeline runners: the jobs a reference user actually ships.

The registry exposes each operator as a lazy query; these runners compose
them into the two complete products and OWN the actions (writes), which
is where persist/checkpoint lifecycles and manifests belong:

* :func:`run_stac_pipeline` — the reference's whole job
  (discovery-derived catalog -> STAC items -> partitioned catalog write
  -> transfer plan -> batched submission receipts), mirroring the Step
  Functions flow (`/root/reference/deploy` wiring) as one Spark job.
* :func:`run_curation_pipeline` — the training-data product: keep/reject
  cascade -> curated corpus partitioned by source + rejection histogram.

Both are idempotent (overwrite semantics keyed by the output dir): rerun
produces byte-identical results, so a failed run is re-submitted whole —
the same property the reference gets from skip-if-exists transfers.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import sinks
from .plans import llm, stac
from .sources.catalog import read_table


def run_stac_pipeline(
    spark: SparkSession, sf_dir: str, out_dir: str, endpoint: str = "dry://ingest"
) -> dict:
    """Catalog -> items -> partitioned write -> transfer plan -> receipts."""
    items = stac.build_stac_items(spark, sf_dir)
    sinks.write_items_partitioned(
        items, os.path.join(out_dir, "catalog"), partition_cols=("collection",)
    )
    plan = stac.transfer_plan(spark, sf_dir)
    plan.write.mode("overwrite").parquet(os.path.join(out_dir, "transfer_plan"))
    docs = stac.stac_item_json(spark, sf_dir).select(
        F.col("asset_id").cast("string").alias("item_id"), "item_json"
    )
    receipts = sinks.submit_items(docs, endpoint=endpoint)
    receipts.write.mode("overwrite").parquet(os.path.join(out_dir, "receipts"))
    back = spark.read.parquet(os.path.join(out_dir, "receipts"))
    return {
        "n_items": spark.read.parquet(os.path.join(out_dir, "catalog")).count(),
        "n_transfers": spark.read.parquet(
            os.path.join(out_dir, "transfer_plan")
        ).count(),
        "n_submitted": back.count(),
        "n_failed": back.filter(F.col("status") != 200).count(),
    }


def run_curation_pipeline(spark: SparkSession, sf_dir: str, out_dir: str) -> dict:
    """Keep/reject cascade -> curated corpus + rejection histogram."""
    decisions = llm.corpus_curation(spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents")
    kept = docs.join(
        decisions.filter(F.col("keep")).select("doc_id"), "doc_id"
    )
    sinks.write_items_partitioned(
        kept, os.path.join(out_dir, "corpus"), partition_cols=("source",)
    )
    hist = (
        decisions.groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .coalesce(1)
    )
    hist.write.mode("overwrite").parquet(os.path.join(out_dir, "rejections"))
    n_in = docs.count()
    n_kept = spark.read.parquet(os.path.join(out_dir, "corpus")).count()
    return {"n_in": n_in, "n_kept": n_kept, "n_rejected": n_in - n_kept}
