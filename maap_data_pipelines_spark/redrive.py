"""Failed-submission retry queue: the DLQ / re-drive analogue.

The reference wires every ingest stage through SQS queues with
dead-letter queues and partial-batch retry
(deploy/cdk/queue_stack.py:25-55 — ``max_receive_count``, a DLQ per
queue, ``report_batch_item_failures=True`` on the event sources). The
Spark-first equivalent keeps the same semantics but as dataflow over a
:class:`~maap_data_pipelines_spark.table.VersionedTable`:

* :func:`submit_with_retry_queue` — submit once, then persist every
  receipt with status >= 400 (together with its payload, so a re-drive
  needs no upstream recompute) into a retry-queue table. Enqueue is
  idempotent by receipt identity: the queue is merge-upserted on
  item_id, so re-running the same submission never duplicates a queue
  row, and the recorded attempt count is the max seen.
* :func:`redrive` — a later run consumes ONLY the queued failures:
  re-submits them, removes the now-successful rows from the queue,
  bumps attempts on rows that failed again, and moves rows whose
  attempts reach ``max_receive_count`` into a dead-letter table (never
  retried automatically; visible for operators — SQS's DLQ).

Both steps are ordinary jobs over small tables (failures, not the
corpus), so at 100 TB the retry loop's cost is proportional to what
actually failed: the happy path never rescans. The queue/dead-letter
tables are VersionedTables, so every re-drive is an atomic, auditable
commit and a crashed re-drive is re-runnable (receipts are recomputed
from the queue snapshot, not from mutable state).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sinks import dry_run_transport, submit_items
from .table import VersionedTable

#: Receipt statuses < 400 count as delivered (2xx/3xx); 0 is the
#: documented dry-run "planned, not sent" marker and is NOT a failure.
FAILURE_FLOOR = 400


def _failed(receipts: DataFrame) -> DataFrame:
    return receipts.filter(F.col("status") >= FAILURE_FLOOR)


def submit_with_retry_queue(
    items: DataFrame,
    endpoint: str,
    queue: VersionedTable,
    id_col: str = "item_id",
    json_col: str = "item_json",
    batch_size: int = 100,
    transport: Callable = dry_run_transport,
    dry_run: bool = False,
) -> DataFrame:
    """Submit items; persist failed receipts (with payload) to ``queue``.

    Returns the full receipts frame (item_id, batch_size, status). Rows
    with status >= 400 also land in the retry queue as
    (item_id, doc, status, attempts=1); already-queued ids are upserted,
    keeping the higher attempt count, so a re-run of the same submission
    is idempotent on the queue.
    """
    # Materialize the receipts EXACTLY ONCE (eager localCheckpoint): the
    # plan embeds the side-effecting transport, so every downstream action
    # (the failure join, the queue upsert, the caller's consumption of the
    # returned frame) must read this materialized result — re-executing
    # the plan would re-submit every item.
    receipts = submit_items(
        items,
        endpoint,
        id_col=id_col,
        json_col=json_col,
        batch_size=batch_size,
        transport=transport,
        dry_run=dry_run,
    ).localCheckpoint()
    payload = items.select(
        F.col(id_col).alias("item_id"), F.col(json_col).alias("doc")
    )
    failed = (
        _failed(receipts)
        .select("item_id", "status")
        .join(payload, "item_id")
        .withColumn("attempts", F.lit(1))
        .select("item_id", "doc", "status", "attempts")
    )
    spark = items.sparkSession
    if queue.latest_version() is not None:
        prior = queue.read(spark).select(
            "item_id", F.col("attempts").alias("prior_attempts")
        )
        failed = failed.join(prior, "item_id", "left").select(
            "item_id",
            "doc",
            "status",
            F.greatest(
                F.col("attempts"), F.coalesce("prior_attempts", F.lit(0))
            ).alias("attempts"),
        )
    queue.merge_upsert(failed, key="item_id")
    return receipts


def redrive(
    spark: SparkSession,
    queue: VersionedTable,
    endpoint: str,
    dead_letter: VersionedTable,
    max_receive_count: int = 5,
    batch_size: int = 100,
    transport: Callable = dry_run_transport,
) -> DataFrame:
    """Re-submit ONLY the queued failures; return the re-drive receipts.

    Queue transition (one atomic commit each):

    * status < 400 on re-submit  -> removed from the queue (delivered);
    * still failing, attempts+1 < ``max_receive_count`` -> stays queued
      with the bumped attempt count;
    * attempts+1 >= ``max_receive_count`` -> moved to ``dead_letter``
      (queue_stack.py's ``max_receive_count`` -> DLQ hop), upserted by
      item_id so repeated exhaustion never duplicates DLQ rows.

    An empty queue returns an empty receipts frame without touching the
    transport. Receipts reconcile: every queued item appears exactly
    once in the returned frame.
    """
    schema = "item_id string, batch_size int, status int"
    if queue.latest_version() is None:
        return spark.createDataFrame([], schema)
    pending = queue.read(spark)
    if pending.isEmpty():
        return spark.createDataFrame([], schema)

    # Submit once: eager localCheckpoint materializes the receipts before
    # any consumer acts, so the queue/DLQ transition and the returned
    # frame are all derived from the SAME transport run (a lazy plan
    # would re-invoke the transport per action and could even base the
    # transition on different statuses than the caller sees).
    receipts = submit_items(
        pending,
        endpoint,
        id_col="item_id",
        json_col="doc",
        batch_size=batch_size,
        transport=transport,
    ).localCheckpoint()
    # One pass over (small) failures: join receipts back to payload +
    # attempt counts, then split by outcome. Cache: three consumers.
    merged = (
        _failed(receipts)
        .select("item_id", F.col("status").alias("new_status"))
        .join(pending.select("item_id", "doc", "attempts"), "item_id")
        .withColumn("attempts", F.col("attempts") + F.lit(1))
        .select("item_id", "doc", F.col("new_status").alias("status"), "attempts")
        .cache()
    )
    try:
        exhausted = merged.filter(F.col("attempts") >= max_receive_count)
        still = merged.filter(F.col("attempts") < max_receive_count)
        if not exhausted.isEmpty():
            dead_letter.merge_upsert(exhausted, key="item_id")
        # delivered + exhausted both leave the queue; the overwrite holds
        # exactly the rows still eligible for a future re-drive.
        queue.commit(still, mode="overwrite")
    finally:
        merged.unpersist()
    return receipts
