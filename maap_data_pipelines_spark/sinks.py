"""Sinks: partitioned catalog writes + STAC ingestion submission.

The reference's tail stages are data-transfer (s3 copy), then
submit-stac (POST each item to an ingestion API,
lambdas/submit-stac/handler.py). Spark-first equivalents:

* ``write_items_partitioned`` — the catalog itself is a table: items land
  as parquet partitioned by collection. Scale notes: repartition on the
  partition columns first so each output partition is written by few
  tasks (avoids the classic small-files explosion when every task holds
  rows of every collection); maxRecordsPerFile bounds file size.
* ``submit_items`` — distributed batched submission with receipts. Each
  Arrow batch becomes one POST payload; the transport is injectable and
  defaults to a dry-run (this environment has no network — the real
  transport would be a requests.Session.post). The receipts come back as
  a DataFrame so retries/monitoring are ordinary dataflow, not log
  scraping. No driver-side loop: submission parallelism == partition
  count.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_RECORDS_PER_FILE = 1_000_000


def write_items_partitioned(
    items: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("collection",),
    mode: str = "overwrite",
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
) -> None:
    """Write items as parquet partitioned by collection."""
    (
        items.repartition(*[F.col(c) for c in partition_cols])
        .write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist a table bucketed (and sorted) by its join key.

    Bucketing is the 100 TB co-location lever: every table bucketed the
    same way on the same key joins with ZERO exchange on either side —
    the shuffle is paid once at write time instead of once per query.
    Fact-to-fact joins (orders x lineitem on orderkey) are where this
    wins; broadcast already covers the small-dim case. Requires a
    metastore table (saveAsTable), not a bare path — bucket metadata
    lives in the catalog.
    """
    w = (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
    )
    if path is not None:  # external table (explicit location)
        w = w.option("path", path)
    w.saveAsTable(table)


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet z-ordered on two columns (Morton-key range layout).

    ``repartitionByRange`` on the interleaved key splits the keyspace
    into quadtree-cell ranges (one output file each), and the within-
    partition sort lays rows out key-contiguously — so every file's
    min/max stats cover a bounded RECTANGLE in (col_a, col_b) and scans
    filtered on either column can skip most files. A single-column sort
    only prunes on that column; this pays the same one shuffle.
    """
    from .functions.zorder import zorder_key

    z = zorder_key(F.col(col_a), F.col(col_b)).alias("__zkey")
    (
        df.select("*", z)
        .repartitionByRange(n_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )


def start_idempotent_stream_sink(
    stream_df: DataFrame, target_dir: str, checkpoint_dir: str
):
    """Exactly-once streaming parquet sink via foreachBatch.

    The production pattern for arbitrary sinks: Structured Streaming
    guarantees each micro-batch id is replayed with identical contents
    after a failure, so writing every batch to its own
    ``batch_id=<id>`` directory with overwrite semantics makes retries
    and restarts idempotent — a replayed batch clobbers its own previous
    (possibly partial) output and can never double-write. The checkpoint
    dir carries source offsets; restarting with the same checkpoint
    resumes, not re-ingests.
    """

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{target_dir}/batch_id={batch_id}")

    return (
        stream_df.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def dry_run_transport(payload: list[str], endpoint: str) -> int:
    """Default transport: no network in this environment — pretend 200.

    A deployment passes e.g. ``lambda p, url: session.post(url,
    json=p).status_code`` (parity: submit-stac/handler.py POSTs each item
    dict to the ingestion API).
    """
    return 200


def submit_items(
    items: DataFrame,
    endpoint: str,
    id_col: str = "item_id",
    json_col: str = "item_json",
    batch_size: int = 100,
    transport: Callable[[list[str], str], int] = dry_run_transport,
) -> DataFrame:
    """Submit item JSON documents in batches; return a receipts DataFrame.

    Output: (item_id, batch_size, status) — one row per item, status from
    the transport's HTTP code for its batch.
    """
    src = items.select(F.col(id_col).alias("item_id"), F.col(json_col).alias("doc"))
    schema = "item_id string, batch_size int, status int"

    def _submit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[lo : lo + batch_size]
                status = transport(chunk["doc"].tolist(), endpoint)
                yield pd.DataFrame(
                    {
                        "item_id": chunk["item_id"].astype(str),
                        "batch_size": len(chunk),
                        "status": status,
                    }
                )

    return src.mapInPandas(_submit, schema=schema)
