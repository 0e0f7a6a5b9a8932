"""Warehouse-maintenance ETL plans: dimension versioning + dataset splits.

The reference pipeline maintains a mutable catalog (items are upserted by
submit-stac; ``lambdas/submit-stac/handler.py`` POSTs each item into the
ingestor). On a warehouse the same need — "what did this entity look like
when" — is SCD2 dimension versioning; the training-data counterpart is a
reproducible train/val/test split. Both must be deterministic functions
of the data (no RNG, no processing-time), or a backfill re-run reshuffles
history.

Scale notes:
* ``orders_scd2`` is one window per entity key; partition size is
  bounded by versions-per-entity (orders per customer), never by SF.
* splits/samples are pure column hashes — embarrassingly parallel, no
  shuffle at all, and stable under repartitioning, retries, and
  backfills (the property RNG-based ``df.sample`` does NOT have).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import md5_long, md5_long_sql
from ..sources.catalog import read_table


def orders_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 version history per customer from the order log.

    Each order is a new version of the customer's "latest order" state:
    valid_from = its order date, valid_to = the next order's date (NULL
    while current), plus version numbers and an is_current flag. Ties on
    the same date are sequenced by orderkey so the history is total.
    """
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("totalprice_cents"),
        # o_orderdate is TIMESTAMP_NTZ; cast for unix_micros (UTC session =>
        # identity, matching DuckDB epoch_us on the naive timestamp)
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("valid_from_us"),
        F.unix_micros(F.lead("o_orderdate").over(w).cast("timestamp")).alias(
            "valid_to_us"
        ),
        F.row_number().over(w).cast("long").alias("version"),
        F.lead("o_orderdate").over(w).isNull().alias("is_current"),
    )


ORDERS_SCD2_SQL = """
SELECT o_custkey AS custkey,
       o_orderkey AS orderkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
       epoch_us(o_orderdate) AS valid_from_us,
       epoch_us(lead(o_orderdate) OVER w) AS valid_to_us,
       row_number() OVER w AS version,
       (lead(o_orderdate) OVER w) IS NULL AS is_current
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 10  # test gets the remainder


def doc_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment per document.

    The bucket is a pure hash of the document id — re-running, resharding
    or appending other docs never moves an existing doc between splits
    (contamination-safe), unlike RNG sampling seeded per-partition.
    """
    docs = read_table(spark, sf_dir, "documents")
    bucket = F.pmod(md5_long(F.concat(F.lit("split:"), F.col("doc_id"))), F.lit(100))
    split = (
        F.when(bucket < SPLIT_TRAIN_PCT, "train")
        .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )
    return docs.select(
        "doc_id", "source", bucket.alias("bucket"), split.alias("split")
    )


_split_hash = md5_long_sql("'split:' || doc_id")
_BUCKET_SQL = f"(({_split_hash}) % 100 + 100) % 100"

DOC_SPLIT_SQL = f"""
SELECT doc_id, source,
       {_BUCKET_SQL} AS bucket,
       CASE WHEN {_BUCKET_SQL} < {SPLIT_TRAIN_PCT} THEN 'train'
            WHEN {_BUCKET_SQL} < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


SAMPLE_PER_MILLE = 100  # 10% per stratum


def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample per source stratum (hash-gated filter).

    Salting the hash with the stratum key decorrelates it from the split
    hash above, so sampling composes with splitting without bias. The
    filter is pushdown-adjacent (evaluated at the scan, no shuffle); the
    exact kept-set is reproducible on any cluster layout.
    """
    docs = read_table(spark, sf_dir, "documents")
    gate = F.pmod(
        md5_long(F.concat(F.col("source"), F.lit(":"), F.col("doc_id"))),
        F.lit(1000),
    )
    return docs.filter(gate < SAMPLE_PER_MILLE).select(
        "doc_id", "source", gate.alias("sample_bucket")
    )


_gate_hash = md5_long_sql("source || ':' || doc_id")
_GATE_SQL = f"(({_gate_hash}) % 1000 + 1000) % 1000"

DOC_SAMPLE_SQL = f"""
SELECT doc_id, source, {_GATE_SQL} AS sample_bucket
FROM documents
WHERE {_GATE_SQL} < {SAMPLE_PER_MILLE}
"""


QUERIES = {
    "orders_scd2": orders_scd2,
    "doc_split_assign": doc_split_assign,
    "doc_stratified_sample": doc_stratified_sample,
}

ORACLES = {
    "orders_scd2": ORDERS_SCD2_SQL,
    "doc_split_assign": DOC_SPLIT_SQL,
    "doc_stratified_sample": DOC_SAMPLE_SQL,
}
