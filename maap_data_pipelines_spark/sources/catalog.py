"""Parquet table catalog.

Tables are read lazily as DataFrames; at cluster scale the same call reads a
multi-TB directory tree — Spark handles split planning via
``spark.sql.files.maxPartitionBytes``. Column pruning / predicate pushdown
reach the parquet scan because callers compose projections and filters on the
returned lazy DataFrame before any action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor
# (region=5 rows, nation=25 rows always; supplier/part grow slowly with SF).
BROADCAST_DIMS = frozenset({"region", "nation"})


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in names or TABLES}


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a low-parallelism scan so CPU-heavy per-row
    work (regex cascades, shingle hashing, vector math) uses every core.

    Scale-adaptive by construction (guide §2/§6): the gate reads the
    partition count the scan planner actually produced. At production
    scale a table is thousands of splits >= defaultParallelism and this
    is a NO-OP — no Exchange is added, nothing extra ships. Only when the
    planner yields fewer partitions than cores (small files, single
    row-group parquet — exactly the local bench layout, but also any
    small dimension feed on a real cluster) does the one cheap shuffle of
    a tiny input buy a cluster-wide map stage. Round-robin repartition is
    deterministic under retry (sortBeforeRepartition, SPARK-23207) and
    every consumer of this helper is partition-count-invariant (grouped
    aggregations / equi-joins; no rand()/partition-id dependence).
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    out = df.repartition(target)
    # Row-count shortcut for scale gates (functions/joins.corpus_rows):
    # COUNT is repartition-invariant, and counting the raw scan skips the
    # round-robin exchange (+ its sortBeforeRepartition) the gate job
    # would otherwise pay — measured 0.42 -> 0.22 s per gate at sf0.1.
    out._fanout_base = df
    return out
