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
