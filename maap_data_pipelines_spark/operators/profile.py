"""Column profiling: null counts + distinct cardinality per column.

The data-quality primitive every ingest pipeline runs before promoting a
batch. One aggregation computes every column's stats in a single pass
(the multi-countDistinct plan uses Catalyst's Expand — input is
replicated once per distinct-column, which is the exact-answer cost);
``stack`` unpivots the 1-row wide result into the (column, metric) long
form a monitoring table wants.

Scale note: at 100 TB swap ``countDistinct`` for
``approx_count_distinct`` (HLL, no Expand, one pass, mergeable) — kept
exact here so the result is oracle-checkable; the plan shape is
otherwise identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column_name, n_null, n_distinct) for each named column."""
    aggs = []
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__null_{c}")
        )
        aggs.append(F.countDistinct(c).alias(f"__dist_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', __null_{c}, __dist_{c}" for c in cols)
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column_name, n_null, n_distinct)"
        )
    )


def profile_sql(table: str, cols: list[str]) -> str:
    """DuckDB rendering: one UNION ALL branch per column."""
    branches = [
        f"SELECT '{c}' AS column_name, COUNT(*) - COUNT({c}) AS n_null, "
        f"COUNT(DISTINCT {c}) AS n_distinct FROM {table}"
        for c in cols
    ]
    return "\nUNION ALL\n".join(branches)
