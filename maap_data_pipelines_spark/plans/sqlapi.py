"""Pure-SQL front-end demos: the same engine driven via ``spark.sql``.

Every other plan module builds DataFrames programmatically; these queries
register the catalog tables as temp views and express the plan as ANSI
SQL handed to ``spark.sql`` — proving the engine's second user surface.
Catalyst compiles both front-ends to the same logical plans, so the SQL
battery inherits every optimization the DataFrame battery gets (pushdown,
broadcast, WindowGroupLimit), and the DuckDB oracle runs a structurally
identical statement.

Scale note: view registration is metadata-only (no scan, no cache); each
query is still one lazy plan with filters at the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.catalog import read_table

_SQL_REVENUE_BY_NATION = """
SELECT n.n_name AS nation,
       COUNT(DISTINCT o.o_custkey) AS n_buyers,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM {o} o
JOIN {c} c ON o.o_custkey = c.c_custkey
JOIN {n} n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""

_SQL_PRIORITY_SHARE = """
WITH per AS (
  SELECT o_orderpriority AS priority,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM {o}
  GROUP BY o_orderpriority
)
SELECT priority, n_orders, revenue_cents,
       CAST(RANK() OVER (ORDER BY revenue_cents DESC, priority) AS BIGINT)
         AS revenue_rank
FROM per
"""


def _register(spark: SparkSession, sf_dir: str, *tables: str) -> dict[str, str]:
    names = {}
    for t in tables:
        view = f"v_{t}"
        read_table(spark, sf_dir, t).createOrReplaceTempView(view)
        names[t] = view
    return names


def sql_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-table join + agg written as SQL text; same plan as the DF form."""
    v = _register(spark, sf_dir, "orders", "customer", "nation")
    return spark.sql(
        _SQL_REVENUE_BY_NATION.format(o=v["orders"], c=v["customer"], n=v["nation"])
    )


def sql_priority_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + rank window as SQL text over the registered view.

    The unpartitioned RANK() runs on the 5-row priority aggregate —
    bounded by attribute cardinality, not data size (the single-partition
    window warning is about those 5 rows).
    """
    v = _register(spark, sf_dir, "orders")
    return spark.sql(_SQL_PRIORITY_SHARE.format(o=v["orders"]))


QUERIES = {
    "sql_revenue_by_nation": sql_revenue_by_nation,
    "sql_priority_share": sql_priority_share,
}

ORACLES = {
    "sql_revenue_by_nation": _SQL_REVENUE_BY_NATION.format(
        o="orders", c="customer", n="nation"
    ),
    "sql_priority_share": _SQL_PRIORITY_SHARE.format(o="orders"),
}
