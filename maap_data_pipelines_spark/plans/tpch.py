"""Analytic query battery (TPC-H-grade) over the star schema.

Every query returns exact-integer money columns (``*_cents`` BIGINT) so the
driver's order-insensitive value hash matches the DuckDB oracle bit-for-bit:
``ROUND(price * 100)`` is a single deterministic IEEE op on both engines and
integer SUMs are associative — no float-summation-order hazard.

Scale design notes (verified via .explain in tests/test_plans.py):
  * nation/region (25/5 rows at every SF) are broadcast — no shuffle for
    dim joins even at 100 TB fact scale.
  * filters are applied before joins so parquet scans see pushed predicates
    (PushedFilters in the formatted plan) and join inputs shrink first.
  * top-k queries sort AFTER aggregation (tiny data) and carry a unique
    tiebreak key so LIMIT is deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import read_table


def _cents(col) -> F.Column:
    return F.round(col * 100).cast("long")


def _revenue_cents() -> F.Column:
    # round(extendedprice * (1-discount) * 100) — identical op order to the
    # oracle SQL rendering below.
    return F.round(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 100
    ).cast("long")

REVENUE_SQL = "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary. Single scan + partial-agg groupBy."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_price_cents"),
            F.sum(_revenue_cents()).alias("sum_disc_price_cents"),
            F.sum(
                F.round(
                    F.col("l_extendedprice")
                    * (F.lit(1) - F.col("l_discount"))
                    * (F.lit(1) + F.col("l_tax"))
                    * 100
                ).cast("long")
            ).alias("sum_charge_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)                   AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
       CAST(SUM({REVENUE_SQL}) AS BIGINT)                                AS sum_disc_price_cents,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT)
                                                                         AS sum_charge_cents,
       COUNT(*)                                                          AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: 3-way join, agg, deterministic top-10."""
    cust = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-03-15")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue_cents()).alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), "l_orderkey")
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority, CAST(SUM({REVENUE_SQL}) AS BIGINT) AS revenue_cents
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-03-15'
  AND l_shipdate  > TIMESTAMP '1996-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_cents DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join; nation/region broadcast (dim-sized forever)."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nation = F.broadcast(read_table(spark, sf_dir, "nation"))
    region = F.broadcast(
        read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_revenue_cents()).alias("revenue_cents"))
    )


Q5_SQL = f"""
SELECT n_name, CAST(SUM({REVENUE_SQL}) AS BIGINT) AS revenue_cents
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter+agg — predicate-pushdown showcase."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * F.col("l_discount") * 100).cast(
                    "long"
                )
            ).alias("revenue_cents")
        )
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue, top-20 customers."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = F.broadcast(read_table(spark, sf_dir, "nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(_revenue_cents()).alias("revenue_cents"),
            F.max(_cents(F.col("c_acctbal"))).alias("acctbal_cents"),
        )
        .orderBy(F.desc("revenue_cents"), "c_custkey")
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, n_name,
       CAST(SUM({REVENUE_SQL}) AS BIGINT) AS revenue_cents,
       MAX(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS acctbal_cents
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue_cents DESC, c_custkey
LIMIT 20
"""


def q12_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analogue: conditional counts per order priority."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("l_quantity") > 25, 1).otherwise(0)).alias(
                "high_line_count"
            ),
            F.sum(F.when(F.col("l_quantity") <= 25, 1).otherwise(0)).alias(
                "low_line_count"
            ),
        )
    )


Q12_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT)  AS high_line_count,
       CAST(SUM(CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY o_orderpriority
"""


def q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analogue: promo revenue share per ship month.

    part is the build side (small vs lineitem at scale) — joined on partkey;
    ratio is a single int/int division so it is bit-deterministic.
    """
    part = read_table(spark, sf_dir, "part")
    li = read_table(spark, sf_dir, "lineitem")
    rev = _revenue_cents()
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.date_trunc("month", F.col("l_shipdate")).cast("date").alias("ship_month"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).alias(
                "promo_cents"
            ),
            F.sum(rev).alias("total_cents"),
        )
        .withColumn(
            "promo_share",
            F.round(F.col("promo_cents") / F.col("total_cents"), 6),
        )
    )


Q14_SQL = f"""
SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
       CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {REVENUE_SQL} ELSE 0 END) AS BIGINT) AS promo_cents,
       CAST(SUM({REVENUE_SQL}) AS BIGINT) AS total_cents,
       ROUND(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {REVENUE_SQL} ELSE 0 END) AS BIGINT)
             / CAST(SUM({REVENUE_SQL}) AS BIGINT), 6) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: semi-join against a grouped-HAVING subquery."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sq"))
        .filter(F.col("sq") > 200)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            _cents(F.col("o_totalprice")).alias("totalprice_cents"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
    )


Q18_SQL = """
SELECT c_custkey, o_orderkey, o_orderdate,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS BIGINT)) > 200
)
GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
"""


def top_customers_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers per nation by revenue (rank-limited window).

    Scale design: only 25 nations, so a naive window would sort each
    nation's full customer set in one partition. Spark's
    InferWindowGroupLimit (asserted in tests/test_plans.py) inserts a
    PARTIAL WindowGroupLimit before the shuffle: every map partition
    forwards at most 3 rows per nation, so the per-nation sort sees
    <= 3 * n_map_partitions rows regardless of customer count — the
    two-phase top-k pattern, done by the optimizer in a single shuffle
    (the hand-salted variant costs an extra shuffle for the same bound).
    The unique c_custkey tiebreak makes dense_rank == row_number, which
    is what enables the rank-limit pushdown.
    """
    from pyspark.sql.window import Window

    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    nation = F.broadcast(read_table(spark, sf_dir, "nation"))
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "c_custkey")
        .agg(F.sum(_revenue_cents()).alias("revenue_cents"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.desc("revenue_cents"), F.col("c_custkey")
    )
    return (
        rev.withColumn("rnk", F.dense_rank().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
    )


TOP_CUSTOMERS_SQL = f"""
SELECT * FROM (
  SELECT n_name, c_custkey,
         CAST(SUM({REVENUE_SQL}) AS BIGINT) AS revenue_cents,
         DENSE_RANK() OVER (
            PARTITION BY n_name
            ORDER BY CAST(SUM({REVENUE_SQL}) AS BIGINT) DESC, c_custkey
         ) AS rnk
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY n_name, c_custkey
) WHERE rnk <= 3
"""


def order_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: customers active N months after first order."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("order_month"),
    )
    firsts = orders.groupBy("o_custkey").agg(
        F.min("order_month").alias("cohort_month")
    )
    return (
        orders.join(firsts, "o_custkey")
        .groupBy(
            "cohort_month",
            F.months_between(F.col("order_month"), F.col("cohort_month"))
            .cast("int")
            .alias("months_since"),
        )
        .agg(F.countDistinct("o_custkey").alias("active_customers"))
    )


COHORT_SQL = """
WITH om AS (
  SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month
  FROM orders
), firsts AS (
  SELECT o_custkey, MIN(order_month) AS cohort_month FROM om GROUP BY o_custkey
)
SELECT cohort_month,
       CAST(datediff('month', cohort_month, order_month) AS INT) AS months_since,
       COUNT(DISTINCT om.o_custkey) AS active_customers
FROM om JOIN firsts ON om.o_custkey = firsts.o_custkey
GROUP BY cohort_month, months_since
"""


def orders_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running total + 3-order moving average of order value.

    Ordered-window analytics battery: cumulative sum (UNBOUNDED PRECEDING)
    and a bounded moving frame (2 PRECEDING), one shuffle on the natural
    key. The moving average is exact: integer-cent sum / count, single
    double division.
    """
    from pyspark.sql.window import Window

    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        _cents(F.col("o_totalprice")).alias("price_cents"),
    )
    w = Window.partitionBy("o_custkey").orderBy("order_date", "o_orderkey")
    running = F.sum("price_cents").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    moving = F.round(
        F.avg("price_cents").over(w.rowsBetween(-2, Window.currentRow)), 6
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "order_date",
        "price_cents",
        running.alias("running_cents"),
        moving.alias("moving_avg_cents"),
    )


RUNNING_REVENUE_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
            OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents,
       ROUND(AVG(CAST(ROUND(o_totalprice * 100) AS BIGINT))
            OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg_cents
FROM orders
"""


CONCENTRATION_KS = (10, 100)


def revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: share held by the top-10 / top-100 customers.

    The Pareto question without the Pareto anti-pattern: a naive ABC
    classification needs a GLOBAL ordered cumulative sum — one sort
    partition holding every customer. Instead: per-customer revenue
    (hash-agg), top-k via TakeOrderedAndProject (each partition keeps a
    local top-k), and a single-row total broadcast for the shares. No
    global sort ever materializes; ties break on custkey so the top-k
    set is deterministic.

    Output one row: total + top-k cents and exact integer-cent shares
    (single division, 6dp).
    """
    orders = read_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    total = per_cust.agg(F.sum("cents").alias("total_cents"))
    out = total
    for k in CONCENTRATION_KS:
        topk = (
            per_cust.orderBy(F.desc("cents"), "o_custkey")
            .limit(k)
            .agg(F.sum("cents").alias(f"top{k}_cents"))
        )
        out = out.join(F.broadcast(topk))
    for k in CONCENTRATION_KS:
        out = out.withColumn(
            f"top{k}_share",
            F.round(F.col(f"top{k}_cents") / F.col("total_cents"), 6),
        )
    return out


REVENUE_CONCENTRATION_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total_cents FROM per_cust),
t10 AS (
  SELECT CAST(SUM(cents) AS BIGINT) AS top10_cents
  FROM (SELECT cents FROM per_cust ORDER BY cents DESC, o_custkey LIMIT 10)
),
t100 AS (
  SELECT CAST(SUM(cents) AS BIGINT) AS top100_cents
  FROM (SELECT cents FROM per_cust ORDER BY cents DESC, o_custkey LIMIT 100)
)
SELECT total_cents, top10_cents, top100_cents,
       ROUND(top10_cents / total_cents, 6) AS top10_share,
       ROUND(top100_cents / total_cents, 6) AS top100_share
FROM tot, t10, t100
"""




def orders_trailing_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order trailing-365-day spend: the RANGE-frame window.

    ROWS frames (orders_running_revenue) count physical rows; RANGE
    frames bound the frame by the ORDER BY VALUE — here integer days
    since epoch, so each order sees every order of the same customer in
    the preceding 365 calendar days regardless of how many there were
    (peers on the same day are all in-frame, which is what makes the
    result deterministic under ties). One shuffle on the natural key;
    frame evaluation is the standard sliding accumulation, never a
    self-join on an inequality.
    """
    from pyspark.sql.window import Window

    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        _cents(F.col("o_totalprice")).alias("price_cents"),
    ).withColumn(
        "day", F.datediff(F.col("order_date"), F.lit("1992-01-01").cast("date"))
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day")
        .rangeBetween(-364, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "order_date",
        "price_cents",
        F.count(F.lit(1)).over(w).alias("trail_n"),
        F.sum("price_cents").over(w).alias("trail_cents"),
    )


ORDERS_TRAILING_YEAR_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
       CAST(COUNT(*) OVER win AS BIGINT) AS trail_n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER win AS BIGINT) AS trail_cents
FROM orders
WINDOW win AS (
  PARTITION BY o_custkey
  ORDER BY date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
  RANGE BETWEEN 364 PRECEDING AND CURRENT ROW)
"""




DECILE_N = 10


def orders_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment order-value deciles via ntile: the equi-height histogram.

    ntile(10) over a totally-ordered window (price, then orderkey — no
    tie ambiguity) assigns each order its within-segment decile; the
    rollup then reports each decile's row count and exact cent bounds —
    the distribution summary a pricing dashboard bins by. One shuffle on
    the segment key; ntile is a single-pass rank computation, and the
    per-decile agg map-side-combines to segments x 10 rows.
    """
    from pyspark.sql.window import Window

    customer = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        _cents(F.col("o_totalprice")).alias("price_cents"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy("price_cents", "o_orderkey")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .withColumn("decile", F.ntile(DECILE_N).over(w).cast("long"))
        .groupBy("c_mktsegment", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("price_cents").alias("min_cents"),
            F.max("price_cents").alias("max_cents"),
        )
    )


ORDERS_VALUE_DECILES_SQL = f"""
WITH j AS (
  SELECT c.c_mktsegment, o.o_orderkey,
         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
t AS (
  SELECT c_mktsegment, price_cents,
         CAST(ntile({DECILE_N}) OVER (PARTITION BY c_mktsegment
              ORDER BY price_cents, o_orderkey) AS BIGINT) AS decile
  FROM j
)
SELECT c_mktsegment, decile,
       COUNT(*) AS n_orders,
       MIN(price_cents) AS min_cents,
       MAX(price_cents) AS max_cents
FROM t GROUP BY c_mktsegment, decile
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_items": q10_returned_items,
    "q12_shipmode": q12_shipmode,
    "q14_promo": q14_promo,
    "q18_large_orders": q18_large_orders,
    "top_customers_window": top_customers_window,
    "order_cohort_retention": order_cohort_retention,
    "orders_running_revenue": orders_running_revenue,
    "orders_trailing_year": orders_trailing_year,
    "orders_value_deciles": orders_value_deciles,
    "revenue_concentration": revenue_concentration,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier": Q5_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q10_returned_items": Q10_SQL,
    "q12_shipmode": Q12_SQL,
    "q14_promo": Q14_SQL,
    "q18_large_orders": Q18_SQL,
    "top_customers_window": TOP_CUSTOMERS_SQL,
    "order_cohort_retention": COHORT_SQL,
    "orders_running_revenue": RUNNING_REVENUE_SQL,
    "orders_trailing_year": ORDERS_TRAILING_YEAR_SQL,
    "orders_value_deciles": ORDERS_VALUE_DECILES_SQL,
    "revenue_concentration": REVENUE_CONCENTRATION_SQL,
}
