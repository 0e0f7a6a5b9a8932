"""Event-stream analytics (batch plans; streaming twins live in
``maap_data_pipelines_spark.streaming``).

The reference pipeline is event-driven (SQS/Step Functions fan-out,
``deploy/cdk/queue_stack.py``); here the event log itself is a first-class
table and these plans are the batch-parity versions of the streaming
rollups a catalog-ingest monitor needs.

Money/value columns use exact integer cents (see plans/tpch.py rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.catalog import read_table

SESSION_GAP_MIN = 30


def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type: count + exact value sum."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour,
       event_type,
       COUNT(*) AS n_events,
       SUM(CAST(ROUND(value * 100) AS BIGINT)) AS value_cents,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + running sum.

    Scale note: the window is partitioned by user_id — sessionization
    shuffles once on the natural key and never materializes cross-user
    state; this is the standard distributed formulation (no driver loops).
    """
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.col("ts").cast("long")
            - F.lag(F.col("ts").cast("long"), 1).over(w)
            > SESSION_GAP_MIN * 60,
            1,
        )
        .otherwise(0),
    ).withColumn("session_seq", F.sum("new_session").over(w) + 1)
    return (
        flagged.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.sum(
                F.col("session_end").cast("long") - F.col("session_start").cast("long")
            ).alias("total_session_seconds"),
        )
    )


SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) + 1 AS session_seq
  FROM flagged
), sessions AS (
  SELECT user_id, session_seq, COUNT(*) AS n_events,
         MIN(ts) AS session_start, MAX(ts) AS session_end
  FROM numbered GROUP BY user_id, session_seq
)
SELECT user_id, COUNT(*) AS n_sessions, SUM(n_events) AS n_events,
       SUM(epoch(session_end)::BIGINT - epoch(session_start)::BIGINT) AS total_session_seconds
FROM sessions GROUP BY user_id
"""


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: JSON prop 'k' histogram per event type."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object(F.col("props"), "$.k").cast("int"))
        .groupBy("event_type", (F.col("k") % 10).alias("k_bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("k_sum"))
    )


JSON_PROPS_SQL = """
SELECT event_type,
       CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket,
       COUNT(*) AS n,
       SUM(CAST(json_extract(props, '$.k') AS INT)) AS k_sum
FROM events
GROUP BY 1, 2
"""


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase per user.

    Stage timestamps must be strictly increasing; computed with ordered
    conditional windows (one shuffle on user_id, no self-joins).
    """
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("t_c")
    )
    c = (
        per_user.join(clicks, "user_id", "left")
        .filter(F.col("t_c") > F.col("t_view"))
        .groupBy("user_id", "t_view")
        .agg(F.min("t_c").alias("t_click"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("t_p")
    )
    p = (
        c.join(purchases, "user_id", "left")
        .filter(F.col("t_p") > F.col("t_click"))
        .groupBy("user_id", "t_view", "t_click")
        .agg(F.min("t_p").alias("t_purchase"))
    )
    return p.select("user_id", "t_view", "t_click", "t_purchase")


FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
  FROM events GROUP BY user_id
), c AS (
  SELECT v.user_id, v.t_view, MIN(e.ts) AS t_click
  FROM v JOIN events e ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY v.user_id, v.t_view
)
SELECT c.user_id, c.t_view, c.t_click, MIN(e.ts) AS t_purchase
FROM c JOIN events e ON e.user_id = c.user_id
WHERE e.event_type = 'purchase' AND e.ts > c.t_click
GROUP BY c.user_id, c.t_view, c.t_click
"""


QUERIES = {
    "events_hourly_rollup": events_hourly_rollup,
    "events_sessionize": events_sessionize,
    "events_json_props": events_json_props,
    "events_funnel": events_funnel,
}

ORACLES = {
    "events_hourly_rollup": HOURLY_SQL,
    "events_sessionize": SESSIONIZE_SQL,
    "events_json_props": JSON_PROPS_SQL,
    "events_funnel": FUNNEL_SQL,
}
