"""Time-series join queries: as-of and range joins (custom operators).

Spark has no native ASOF/range join; operators/asof.py composes them from
built-ins (union-sort for as-of, time-bucketing for range — see module doc
for the scale topology). DuckDB 1.0 has a native ASOF JOIN, which makes a
sharp oracle: our composed operator must reproduce the dedicated
implementation's semantics exactly.

Both queries run purchase events against other event streams of the same
user (the only fixture pairing that shares a time domain — orders live in
1995-2001, events in 2024).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from streamsurfer_spark.operators.asof import asof_join, range_join
from streamsurfer_spark.queries import QuerySpec
from streamsurfer_spark.session import table

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def qt01_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase: the user's latest click at-or-before it."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    # dedup clicks to one per (user, ts) — max event_id — so the as-of pick
    # is well-defined on both engines when timestamps collide
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    clicks = (
        ev.where(F.col("event_type") == "click")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "ts", F.col("event_id").alias("last_click_id"))
    )
    joined = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_time="ts",
        right_time="ts",
        payload=["last_click_id"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT).alias("purchase_ts"),
        "last_click_id",
    ).orderBy("event_id")


QT01_SQL = """
WITH purchases AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
clicks AS (
    SELECT user_id, ts, event_id AS last_click_id FROM (
        SELECT user_id, ts, event_id,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'click'
    ) WHERE rn = 1
)
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       c.last_click_id
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
"""


def qt02_range_join_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase/error pairs of the same user within ±6 hours."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("error_id"), F.col("ts").alias("error_ts")
    )
    joined = range_join(
        purchases,
        errors,
        key="user_id",
        left_time="ts",
        right_time="error_ts",
        lower_seconds=-6 * 3600,
        upper_seconds=6 * 3600,
    )
    return joined.select(
        "purchase_id",
        "user_id",
        F.date_format("ts", TS_FMT).alias("purchase_ts"),
        "error_id",
        F.date_format("error_ts", TS_FMT).alias("error_ts"),
    ).orderBy("purchase_id", "error_id")


QT02_SQL = """
SELECT p.event_id AS purchase_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       e.event_id AS error_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS error_ts
FROM events p
JOIN events e
  ON p.user_id = e.user_id
 AND e.ts >= p.ts - INTERVAL '6 hours'
 AND e.ts <= p.ts + INTERVAL '6 hours'
WHERE p.event_type = 'purchase' AND e.event_type = 'error'
ORDER BY purchase_id, error_id
"""


QUERIES: dict[str, QuerySpec] = {
    "qt01_asof_last_click": QuerySpec(
        qt01_asof_last_click, QT01_SQL, "as-of join (union-sort) vs native DuckDB ASOF"
    ),
    "qt02_range_join_errors": QuerySpec(
        qt02_range_join_errors, QT02_SQL, "bucketed range join vs inequality join"
    ),
}
