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

from streamsurfer_spark.functions.rounding import scaled_round, scaled_round_sql
from streamsurfer_spark.operators import sessions
from streamsurfer_spark.operators.asof import asof_join, asof_nearest, range_join
from streamsurfer_spark.queries import QuerySpec
from streamsurfer_spark.queries.relational_q import _duck_sum6, _sum6
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


# --- Q-T3: batch sessionization (lag → gap flag → running sum) --------------

SESSION_GAP_S = 1800


def qt03_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions with a 30-minute inactivity gap, rolled up.

    operators/sessions.py assigns session ids with two windows sharing one
    (user, ts) sort; the rollup groups on (user, session) — same keys, so
    the aggregate reuses the window's partitioning where possible.
    """
    ev = table(spark, sf_dir, "events")
    sess = sessions.sessionize(ev, key="user_id", gap_seconds=SESSION_GAP_S)
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), TS_FMT).alias("start_ts"),
            F.date_format(F.max("ts"), TS_FMT).alias("end_ts"),
            _sum6("value").alias("sum_value"),
        )
        .orderBy("user_id", "session_id")
    )


QT03_SQL = f"""
WITH flagged AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_S} * 1000000
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT *, sum(is_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS session_id
    FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS end_ts,
       {_duck_sum6("value")} AS sum_value
FROM sess
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --- Q-T4: daily rollup with gap-fill (hypertable-style densify) ------------


def qt04_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type daily counts/sums with missing days filled as zero."""
    ev = table(spark, sf_dir, "events")
    filled = sessions.gapfill_daily(
        ev,
        series_col="event_type",
        date_col=F.to_date("ts"),
        aggs=[
            F.count("*").alias("n_events"),
            _sum6("value").alias("sum_value"),
        ],
        fill={"sum_value": F.lit(0.0)},
    )
    return filled.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_events",
        "sum_value",
    ).orderBy("event_type", "day")


QT04_SQL = f"""
WITH rolled AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           count(*) AS n_events,
           {_duck_sum6("value")} AS sum_value
    FROM events GROUP BY 1, 2
),
span AS (SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi FROM events),
days AS (
    SELECT unnest(generate_series(lo::TIMESTAMP, hi::TIMESTAMP, INTERVAL 1 DAY))::DATE AS day
    FROM span
),
axis AS (SELECT t.event_type, d.day FROM days d CROSS JOIN (SELECT DISTINCT event_type FROM events) t)
SELECT axis.event_type,
       strftime(axis.day, '%Y-%m-%d') AS day,
       coalesce(rolled.n_events, 0) AS n_events,
       coalesce(rolled.sum_value, 0.0) AS sum_value
FROM axis
LEFT JOIN rolled ON rolled.event_type IS NOT DISTINCT FROM axis.event_type
    AND rolled.day = axis.day
ORDER BY axis.event_type, axis.day
"""


def qt05_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars per event type — the classic time-series downsample.

    Open/close are selected with min_by/max_by over a (ts, event_id,
    value) struct key, so the whole bar is ONE hash aggregate with
    map-side partial aggregation: no window, no second shuffle, no
    per-group sort. At 100 TB the group count (type × day) is tiny
    relative to input, so partial aggs collapse nearly everything before
    the exchange. The oracle reaches the same rows via row_number
    windows (DuckDB's arg_min can't take a composite ordering key).

    The key includes ``value`` to stay TOTAL even when duplicate
    event_ids collide at one timestamp: min_by on a tied key is
    nondeterministic, and the r9 deep fuzz (25-example collision grid)
    produced exactly that — two rows sharing (ts, event_id) with
    different values, Spark opening the bar at one and the oracle's
    row_number at the other. Fixtures' unique event_ids masked it for
    four rounds.
    """
    ev = table(spark, sf_dir, "events")
    ord_key = F.struct(F.col("ts"), F.col("event_id"), F.col("value"))
    return (
        ev.groupBy(
            "event_type", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("bar_date")
        )
        .agg(
            F.round(F.min_by("value", ord_key), 2).alias("open_v"),
            F.round(F.max("value"), 2).alias("high_v"),
            F.round(F.min("value"), 2).alias("low_v"),
            F.round(F.max_by("value", ord_key), 2).alias("close_v"),
            F.count("*").alias("volume"),
            _sum6("value").alias("sum_value"),
        )
        .orderBy("event_type", "bar_date")
    )


QT05_SQL = f"""
WITH ranked AS (
  SELECT event_type,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS bar_date,
         value, ts, event_id,
         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                            ORDER BY ts, event_id, value) AS rn_a,
         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                            ORDER BY ts DESC, event_id DESC, value DESC) AS rn_d
  FROM events
)
SELECT event_type, bar_date,
       round(max(CASE WHEN rn_a = 1 THEN value END), 2) AS open_v,
       round(max(value), 2) AS high_v,
       round(min(value), 2) AS low_v,
       round(max(CASE WHEN rn_d = 1 THEN value END), 2) AS close_v,
       count(*) AS volume,
       {_duck_sum6("value")} AS sum_value
FROM ranked
GROUP BY 1, 2
ORDER BY 1, 2
"""


def qt06_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with LINEAR INTERPOLATION across empty buckets —
    qt04's gapfill fills zeros; this reconstructs the signal.

    Dense (type, hour) axis (sequence + explode over the global span), left
    join of the hourly sums, then two frame windows per type — last-known
    before / first-known after, both on the SAME partitioning and sort, so
    one exchange serves all four ignoreNulls lookups. The interpolation is
    exact-int until the final division (value sums are ×1e6 bigints, hour
    offsets are ints) and the OUTPUT stays in integer micro units — a
    round-to-cents here would land on exact .xx5 quotients where Spark's
    BigDecimal(string) HALF_UP and the oracle's binary-double round split.
    """
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).alias("val6"))
    span = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    axis = (
        span.select(
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hr")
        )
        .crossJoin(ev.select("event_type").distinct())
    )
    dense = axis.join(hourly, ["event_type", "hr"], "left").withColumn(
        "h", (F.unix_timestamp("hr") / 3600).cast("int")
    )
    wp = Window.partitionBy("event_type").orderBy("h").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy("event_type").orderBy("h").rowsBetween(
        0, Window.unboundedFollowing
    )
    known_h = F.when(F.col("val6").isNotNull(), F.col("h"))
    prev_v = F.last("val6", ignorenulls=True).over(wp)
    prev_h = F.last(known_h, ignorenulls=True).over(wp)
    next_v = F.first("val6", ignorenulls=True).over(wn)
    next_h = F.first(known_h, ignorenulls=True).over(wn)
    interp6 = (
        F.when(F.col("val6").isNotNull(), F.col("val6").cast("double"))
        .when(prev_v.isNull(), next_v.cast("double"))
        .when(next_v.isNull(), prev_v.cast("double"))
        .otherwise(
            prev_v + ((next_v - prev_v) * (F.col("h") - prev_h)) / (next_h - prev_h)
        )
    )
    return dense.select(
        "event_type",
        F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hr"),
        F.round(interp6).cast("bigint").alias("value_interp_micro"),
        F.col("val6").isNull().alias("is_filled"),
    ).orderBy("event_type", "hr")


QT06_SQL = """
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS hr,
           sum(CAST(round(value * 1000000) AS BIGINT)) AS val6
    FROM events GROUP BY 1, 2
),
span AS (
    SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
    FROM events
),
axis AS (
    SELECT t.event_type, unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hr
    FROM span CROSS JOIN (SELECT DISTINCT event_type FROM events) t
),
dense AS (
    SELECT axis.event_type, axis.hr, hourly.val6,
           CAST(epoch(axis.hr) / 3600 AS INT) AS h
    FROM axis LEFT JOIN hourly
      ON hourly.event_type = axis.event_type AND hourly.hr = axis.hr
),
looked AS (
    SELECT *,
           last_value(val6 IGNORE NULLS) OVER wp AS prev_v,
           last_value(CASE WHEN val6 IS NOT NULL THEN h END IGNORE NULLS) OVER wp AS prev_h,
           first_value(val6 IGNORE NULLS) OVER wn AS next_v,
           first_value(CASE WHEN val6 IS NOT NULL THEN h END IGNORE NULLS) OVER wn AS next_h
    FROM dense
    WINDOW wp AS (PARTITION BY event_type ORDER BY h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wn AS (PARTITION BY event_type ORDER BY h
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type,
       strftime(hr, '%Y-%m-%d %H:%M:%S') AS hr,
       CAST(round(
         CASE WHEN val6 IS NOT NULL THEN val6::DOUBLE
              WHEN prev_v IS NULL THEN next_v::DOUBLE
              WHEN next_v IS NULL THEN prev_v::DOUBLE
              ELSE prev_v + ((next_v - prev_v) * (h - prev_h))::DOUBLE / (next_h - prev_h)
         END) AS BIGINT) AS value_interp_micro,
       val6 IS NULL AS is_filled
FROM looked
ORDER BY event_type, hr
"""


def qt07_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α = 0.5, pandas-style
    adjust=True) over the daily value series per event type.

    Scale honesty: the raw 100 TB stream collapses to (type × day) rows in
    the FIRST aggregate — the smoothing then runs on a tiny series, so the
    weighted inequality self-join costs nothing. α = 0.5 keeps every
    weight an exact binary power (pow(0.5, k) is exact in IEEE754), so the
    weighted sums are bit-identical on the oracle; no recursive state, no
    libm-dependent exponentials of arbitrary bases.
    """
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).alias("x6"))
        .withColumn(
            "idx",
            F.datediff(
                "day", F.min("day").over(Window.partitionBy("event_type"))
            ),
        )
    )
    a = daily.select(
        F.col("event_type").alias("t"), F.col("idx").alias("i"), F.col("x6").alias("xi")
    )
    b = daily.select("event_type", "day", "idx")
    w = F.pow(F.lit(0.5), b.idx - a.i)
    return (
        b.join(a, (b.event_type == a.t) & (a.i <= b.idx))
        .groupBy("event_type", "day", "idx")
        .agg(
            scaled_round(
                F.sum(a.xi * w) / F.sum(w) / 1_000_000, 2
            ).alias("ewma_value")
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "ewma_value",
        )
        .orderBy("event_type", "day")
    )


QT07_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         sum(CAST(round(value * 1000000) AS BIGINT)) AS x6
  FROM events GROUP BY 1, 2
),
idxd AS (
  SELECT event_type, day, x6,
         datediff('day', min(day) OVER (PARTITION BY event_type), day) AS idx
  FROM daily
)
SELECT b.event_type,
       strftime(b.day, '%Y-%m-%d') AS day,
       CAST(round(sum(a.x6 * pow(0.5, b.idx - a.idx))
             / sum(pow(0.5, b.idx - a.idx)) / 1000000 * 100) AS BIGINT)
           / 100.0 AS ewma_value
FROM idxd b
JOIN idxd a ON a.event_type = b.event_type AND a.idx <= b.idx
GROUP BY b.event_type, b.day
ORDER BY 1, 2
"""


def qt08_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 3σ anomaly detection: flag events whose value deviates more
    than three standard deviations from the user's trailing 20 events.

    The entire test is EXACT integer arithmetic on cent-scaled values: with
    n, s = Σx, ss = Σx² over the trailing frame, the 3σ condition
    (x - s/n)² > 9·(ss/n - s²/n²) is multiplied through by n² to
    (n·x - s)² > 9·(n·ss - s²) — BIGINT-exact on both engines, so the
    boolean is reproducible regardless of summation order (no float
    variance, no Welford state). Max magnitudes: n ≤ 20, x ≤ 49 002 cents
    → 9·n·ss ≤ 8.7e12, far inside int64.

    Scale (100 TB): one exchange on user_id; both aggregates share a single
    (user_id, ts, event_id) sort — Catalyst plans ONE Window node for
    count/sum/sumsq. User cardinality is high and per-user history is
    bounded by the 20-row frame, so no task ever holds more than one
    user's events; anomalies are a tiny filtered output.
    """
    ev = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    n = F.count("*").over(w)
    s = F.sum(cents).over(w)
    ss = F.sum(cents * cents).over(w)
    scored = ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT).alias("ts"),
        cents.alias("value_cents"),
        n.alias("n_prev"),
        s.alias("sum_prev"),
        ss.alias("sumsq_prev"),
    )
    dev = F.col("n_prev") * F.col("value_cents") - F.col("sum_prev")
    var_n2 = F.col("n_prev") * F.col("sumsq_prev") - F.col("sum_prev") * F.col("sum_prev")
    return (
        scored.where((F.col("n_prev") >= 10) & (dev * dev > 9 * var_n2))
        .orderBy("event_id")
    )


QT08_SQL = """
WITH scored AS (
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           CAST(round(value * 100) AS BIGINT) AS value_cents,
           count(*) OVER w AS n_prev,
           sum(CAST(round(value * 100) AS BIGINT)) OVER w AS sum_prev,
           sum(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT)) OVER w AS sumsq_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, ts, value_cents, n_prev,
       CAST(sum_prev AS BIGINT) AS sum_prev,
       CAST(sumsq_prev AS BIGINT) AS sumsq_prev
FROM scored
WHERE n_prev >= 10
  AND (n_prev * value_cents - sum_prev) * (n_prev * value_cents - sum_prev)
      > 9 * (n_prev * sumsq_prev - sum_prev * sum_prev)
ORDER BY event_id
"""


# --- Q-T9: time-weighted average (TimescaleDB time_weight parity) -----------

TWA_CAP_US = 3600 * 1_000_000  # staleness cap: a gap longer than 1h holds
# the last observation for exactly 1h, then contributes nothing (PromQL-style)


def qt09_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (user, day) time-weighted average of `value`: each observation
    is held until the user's next event (LOCF), capped at 1 hour of
    staleness; the segment is attributed to the day of its starting event.

    Numerics are exact end-to-end: cent-scaled BIGINT values × BIGINT
    microsecond durations (≤ 49 002 × 3.6e9 ≈ 1.8e14 per segment) are
    summed exactly; the ONLY float op is one final division of two exact
    integers — IEEE-correctly-rounded identically on both engines — then
    ROUND. No order-dependent float summation anywhere.

    Scale (100 TB): lead() needs one exchange on user_id; the rollup
    groups on (user_id, day) — a prefix-compatible key, so the partial
    aggregate collapses within the window's partitions before any second
    exchange. Per-user state is one row of lookahead; no frame holds a
    user's history.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cents = F.round(F.col("value") * 100).cast("bigint")
    seg = (
        ev.select("user_id", "ts", "event_id", cents.alias("value_cents"))
        .withColumn("next_ts", F.lead("ts").over(w))
        .where(F.col("next_ts").isNotNull())
        .withColumn(
            "dur_us",
            F.least(
                F.expr("timestampdiff(MICROSECOND, ts, next_ts)"),
                F.lit(TWA_CAP_US),
            ).cast("bigint"),
        )
    )
    return (
        seg.groupBy("user_id", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("n_segments"),
            F.sum("dur_us").alias("total_dur_us"),
            F.sum(F.col("value_cents") * F.col("dur_us")).alias("weighted_sum"),
        )
        .withColumn(
            # try_divide, not `/`: an all-zero-duration group (duplicate
            # timestamps with nothing later) makes total_dur_us 0, and
            # ANSI raises DIVIDE_BY_ZERO during evaluation — before
            # scaled_round's non-finite guard could run — while the
            # DuckDB twin's x/0 is NULL (r8 area review; the qt12
            # precedent)
            "twa_value",
            scaled_round(
                F.try_divide(F.col("weighted_sum"), F.col("total_dur_us"))
                / 100.0
            ),
        )
        .orderBy("user_id", "day")
    )


QT09_SQL = f"""
WITH seg AS (
    SELECT user_id, ts, event_id,
           CAST(round(value * 100) AS BIGINT) AS value_cents,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
    FROM events
),
capped AS (
    SELECT user_id, ts, value_cents,
           least(date_diff('microseconds', ts, next_ts), {TWA_CAP_US}) AS dur_us
    FROM seg WHERE next_ts IS NOT NULL
)
SELECT user_id,
       strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
       count(*) AS n_segments,
       CAST(sum(dur_us) AS BIGINT) AS total_dur_us,
       CAST(sum(value_cents * dur_us) AS BIGINT) AS weighted_sum,
       CAST(round(CAST(sum(value_cents * dur_us) AS BIGINT)
             / CAST(sum(dur_us) AS BIGINT) / 100.0 * 10000) AS BIGINT)
           / 10000.0 AS twa_value
FROM capped
GROUP BY 1, 2
ORDER BY 1, 2
"""


def qt10_nearest_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase: the SAME user's nearest error event within ±1 h —
    either direction, tie to the earlier one (operators/asof.py
    asof_nearest: union-sort, one shuffle, two window frames over one sort;
    no inequality join). The DuckDB oracle is the brute-force inequality
    join + argmin — intentionally the opposite topology, so a hash match
    proves the scalable path reproduces the obvious semantics."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    # one error per (user, ts): smallest event_id (the nearest-tiebreak rule)
    errors = (
        ev.where(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("error_id"))
    )
    joined = asof_nearest(
        purchases,
        errors,
        key="user_id",
        left_time="ts",
        right_time="ts",
        payload=["error_id"],
        tolerance_seconds=3600,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT).alias("purchase_ts"),
        "error_id",
        "direction",
        "diff_us",
    ).orderBy("event_id")


QT10_SQL = """
WITH p AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
e AS (
    SELECT user_id, ts, min(event_id) AS error_id
    FROM events WHERE event_type = 'error' GROUP BY 1, 2
),
cand AS (
    SELECT p.event_id, e.error_id, e.ts AS ets,
           abs(date_diff('microsecond', e.ts, p.ts)) AS adiff,
           CASE WHEN e.ts <= p.ts THEN 0 ELSE 1 END AS dir_rank
    FROM p JOIN e USING (user_id)
    WHERE abs(date_diff('microsecond', e.ts, p.ts)) <= 3600000000
),
best AS (
    SELECT event_id, error_id, adiff, dir_rank FROM (
        SELECT *, row_number() OVER (
            PARTITION BY event_id ORDER BY adiff, dir_rank, ets, error_id
        ) AS rn FROM cand
    ) WHERE rn = 1
)
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       b.error_id,
       CASE WHEN b.dir_rank = 0 THEN 'prev'
            WHEN b.dir_rank = 1 THEN 'next' END AS direction,
       b.adiff AS diff_us
FROM p LEFT JOIN best b USING (event_id)
ORDER BY p.event_id
"""


# --- qt11: hour-of-day seasonal profile + deseasonalized 2-sigma outliers ----


def qt11_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal decomposition against an hour-of-day profile: per
    (event_type, hour) the corpus builds its seasonal baseline (exact
    integer mean of cents), then each event is tested against ITS OWN
    bucket's 2σ band — the qt08 exact-moment trick lifted from trailing
    windows to seasonal buckets: |x − s/n| > 2σ ⇔ (n·x − s)² >
    4·(n·ss − s²), evaluated in DECIMAL(38,0) so corpus-scale n never
    overflows (n·x up to ~1e17 squares to ~1e34 — past int64, inside
    DECIMAL38/HUGEINT).

    Scale: the profile is ≤ types × 24 rows — broadcast back to the event
    scan, so the plan is one partial-aggregating groupBy (profile pass)
    plus one map-side-joined scan (flag pass); no window, no sort.
    """
    ev = table(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.hour("ts").alias("hod"),
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    prof = b.groupBy("event_type", "hod").agg(
        F.count("*").alias("n_events"),
        F.sum("cents").alias("s"),
        F.sum(F.expr("cents * cents")).alias("ss"),
    )
    lhs = F.expr(
        "(cast(n_events as decimal(38,0)) * cents - cast(s as decimal(38,0)))"
        " * (cast(n_events as decimal(38,0)) * cents - cast(s as decimal(38,0)))"
    )
    rhs = F.expr(
        "4 * (cast(n_events as decimal(38,0)) * cast(ss as decimal(38,0))"
        " - cast(s as decimal(38,0)) * cast(s as decimal(38,0)))"
    )
    flagged = b.join(F.broadcast(prof), ["event_type", "hod"]).select(
        "event_type", "hod", "n_events", "s", (lhs > rhs).cast("long").alias("is_out")
    )
    return (
        flagged.groupBy("event_type", "hod", "n_events", "s")
        .agg(F.sum("is_out").alias("n_outliers"))
        .select(
            "event_type",
            "hod",
            "n_events",
            # `div` truncates toward zero; DuckDB's integer `//` does the
            # SAME (verified: -7 // 2 = -3 on BIGINT operands), so the
            # twins agree on all inputs including negative cents sums
            F.expr("s div n_events").alias("mean_cents"),
            "n_outliers",
        )
        .orderBy("event_type", "hod")
    )


QT11_SQL = """
WITH b AS (
    SELECT event_type, CAST(hour(ts) AS INTEGER) AS hod,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
prof AS (
    SELECT event_type, hod, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(cents) AS BIGINT) AS s,
           CAST(sum(cents * cents) AS BIGINT) AS ss
    FROM b GROUP BY 1, 2
)
SELECT b.event_type, b.hod, p.n_events,
       CAST(p.s // p.n_events AS BIGINT) AS mean_cents,
       CAST(sum(CASE WHEN
             (p.n_events::HUGEINT * b.cents - p.s::HUGEINT)
           * (p.n_events::HUGEINT * b.cents - p.s::HUGEINT)
           > 4 * (p.n_events::HUGEINT * p.ss::HUGEINT - p.s::HUGEINT * p.s::HUGEINT)
           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM b JOIN prof p USING (event_type, hod)
GROUP BY 1, 2, 3, 4
ORDER BY 1, 2
"""


# --- qt12: ordered conversion funnel (view → click → purchase) ---------------


def qt12_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel per user: first 'view', then the first
    'click' STRICTLY AFTER it, then the first 'purchase' strictly after
    that — the event-analytics primitive (order matters, so this is not
    expressible as one flat aggregate). Emits one row per stage with
    reached-user counts, conversion vs stage 1, and (for the final stage)
    the exact total µs latency from first view to conversion.

    Shape at 100 TB: three keyed aggregations chained by equi-joins that
    all shuffle on user_id — the exchange is REUSED across stages (same
    key), each stage's state is one timestamp per user, and the final
    stage rollup is three 1-row aggregates. No window over a user's full
    history; no self-join on the raw event table beyond the keyed chain.
    """
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"), F.min("t1").alias("t1"))
    )
    f1 = s1.agg(
        F.lit("1_view").alias("stage"),
        F.count("*").alias("n_users"),
        F.lit(0).cast("bigint").alias("total_latency_us"),
    )
    f2 = s2.agg(
        F.lit("2_click").alias("stage"),
        F.count("*").alias("n_users"),
        F.lit(0).cast("bigint").alias("total_latency_us"),
    )
    f3 = s3.agg(
        F.lit("3_purchase").alias("stage"),
        F.count("*").alias("n_users"),
        # coalesce: sum over zero rows is NULL in Spark; the twin coalesces
        # to 0, so a fixture where no user completes the funnel must too
        F.coalesce(
            F.sum(F.expr("timestampdiff(MICROSECOND, t1, t3)")),
            F.lit(0).cast("bigint"),
        ).alias("total_latency_us"),
    )
    base = s1.agg(F.count("*").alias("n_base"))
    return (
        f1.unionByName(f2)
        .unionByName(f3)
        .crossJoin(F.broadcast(base))
        .select(
            "stage",
            "n_users",
            "total_latency_us",
            # try_divide: an empty funnel base (no views at all) yields
            # NULL conversion on both engines — DuckDB's x/0 is already
            # NULL, Spark's ANSI `/` would error (tools/empty_sweep.py)
            scaled_round(
                F.try_divide(F.col("n_users"), F.col("n_base"))
            ).alias("conversion"),
        )
        .orderBy("stage")
    )


QT12_SQL = """
WITH s1 AS (
    SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view'
    GROUP BY 1
),
s2 AS (
    SELECT e.user_id, min(e.ts) AS t2, min(s1.t1) AS t1
    FROM events e JOIN s1 USING (user_id)
    WHERE e.event_type = 'click' AND e.ts > s1.t1
    GROUP BY 1
),
s3 AS (
    SELECT e.user_id, min(e.ts) AS t3, min(s2.t1) AS t1
    FROM events e JOIN s2 USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts > s2.t2
    GROUP BY 1
),
base AS (SELECT count(*) AS n_base FROM s1),
f AS (
    SELECT '1_view' AS stage, count(*) AS n_users,
           CAST(0 AS BIGINT) AS total_latency_us FROM s1
    UNION ALL
    SELECT '2_click', count(*), CAST(0 AS BIGINT) FROM s2
    UNION ALL
    SELECT '3_purchase', count(*),
           CAST(coalesce(sum(epoch_us(t3) - epoch_us(t1)), 0) AS BIGINT) FROM s3
)
SELECT stage, n_users, total_latency_us,
       CAST(round(n_users::DOUBLE / n_base * 10000) AS BIGINT) / 10000.0 AS conversion
FROM f CROSS JOIN base
ORDER BY stage
"""


# --- qt13: weekly cohort retention -------------------------------------------

COHORT_EPOCH = "2024-01-01"


def qt13_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, counted
    as retained in every later week they are active — the canonical
    product-analytics triangle. Weeks are exact integer day-diffs div 7
    (no timezone or ISO-week ambiguity between engines).

    Shape at 100 TB: first-seen week is one groupBy(user) min; activity
    weeks are a distinct on (user, week) — both partial-aggregating on
    the uniform user key; the cohort join reuses that key's partitioning
    and the final rollup groups on the tiny (cohort, offset) space.
    """
    ev = table(spark, sf_dir, "events")
    # `div` truncates toward zero; DuckDB's integer `//` (DATE - DATE is
    # an integer day count there) truncates identically, so the week index
    # agrees across engines even for pre-epoch timestamps
    wk = F.expr(f"datediff(to_date(ts), DATE'{COHORT_EPOCH}') div 7")
    first = (
        ev.select("user_id", wk.alias("w"))
        .groupBy("user_id")
        .agg(F.min("w").alias("cohort_week"))
    )
    active = ev.select("user_id", wk.alias("active_week")).distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("active_week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


QT13_SQL = f"""
WITH wk AS (
    SELECT user_id,
           CAST((CAST(ts AS DATE) - DATE '{COHORT_EPOCH}') // 7 AS BIGINT) AS w
    FROM events
),
first AS (SELECT user_id, min(w) AS cohort_week FROM wk GROUP BY 1),
active AS (SELECT DISTINCT user_id, w AS active_week FROM wk)
SELECT f.cohort_week, a.active_week - f.cohort_week AS week_offset,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
FROM active a JOIN first f USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --- qt14: session transition matrix (Markov path analytics) -----------------


def qt14_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition statistics within user streams:
    counts of (prev_type → type) steps ordered by (ts, event_id) per
    user, plus each transition's share of its source state's outgoing
    edges (rounded) — the Markov-chain view of user paths that funnels
    (qt12) summarize one slice of.

    Shape: one lag window per user (single exchange on the uniform user
    key), then a partial-aggregating groupBy on the ≤ |types|² transition
    space; the outgoing-total denominator joins back from a ≤ |types|
    broadcast.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
    )
    counts = steps.groupBy("prev_type", "event_type").agg(
        F.count("*").alias("n_steps")
    )
    outgoing = counts.groupBy("prev_type").agg(F.sum("n_steps").alias("n_out"))
    return (
        counts.join(F.broadcast(outgoing), "prev_type")
        .select(
            "prev_type",
            "event_type",
            "n_steps",
            scaled_round(F.col("n_steps") / F.col("n_out")).alias("p_transition"),
        )
        .orderBy("prev_type", "event_type")
    )


QT14_SQL = """
WITH steps AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_type
    FROM events
),
counts AS (
    SELECT prev_type, event_type, count(*) AS n_steps
    FROM steps WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
),
outgoing AS (
    SELECT prev_type, CAST(sum(n_steps) AS BIGINT) AS n_out
    FROM counts GROUP BY 1
)
SELECT c.prev_type, c.event_type, c.n_steps,
       CAST(round(c.n_steps::DOUBLE / o.n_out * 10000) AS BIGINT) / 10000.0
           AS p_transition
FROM counts c JOIN outgoing o USING (prev_type)
ORDER BY 1, 2
"""


def qt15_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history of each user's event-type
    state: consecutive re-observations of the same type collapse into one
    version; each change opens a version with [valid_from, valid_to)
    bounds, a per-user version number, and a single is_current row — the
    dimension-build twin of apply_cdc (operators/merge.scd2_history).

    Shape: both windows partition on user_id, so the plan is one exchange;
    the collapse filter runs between them (lead/row_number see only
    version opens).
    """
    from streamsurfer_spark.operators.merge import scd2_history

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    hist = scd2_history(
        ev, keys="user_id", time_col="ts", tiebreak="event_id",
        attrs=["event_type"],
    )
    return hist.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.date_format("valid_from", TS_FMT).alias("valid_from"),
        F.date_format("valid_to", TS_FMT).alias("valid_to"),
        "version",
        "is_current",
    ).orderBy("user_id", "version")


QT15_SQL = """
WITH ordered AS (
    SELECT user_id, event_type, ts, event_id,
           lag(event_type) OVER w AS prev_type,
           lag(1) OVER w AS prev_mark
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
opens AS (
    SELECT user_id, event_type, ts, event_id FROM ordered
    WHERE prev_mark IS NULL OR prev_type IS DISTINCT FROM event_type
),
v AS (
    SELECT user_id, event_type AS state, ts AS vf,
           lead(ts) OVER w2 AS vt,
           row_number() OVER w2 AS version
    FROM opens
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, state,
       strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(vt, '%Y-%m-%d %H:%M:%S') AS valid_to,
       version, vt IS NULL AS is_current
FROM v ORDER BY user_id, version
"""


# --- qt16: PSI distribution drift ---------------------------------------------


def qt16_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of `value` between the first and second
    half of each event type's time range (operators/profile.psi_drift —
    exact cent-grid binning, micro-nat ln discipline, BIGINT PSI fold;
    two tiny grouped passes, no wide shuffle)."""
    ev = table(spark, sf_dir, "events")
    from streamsurfer_spark.operators.profile import psi_drift

    return psi_drift(ev)


QT16_SQL = """
WITH base AS (
    SELECT event_type AS grp,
           CAST(round(value::DOUBLE * 100) AS BIGINT) AS cents, ts
    FROM events
),
ext AS (
    SELECT grp, min(ts) ts_min, max(ts) ts_max,
           min(cents) cmin, max(cents) cmax
    FROM base GROUP BY 1
),
binned AS (
    SELECT b.grp,
           CASE WHEN date_diff('microsecond', ts_min, ts)
                     <= date_diff('microsecond', ts_min, ts_max) // 2
                THEN 0 ELSE 1 END AS half,
           ((cents - cmin) * 10) // (cmax - cmin + 1) AS bin
    FROM base b JOIN ext USING (grp)
),
cnt AS (
    SELECT grp, bin,
           sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS c1,
           sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS c2
    FROM binned GROUP BY 1, 2
),
tot AS (SELECT grp, sum(c1) AS n1, sum(c2) AS n2 FROM cnt GROUP BY 1),
terms AS (
    SELECT grp, n1, n2,
           CAST(round((ln((c1 + 1)::DOUBLE) + ln((n2 + 10)::DOUBLE)
                     - ln((c2 + 1)::DOUBLE) - ln((n1 + 10)::DOUBLE))
                      * 1000000) AS BIGINT) AS lr_micro,
           (c1 + 1)::DOUBLE / (n1 + 10)::DOUBLE
             - (c2 + 1)::DOUBLE / (n2 + 10)::DOUBLE AS pq_diff
    FROM cnt JOIN tot USING (grp)
)
SELECT grp AS event_type,
       CAST(max(n1) AS BIGINT) AS n_first, CAST(max(n2) AS BIGINT) AS n_second,
       CAST(round(sum(CAST(round(pq_diff * lr_micro) AS BIGINT))::DOUBLE / 100)
            AS BIGINT) / 10000.0 AS psi
FROM terms GROUP BY 1 ORDER BY 1
"""


# --- qt17: linear multi-touch attribution --------------------------------------

ATTRIB_LOOKBACK_S = 24 * 3600
ATTRIB_TOUCH_TYPES = ("click", "view")


def qt17_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase splits one unit of
    credit equally across the user's click/view touches in the preceding
    24 h (strictly before the purchase). The marketing-analytics
    workhorse between last-touch (qt01's as-of pick) and position decay.

    Composition: the candidate pairs come from operators/asof.range_join
    (bucketed equi-join — the corpus never sees an unbounded inequality
    join; see its module doc for the 100 TB topology), then exact
    integer credit: per (purchase, touch_type) counts c with window
    total k, micro-credit = round(c·10⁶/k) (one division on identical
    doubles, tie-proof integer round), summed as BIGINT per type.

    Scale: |purchases| × bounded-window touches per user — skew follows
    hot users, which the bucketed join spreads across (user, bucket)
    partitions; aggregation keys are (purchase, type) then |types|.
    """
    ev = table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    touches = ev.where(F.col("event_type").isin(*ATTRIB_TOUCH_TYPES)).select(
        F.col("event_id").alias("t_id"),
        "user_id",
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
    )
    pairs = range_join(
        purchases,
        touches,
        key="user_id",
        left_time="p_ts",
        right_time="t_ts",
        lower_seconds=-ATTRIB_LOOKBACK_S,
        upper_seconds=0,
    ).where(F.col("t_ts") < F.col("p_ts"))
    c = pairs.groupBy("p_id", "touch_type").agg(F.count("*").alias("c"))
    k = c.withColumn("k", F.sum("c").over(Window.partitionBy("p_id")))
    m = k.withColumn(
        "micro",
        F.expr("cast(round(cast(c * 1000000 as double) / cast(k as double)) as bigint)"),
    )
    return (
        m.groupBy("touch_type")
        .agg(
            F.sum("c").cast("bigint").alias("n_touches"),
            F.countDistinct("p_id").cast("bigint").alias("n_purchases"),
            scaled_round(F.sum("micro") / F.lit(1000000.0), 4).alias(
                "attributed_credit"
            ),
        )
        .orderBy("touch_type")
    )


QT17_SQL = f"""
WITH p AS (
    SELECT event_id AS p_id, user_id, ts AS p_ts
    FROM events WHERE event_type = 'purchase'
),
t AS (
    SELECT event_id AS t_id, user_id, ts AS t_ts, event_type AS touch_type
    FROM events WHERE event_type IN ('click', 'view')
),
j AS (
    SELECT p.p_id, t.touch_type
    FROM p JOIN t USING (user_id)
    WHERE t.t_ts < p.p_ts
      AND t.t_ts >= p.p_ts - INTERVAL {ATTRIB_LOOKBACK_S} SECOND
),
c AS (SELECT p_id, touch_type, count(*) AS c FROM j GROUP BY 1, 2),
k AS (SELECT p_id, touch_type, c, sum(c) OVER (PARTITION BY p_id) AS k FROM c),
m AS (
    SELECT p_id, touch_type, c,
           CAST(round((c * 1000000)::DOUBLE / k::DOUBLE) AS BIGINT) AS micro
    FROM k
)
SELECT touch_type,
       CAST(sum(c) AS BIGINT) AS n_touches,
       CAST(count(DISTINCT p_id) AS BIGINT) AS n_purchases,
       {scaled_round_sql("sum(micro)::DOUBLE / 1000000.0", 4)} AS attributed_credit
FROM m GROUP BY 1 ORDER BY 1
"""


# --- qt18: CUSUM changepoint detection ----------------------------------------


def qt18_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline CUSUM changepoint over each event type's daily volume: the
    day where |Σ_{i≤d}(x_i − mean)| peaks — the classic mean-shift
    location estimator (the CUSUM-chart / Taylor changepoint form; the
    cumulative deviation from the GLOBAL mean is extremal exactly at the
    shift, unlike Page's sequential reset form, which accumulates until
    the drift END).

    Exactness: with x_d the integer daily count, scaling by the day
    count D clears the mean's division: c_d = cum_d·D − d·T is an exact
    BIGINT (T = Σx ≤ corpus rows; |c_d| ≤ T·D — BIGINT through ~10⁹
    rows × 10⁴ days; the DECIMAL upgrade is mechanical if a corpus
    outgrows it), so peak picking and the earliest-day tiebreak are
    integer comparisons. Only the displayed peak divides (by D²: once
    for the implicit mean, once for the per-day average deviation).

    Plan/scale: one daily rollup (groupBy event_type, day — partial
    aggregation collapses map-side), then windows over ≤|types|·|days|
    rows sharing ONE (event_type, day) sort, then a 1-row-per-type pick.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("x"))
    wt = Window.partitionBy("event_type")
    wo = wt.orderBy("day")
    run = wo.rowsBetween(Window.unboundedPreceding, 0)
    c = (
        daily.withColumn("d_idx", F.row_number().over(wo))
        .withColumn("cum", F.sum("x").over(run))
        .withColumn("total", F.sum("x").over(wt))
        .withColumn("n_days", F.count("*").over(wt))
        .withColumn(
            "c", F.col("cum") * F.col("n_days") - F.col("d_idx") * F.col("total")
        )
        .withColumn("s", F.abs("c"))
    )
    pick = Window.partitionBy("event_type").orderBy(F.desc("s"), "day")
    return (
        c.withColumn("_rn", F.row_number().over(pick))
        .where(F.col("_rn") == 1)
        .select(
            "event_type",
            F.col("n_days").cast("bigint").alias("n_days"),
            F.date_format("day", "yyyy-MM-dd").alias("change_day"),
            scaled_round(
                F.try_divide(F.col("s"), F.col("n_days") * F.col("n_days")), 2
            ).alias("peak_cusum"),
        )
        .orderBy("event_type")
    )


QT18_SQL = f"""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
    FROM events GROUP BY 1, 2
),
c AS (
    SELECT event_type, day, x,
           row_number() OVER wo AS d_idx,
           sum(x) OVER wrun AS cum,
           sum(x) OVER wt AS total,
           count(*) OVER wt AS n_days
    FROM daily
    WINDOW wo AS (PARTITION BY event_type ORDER BY day),
           wrun AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wt AS (PARTITION BY event_type)
),
cs AS (
    SELECT *, abs(cum * n_days - d_idx * total) AS s FROM c
),
pick AS (
    SELECT *, row_number() OVER (PARTITION BY event_type
                                 ORDER BY s DESC, day) AS rn
    FROM cs
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       strftime(day, '%Y-%m-%d') AS change_day,
       {scaled_round_sql("s::DOUBLE / (n_days * n_days)::DOUBLE", 2)} AS peak_cusum
FROM pick WHERE rn = 1 ORDER BY event_type
"""


# --- qt19: native batch session_window parity -----------------------------------

QT19_GAP = "30 minutes"


def qt19_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions via Spark's NATIVE session_window aggregate in
    BATCH mode — the same semantics qt03 composes from lag/sum windows,
    expressed through the engine's dedicated operator (and the same
    session_window the streaming path uses in qs03/qs08, so batch and
    stream sessions are provably one definition). Spark's boundary rule,
    pinned by test_properties_r8b's planted-boundary test (which caught
    the opposite assumption): an event at EXACTLY last + gap still
    MERGES (adjacent [ts, ts+gap) ranges union); only a STRICTLY larger
    gap starts a new session — the oracle mirrors that with `>`, the
    same convention qt03's composed sessionizer uses.

    Scale: session_window aggregates partition by user_id — one hash
    exchange + per-partition sort-merge of overlapping windows; no
    window-function pass at all.
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", QT19_GAP).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), _sum6("value").alias("sum_value"))
        .select(
            "user_id",
            F.date_format("w.start", TS_FMT).alias("session_start"),
            F.date_format("w.end", TS_FMT).alias("session_end"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


QT19_SQL = f"""
WITH flagged AS (
    SELECT user_id, ts, value, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT *, sum(is_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS sid
    FROM flagged
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
           AS session_end,
       count(*) AS n_events,
       {_duck_sum6("value")} AS sum_value
FROM sess GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


# --- qt20: rolling distinct actives (DAU / WAU / MAU) --------------------------

QT20_MAU_DAYS = 28


def qt20_rolling_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling distinct-user actives per day: DAU, 7-day WAU, 28-day MAU
    — the engagement triple every product pipeline charts. Rolling
    DISTINCT counts have no window-function form (count(DISTINCT) OVER a
    frame is unsupported on both engines), so the operator fans each
    (user, active-day) pair out to the ≤28 grid days it serves (a
    map-only explode) and takes three conditional distinct counts per
    grid day — the standard shuffle-once formulation.

    Exactness: pure integer dates and counts, no floats anywhere.
    Scale: |user-days|·28 rows into one grouped distinct-aggregate
    (Spark plans a single Expand for the three DISTINCT branches);
    partial distinct aggregation collapses duplicates map-side. Grid
    days are clamped to the observed max via a one-row broadcast —
    no driver collect.
    """
    ev = table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    ext = ev.agg(F.max(F.to_date("ts")).alias("max_day"))
    fan = (
        ud.select(
            "user_id",
            "day",
            F.explode(F.expr(f"sequence(0, {QT20_MAU_DAYS - 1})")).alias("off"),
        )
        .select("user_id", F.expr("date_add(day, off)").alias("g_day"), "off")
        .crossJoin(F.broadcast(ext))
        .where(F.col("g_day") <= F.col("max_day"))
    )
    return (
        fan.groupBy("g_day")
        .agg(
            F.countDistinct(
                F.when(F.col("off") == 0, F.col("user_id"))
            ).cast("bigint").alias("dau"),
            F.countDistinct(
                F.when(F.col("off") <= 6, F.col("user_id"))
            ).cast("bigint").alias("wau7"),
            F.countDistinct("user_id").cast("bigint").alias("mau28"),
        )
        .select(F.date_format("g_day", "yyyy-MM-dd").alias("day"), "dau", "wau7", "mau28")
        .orderBy("day")
    )


QT20_SQL = f"""
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
ext AS (SELECT max(CAST(ts AS DATE)) AS max_day FROM events),
fan AS (
    SELECT user_id, day + CAST(o AS INT) AS g_day, o
    FROM ud, (SELECT unnest(range({QT20_MAU_DAYS})) AS o)
),
b AS (SELECT f.* FROM fan f, ext WHERE f.g_day <= ext.max_day)
SELECT strftime(g_day, '%Y-%m-%d') AS day,
       CAST(count(DISTINCT CASE WHEN o = 0 THEN user_id END) AS BIGINT) AS dau,
       CAST(count(DISTINCT CASE WHEN o <= 6 THEN user_id END) AS BIGINT) AS wau7,
       CAST(count(DISTINCT user_id) AS BIGINT) AS mau28
FROM b GROUP BY g_day ORDER BY day
"""


# --- qt21: rolling discrete median ---------------------------------------------

QT21_FRAME_DAYS = 7


def qt21_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-row discrete median of each event type's daily cent
    volume — the robust trend line next to qt08's rolling mean/sigma.
    Spark has NO percentile window function, so the operator composes
    one: collect the trailing frame, array_sort, pick element
    ⌈n/2⌉ (1-based) — exactly SQL percentile_disc(0.5), which DuckDB's
    windowed quantile_disc implements natively; our composed frame must
    reproduce the dedicated implementation bit-for-bit. Everything is
    BIGINT cents: no float exists in the whole query.

    Scale: frames are constant-width (7 rows of 8-byte ints per row), so
    the collect_list is bounded regardless of corpus size; one
    (event_type) exchange shared by the daily rollup's partial
    aggregation and the window sort.
    """
    ev = table(spark, sf_dir, "events")
    cents = F.round(F.col("value").cast("double") * 100).cast("bigint")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(cents).alias("daily_cents")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(QT21_FRAME_DAYS - 1), 0)
    )
    frame = F.array_sort(F.collect_list("daily_cents").over(w))
    med = F.expr(
        "element_at(_frame, cast((size(_frame) + 1) div 2 as int))"
    )
    return (
        daily.withColumn("_frame", frame)
        .withColumn("med7_cents", med)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "daily_cents",
            "med7_cents",
        )
        .orderBy("event_type", "day")
    )


QT21_SQL = f"""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(sum(CAST(round(value::DOUBLE * 100) AS BIGINT)) AS BIGINT)
               AS daily_cents
    FROM events GROUP BY 1, 2
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, daily_cents,
       CAST(quantile_disc(daily_cents, 0.5) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN {QT21_FRAME_DAYS - 1} PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS med7_cents
FROM daily
ORDER BY event_type, day
"""


# --- qt22: seasonal-naive forecast backtest -------------------------------------

QT22_SEASON_DAYS = 7


def qt22_seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (predict today's volume
    = the same weekday last week) per event type: scored days, MAE, and
    signed bias — the baseline every volume-forecasting pipeline must
    beat, and the drift alarm when a formerly-stable series stops being
    weekly-seasonal.

    Exactness: daily counts are integers; the forecast join is a
    DAY-ALIGNED self-join on day − 7 (an exact date equality — NOT a
    lag(7) row frame, which silently misaligns across calendar gaps), so
    every error x − f is an exact BIGINT; MAE and bias are single
    exact-int divisions through scaled_round.

    Scale: one daily rollup (map-side combined) then a self-join of the
    ≤|types|·|days| frame on (type, day) — both tiny regardless of
    corpus size.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("x"))
    fc = daily.select(
        "event_type",
        F.date_add("day", QT22_SEASON_DAYS).alias("day"),
        F.col("x").alias("f"),
    )
    scored = daily.join(fc, ["event_type", "day"]).withColumn(
        "e", F.col("x") - F.col("f")
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_scored"),
            scaled_round(
                F.try_divide(F.sum(F.abs("e")), F.count("*")), 2
            ).alias("mae"),
            scaled_round(F.try_divide(F.sum("e"), F.count("*")), 2).alias("bias"),
        )
        .orderBy("event_type")
    )


QT22_SQL = f"""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
    FROM events GROUP BY 1, 2
),
scored AS (
    SELECT d.event_type, d.x - f.x AS e
    FROM daily d
    JOIN daily f ON f.event_type = d.event_type
                AND f.day = d.day - {QT22_SEASON_DAYS}
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_scored,
       {scaled_round_sql("sum(abs(e))::DOUBLE / count(*)", 2)} AS mae,
       {scaled_round_sql("sum(e)::DOUBLE / count(*)", 2)} AS bias
FROM scored GROUP BY 1 ORDER BY 1
"""


QUERIES: dict[str, QuerySpec] = {
    "qt01_asof_last_click": QuerySpec(
        qt01_asof_last_click, QT01_SQL, "as-of join (union-sort) vs native DuckDB ASOF"
    ),
    "qt02_range_join_errors": QuerySpec(
        qt02_range_join_errors, QT02_SQL, "bucketed range join vs inequality join"
    ),
    "qt03_sessionize": QuerySpec(
        qt03_sessionize, QT03_SQL, "gap-based sessionization (lag + running sum)"
    ),
    "qt04_gapfill_daily": QuerySpec(
        qt04_gapfill_daily, QT04_SQL, "daily rollup densified over the day axis"
    ),
    "qt05_ohlc_bars": QuerySpec(
        qt05_ohlc_bars, QT05_SQL, "daily OHLC downsample via struct-keyed min_by/max_by"
    ),
    "qt06_resample_interpolate": QuerySpec(
        qt06_resample_interpolate, QT06_SQL, "hourly resample with linear interpolation"
    ),
    "qt07_ewma_smoothing": QuerySpec(
        qt07_ewma_smoothing, QT07_SQL, "EWMA smoothing over pre-aggregated daily series"
    ),
    "qt08_rolling_anomaly": QuerySpec(
        qt08_rolling_anomaly,
        QT08_SQL,
        "rolling 3-sigma anomaly flags via exact-int trailing-frame moments",
    ),
    "qt09_time_weighted_avg": QuerySpec(
        qt09_time_weighted_avg,
        QT09_SQL,
        "LOCF time-weighted average per user-day (TimescaleDB time_weight parity)",
    ),
    "qt10_nearest_error": QuerySpec(
        qt10_nearest_error,
        QT10_SQL,
        "bidirectional nearest-event as-of join with tolerance (union-sort)",
    ),
    "qt11_seasonal_profile": QuerySpec(
        qt11_seasonal_profile,
        QT11_SQL,
        "hour-of-day seasonal profile + exact-moment 2-sigma outlier counts",
    ),
    "qt12_funnel": QuerySpec(
        qt12_funnel,
        QT12_SQL,
        "ordered conversion funnel view → click → purchase (keyed chain)",
    ),
    "qt13_cohort_retention": QuerySpec(
        qt13_cohort_retention,
        QT13_SQL,
        "weekly cohort retention triangle (exact integer week math)",
    ),
    "qt14_transition_matrix": QuerySpec(
        qt14_transition_matrix,
        QT14_SQL,
        "event-type transition matrix per user stream (Markov paths)",
    ),
    "qt15_scd2_user_state": QuerySpec(
        qt15_scd2_user_state,
        QT15_SQL,
        "type-2 SCD history build with no-op-change collapse",
    ),
    "qt16_psi_drift": QuerySpec(
        qt16_psi_drift,
        QT16_SQL,
        "PSI value-distribution drift per event type (first vs second half)",
    ),
    "qt17_linear_attribution": QuerySpec(
        qt17_linear_attribution,
        QT17_SQL,
        "linear multi-touch attribution over a 24h lookback (range join)",
    ),
    "qt18_cusum_changepoint": QuerySpec(
        qt18_cusum_changepoint,
        QT18_SQL,
        "two-sided CUSUM volume changepoint (exact-int running windows)",
    ),
    "qt19_session_window_native": QuerySpec(
        qt19_session_window_native,
        QT19_SQL,
        "Spark-native batch session_window vs gaps-and-islands oracle",
    ),
    "qt20_rolling_actives": QuerySpec(
        qt20_rolling_actives,
        QT20_SQL,
        "rolling DAU/WAU/MAU distinct actives (fan-out distinct aggregate)",
    ),
    "qt21_rolling_median": QuerySpec(
        qt21_rolling_median,
        QT21_SQL,
        "rolling 7-row discrete median (composed percentile window)",
    ),
    "qt22_seasonal_backtest": QuerySpec(
        qt22_seasonal_backtest,
        QT22_SQL,
        "seasonal-naive forecast backtest (day-aligned exact-int MAE/bias)",
    ),
}
