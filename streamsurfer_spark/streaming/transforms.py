"""Stream/batch-shared transformations (SURVEY §2.3 C).

The reference's only streaming concept is a byte-triggered in-memory queue
(/root/reference/main.go:197-231 — no windows, no watermarks, no event
time; SURVEY §2.2). The engine generalizes to Structured Streaming's full
surface. Every function here takes a DataFrame and works identically on
``spark.read`` and ``spark.readStream`` inputs — that duality IS the
stream-batch parity contract (tested in tests/test_streaming.py; the batch
side is oracle-checked against DuckDB in streaming_q.py).

Scale notes (100 TB/day of events):
- Windowed aggregates shuffle on (window, key) — bounded cardinality per
  trigger, partial aggregation map-side. Watermarks bound state: expired
  windows are evicted, so state size ~ (watermark horizon / slide) × keys.
- Session windows keep one open session per key in state; the gap bounds
  their lifetime. Skewed users (bot traffic) are the risk — mitigate
  upstream with a per-key event cap or salted pre-aggregation.
- Dedup state is keyed by the dedup columns; ``within_watermark`` variants
  evict state, unbounded variants must only be used on bounded keys.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

TUMBLE = "6 hours"
SLIDE_LEN = "1 day"
SLIDE_STEP = "12 hours"
SESSION_GAP = "4 hours"
WATERMARK = "1 day"

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def tumbling_counts(df: DataFrame, window: str = TUMBLE) -> DataFrame:
    """Per-(window, event_type) counts + value sums over a tumbling window."""
    return (
        df.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", TS_FMT).alias("w_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    df: DataFrame, length: str = SLIDE_LEN, step: str = SLIDE_STEP
) -> DataFrame:
    """Overlapping-window counts: each event lands in length/step windows."""
    return (
        df.groupBy(F.window("ts", length, step).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format("w.start", TS_FMT).alias("w_start"),
            "event_type",
            "n_events",
        )
    )


def session_counts(df: DataFrame, gap: str = SESSION_GAP) -> DataFrame:
    """Per-user sessions: a gap strictly greater than `gap` starts a new
    session — an event at exactly last_ts + gap MERGES into the open session.

    Spark's session_window treats windows as [start, start+gap) per event and
    merges on overlap-or-touch, so the exactly-at-gap event extends the
    session. The oracles (qs03/qs08) encode the same `>` split rule; the
    planted-boundary test (tests/test_properties_r8b.py, qt19 exact-boundary
    grid) pins this convention after the original `>=` doc wording caused an
    eight-rounds-latent oracle bug (fixed r8).

    session_window keeps one open session per user in streaming state; the
    batch plan lowers to a sort-based session assignment within each user
    partition — both views produce identical sessions (parity-tested).
    """
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.min("event_id").alias("first_event_id"),
        )
        .select(
            "user_id",
            F.date_format("w.start", TS_FMT).alias("session_start"),
            "n_events",
            "sum_value",
            "first_event_id",
        )
    )


def dedup_earliest(df: DataFrame, keys: tuple[str, ...] = ("user_id", "event_type")) -> DataFrame:
    """Deterministic batch dedup: keep the earliest event per key.

    Streaming twin: ``streaming_dedup`` (dropDuplicates keeps the FIRST
    arrival, which on an event-time-ordered replay is the same row —
    parity-tested in tests/test_streaming.py).
    """
    w = Window.partitionBy(*keys).orderBy("ts", "event_id")
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(*keys, "event_id", F.date_format("ts", TS_FMT).alias("first_ts"))
    )


def streaming_dedup(
    df: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str | None = WATERMARK,
) -> DataFrame:
    """Stateful streaming dedup. With a watermark, state for keys older than
    the horizon is evicted (dropDuplicatesWithinWatermark) — mandatory at
    scale; the unbounded variant exists for bounded key domains only."""
    if watermark is not None:
        return df.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(list(keys))
    return df.dropDuplicates(list(keys))


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    lower_seconds: int,
    upper_seconds: int,
    watermark: str = WATERMARK,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join within a bounded event-time interval.

    how="leftOuter" emits unmatched left rows (right side NULL) once the
    watermark guarantees no match can still arrive — the state-safe outer
    join only the interval bound + watermark combination makes possible.

    Both sides carry watermarks and the join condition bounds right_time
    relative to left_time — the two requirements that let Spark evict join
    state (otherwise both sides buffer forever). State per side ≈ rows
    within (watermark + interval) of the frontier, independent of total
    stream length. Works identically on batch inputs (parity-tested
    against the bucketed batch range_join).
    """
    l = left.withWatermark(left_time, watermark).alias("l")
    r = right.withWatermark(right_time, watermark).alias("r")
    lt, rt = F.col(f"l.{left_time}"), F.col(f"r.{right_time}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rt >= lt + F.expr(f"INTERVAL {lower_seconds} SECONDS"))
        & (rt <= lt + F.expr(f"INTERVAL {upper_seconds} SECONDS"))
    )
    return l.join(r, cond, how)


def watermarked_sessions(
    df: DataFrame, gap: str = SESSION_GAP, watermark: str = WATERMARK
) -> DataFrame:
    """Session windows under a watermark: the stateful-streaming session
    operator. A session stays open in state while events keep arriving
    within `gap`; it finalizes (append mode) once the watermark passes its
    end. State per key is one open session — the gap bounds its lifetime,
    the watermark bounds total state.

    Delegates to ``session_counts`` after applying the watermark — the
    batch/stream parity pair shares ONE agg/select block by construction
    (previously a verbatim copy that had to be edited in lockstep — r7
    review)."""
    return session_counts(df.withWatermark("ts", watermark), gap)


def watermarked_tumbling(
    df: DataFrame, window: str = TUMBLE, watermark: str = WATERMARK
) -> DataFrame:
    """Tumbling counts with late-data policy: rows later than `watermark`
    behind the max seen event time are dropped; windows finalize (append
    mode) once the watermark passes their end."""
    return (
        df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format("w.start", TS_FMT).alias("w_start"),
            "event_type",
            "n_events",
        )
    )
