"""Batch sessionization and time-axis gap-fill (hypertable-style rollups).

No counterpart in the reference (/root/reference/main.go:1-312 has no
event-time logic at all — its only timestamp is a processing-time stamp,
main.go:179; SURVEY §2.2). These are engine-side time-series operators that
complement the streaming ``session_window`` (queries/streaming_q.py qs03)
with their batch twins:

- ``sessionize``: the classic lag → gap flag → running-sum session id
  construction. Equivalent to what a time-series database calls
  "sessionize" / what SQL folks write with two window functions.
- ``gapfill_daily``: densify a sparse per-day rollup so every day in the
  observed span has a row (missing days filled with zeros) — the batch
  analog of a hypertable's ``time_bucket_gapfill``.

Scale notes (100 TB):
- ``sessionize`` shuffles once on the session key; both windows share the
  same (key, ts) partitioning so Spark plans ONE exchange + ONE sort and
  evaluates lag and the running sum in the same Window stage. Key
  cardinality (users) is high → well spread; no skew expected.
- ``gapfill_daily`` builds the dense day axis from a 1-row global min/max
  aggregate cross-joined to the distinct series keys — the generated axis
  is (days × series), tiny relative to the fact table, and the fill join
  is a broadcast of the rolled-up aggregate, never the raw events.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str | None = "event_id",
) -> DataFrame:
    """Assign a per-key session id: a new session starts when the gap from
    the previous event exceeds ``gap_seconds``.

    Returns the input plus ``session_id`` (1-based, per key, in time order).
    ``order_tiebreak`` pins the within-timestamp order so session
    boundaries are reproducible when timestamps collide.
    """
    order_cols = [F.col(ts_col)]
    if order_tiebreak:
        order_cols.append(F.col(order_tiebreak))
    w = Window.partitionBy(key).orderBy(*order_cols)
    prev_ts = F.lag(ts_col).over(w)
    # interval comparison instead of unix_micros arithmetic: exact at µs
    # resolution on both engines AND type-agnostic — works whether ts is
    # TIMESTAMP or TIMESTAMP_NTZ (unix_micros rejects NTZ, and fixtures
    # have shipped both physical types across rounds)
    gap_over = F.col(ts_col) > prev_ts + F.expr(f"INTERVAL {gap_seconds} SECONDS")
    is_new = F.when(prev_ts.isNull() | gap_over, F.lit(1)).otherwise(F.lit(0))
    # the running sum of new-session flags IS the session ordinal; both
    # windows share (key, ts[, tiebreak]) so Catalyst plans a single
    # exchange+sort and one Window node
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def gapfill_daily(
    df: DataFrame,
    series_col: str,
    date_col: Column,
    aggs: list[Column],
    fill: dict[str, Column] | None = None,
) -> DataFrame:
    """Per-(series, day) rollup densified over the global [min, max] day span.

    ``date_col`` is a date-typed column expression over ``df``; ``aggs`` are
    the per-day aggregates; ``fill`` maps agg alias → fill expression for
    the generated (missing) days (default: bigint 0).

    The dense axis is sequence(min_day, max_day) exploded once from a
    single-row aggregate, cross-joined with the distinct series keys —
    O(days × series) rows, independent of fact-table size.
    """
    with_day = df.withColumn("_day", date_col)
    rolled = with_day.groupBy(series_col, "_day").agg(*aggs)
    agg_names = [c for c in rolled.columns if c not in (series_col, "_day")]
    span = with_day.agg(
        F.min("_day").alias("_lo"), F.max("_day").alias("_hi")
    )
    days = span.select(
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("day")
    )
    series = with_day.select(F.col(series_col).alias("_series")).distinct()
    axis = days.crossJoin(series)
    fill = fill or {}
    out_cols = [
        F.col("_series").alias(series_col),
        F.col("day"),
    ] + [
        F.coalesce(F.col(n), fill.get(n, F.lit(0).cast("bigint"))).alias(n)
        for n in agg_names
    ]
    # null-safe on the series key: a NULL series is a real group (groupBy
    # counts it), and plain equality would zero-fill ALL its days while its
    # true aggregates silently vanish (r7 review). No forced broadcast:
    # rolled is O(series × days) — small relative to the facts but NOT
    # absolutely bounded (1e6 series × 1000 days ≈ 1e9 rows would blow the
    # broadcast limit); AQE still broadcasts it when it is actually small.
    return (
        axis.join(
            rolled,
            axis["_series"].eqNullSafe(rolled[series_col])
            & (axis["day"] == rolled["_day"]),
            "left",
        )
        .select(*out_cols)
    )
