"""Edge-semantics tests for sessionization and gap-fill (operators/sessions.py).

The oracle suite (qt03/qt04) proves fixture-scale parity with DuckDB; these
pin the documented boundary behaviors on crafted rows.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from streamsurfer_spark.operators.sessions import gapfill_daily, sessionize


def _t(h: int, m: int = 0, s: int = 0, us: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, m, s, us)


def _sessions(spark, rows):
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    out = sessionize(df, key="user_id", gap_seconds=1800)
    return {r.event_id: r.session_id for r in out.collect()}


def test_gap_equal_to_threshold_stays_in_session(spark):
    # strictly-greater semantics: a gap of exactly 1800s does NOT split
    got = _sessions(
        spark, [(1, 1, _t(10, 0)), (1, 2, _t(10, 30))]
    )
    assert got == {1: 1, 2: 1}


def test_gap_one_microsecond_over_splits(spark):
    got = _sessions(
        spark, [(1, 1, _t(10, 0)), (1, 2, _t(10, 30, 0, 1))]
    )
    assert got == {1: 1, 2: 2}


def test_sessions_are_per_key(spark):
    got = _sessions(
        spark,
        [(1, 1, _t(10)), (1, 2, _t(12)), (2, 3, _t(10)), (2, 4, _t(10, 10))],
    )
    assert got == {1: 1, 2: 2, 3: 1, 4: 1}


def test_single_window_exchange(spark):
    """Both window functions (lag + running sum) share one shuffle + sort."""
    df = spark.createDataFrame(
        [(1, 1, _t(10))], "user_id long, event_id long, ts timestamp"
    )
    plan = (
        sessionize(df, key="user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert plan.count("Sort") == 1


def test_gapfill_fills_missing_days_with_zeros(spark):
    df = spark.createDataFrame(
        [
            ("a", dt.datetime(2024, 1, 1, 5), 1.0),
            ("a", dt.datetime(2024, 1, 3, 5), 2.0),
            ("b", dt.datetime(2024, 1, 2, 5), 5.0),
        ],
        "k string, ts timestamp, v double",
    )
    out = gapfill_daily(
        df,
        series_col="k",
        date_col=F.to_date("ts"),
        aggs=[F.count("*").alias("n"), F.round(F.sum("v"), 2).alias("sv")],
        fill={"sv": F.lit(0.0)},
    )
    rows = {(r.k, str(r.day)): (r.n, r.sv) for r in out.collect()}
    # dense axis: 3 days x 2 series = 6 rows, missing combos zero-filled
    assert len(rows) == 6
    assert rows[("a", "2024-01-02")] == (0, 0.0)
    assert rows[("b", "2024-01-01")] == (0, 0.0)
    assert rows[("b", "2024-01-02")] == (1, 5.0)
    assert rows[("a", "2024-01-03")] == (1, 2.0)
