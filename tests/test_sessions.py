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


def test_rolling_anomaly_flags_spike(spark):
    """A flat series with one spike: only the spike trips the exact-int 3σ
    test (variance 0 history -> any deviation flags)."""
    import datetime as dt

    import pyspark.sql.functions as F

    from streamsurfer_spark.queries.timeseries_q import qt08_rolling_anomaly

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), 1, "click", 10.0 if i != 15 else 500.0, "{}")
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    import os, tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        got = qt08_rolling_anomaly(spark, d).collect()
    assert [r["event_id"] for r in got] == [15]


def test_time_weighted_avg_hand_example(spark):
    """Two segments: value 100 held 10s, value 200 held 30s -> TWA = 175."""
    import datetime as dt
    import os, tempfile

    from streamsurfer_spark.queries.timeseries_q import qt09_time_weighted_avg

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 1, "click", 100.0, "{}"),
        (2, base + dt.timedelta(seconds=10), 1, "click", 200.0, "{}"),
        (3, base + dt.timedelta(seconds=40), 1, "click", 999.0, "{}"),  # no next -> dropped
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        got = qt09_time_weighted_avg(spark, d).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_segments"] == 2
    assert r["total_dur_us"] == 40_000_000
    assert r["twa_value"] == 175.0


def test_time_weighted_avg_staleness_cap(spark):
    """A gap longer than 1h contributes exactly 1h of the stale value."""
    import datetime as dt
    import os, tempfile

    from streamsurfer_spark.queries.timeseries_q import TWA_CAP_US, qt09_time_weighted_avg

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 1, "click", 100.0, "{}"),
        (2, base + dt.timedelta(hours=5), 1, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        got = qt09_time_weighted_avg(spark, d).collect()
    assert got[0]["total_dur_us"] == TWA_CAP_US
    assert got[0]["twa_value"] == 100.0


def test_gapfill_keeps_null_series_aggregates(spark):
    """A NULL series key is a real group: its true aggregates must land on
    its days instead of being zero-filled (null-unsafe join dropped them
    — r7 review)."""
    t0 = dt.datetime(2024, 1, 1, 10, 0)
    df = spark.createDataFrame(
        [(None, t0), (None, t0), ("a", t0)], "series string, ts timestamp"
    )
    got = {
        (r.series, str(r.day)): r.n
        for r in gapfill_daily(
            df, "series", F.to_date("ts"), [F.count("*").alias("n")]
        ).collect()
    }
    assert got[(None, "2024-01-01")] == 2
    assert got[("a", "2024-01-01")] == 1
