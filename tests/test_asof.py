"""Edge-semantics tests for the composed as-of / range joins.

The oracle suite proves parity with DuckDB's native ASOF JOIN on fixture
data; these pin the documented boundary behaviors on crafted rows.
"""

from __future__ import annotations

import datetime as dt

from streamsurfer_spark.operators.asof import asof_join, range_join


def _t(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, m)


def test_asof_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, 10, _t(12))], "lid long, k long, lt timestamp"
    )
    right = spark.createDataFrame(
        [(10, _t(11), 100), (10, _t(12), 200), (10, _t(13), 300)],
        "k long, rt timestamp, payload long",
    )
    rows = asof_join(left, right, "k", "lt", "rt", ["payload"]).collect()
    # equal timestamp is visible (at-or-before), 13:00 is not
    assert [(r.lid, r.payload) for r in rows] == [(1, 200)]


def test_asof_no_prior_row_yields_null(spark):
    left = spark.createDataFrame([(1, 10, _t(9))], "lid long, k long, lt timestamp")
    right = spark.createDataFrame([(10, _t(11), 100)], "k long, rt timestamp, payload long")
    rows = asof_join(left, right, "k", "lt", "rt", ["payload"]).collect()
    assert [(r.lid, r.payload) for r in rows] == [(1, None)]


def test_asof_keys_do_not_leak(spark):
    left = spark.createDataFrame(
        [(1, 10, _t(12)), (2, 20, _t(12))], "lid long, k long, lt timestamp"
    )
    right = spark.createDataFrame([(10, _t(11), 100)], "k long, rt timestamp, payload long")
    rows = {r.lid: r.payload for r in asof_join(left, right, "k", "lt", "rt", ["payload"]).collect()}
    assert rows == {1: 100, 2: None}


def test_range_join_bounds_inclusive(spark):
    left = spark.createDataFrame([(1, 10, _t(12))], "lid long, k long, lt timestamp")
    right = spark.createDataFrame(
        [
            (10, 1, _t(11, 0)),   # exactly at lower bound -1h
            (10, 2, _t(13, 0)),   # exactly at upper bound +1h
            (10, 3, _t(10, 59)),  # just outside lower
            (10, 4, _t(13, 1)),   # just outside upper
        ],
        "k long, rid long, rt timestamp",
    )
    rows = range_join(left, right, "k", "lt", "rt", -3600, 3600).collect()
    assert sorted(r.rid for r in rows) == [1, 2]


def test_range_join_no_duplicate_pairs_across_buckets(spark):
    # rows near a bucket boundary must appear exactly once despite the
    # two-bucket candidate expansion
    left = spark.createDataFrame(
        [(i, 10, _t(12, i)) for i in range(30)], "lid long, k long, lt timestamp"
    )
    right = spark.createDataFrame(
        [(10, j, _t(12, j)) for j in range(30)], "k long, rid long, rt timestamp"
    )
    out = range_join(left, right, "k", "lt", "rt", -600, 600)
    pairs = [(r.lid, r.rid) for r in out.collect()]
    assert len(pairs) == len(set(pairs))
    expected = sum(
        1 for i in range(30) for j in range(30) if abs(i - j) <= 10
    )
    assert len(pairs) == expected


def test_asof_nearest_direction_and_ties(spark):
    from streamsurfer_spark.operators.asof import asof_nearest

    left = spark.createDataFrame(
        [(1, 10, _t(12)), (2, 10, _t(14)), (3, 10, _t(20)), (4, 99, _t(12))],
        "lid long, k long, lt timestamp",
    )
    right = spark.createDataFrame(
        # around lid=1: 11:00 and 13:00 — equal 1h distance → prev (100)
        # around lid=2 (14:00): 13:00 (prev, 1h) vs 14:30 (next, 30m) → next
        # around lid=3: nothing within 1h → null
        [(10, _t(11), 100), (10, _t(13), 200), (10, _t(14, 30), 300)],
        "k long, rt timestamp, rid long",
    )
    out = {
        r.lid: r
        for r in asof_nearest(
            left, right, "k", "lt", "rt", ["rid"], tolerance_seconds=3600
        ).collect()
    }
    assert (out[1].rid, out[1].direction, out[1].diff_us) == (100, "prev", 3600_000_000)
    assert (out[2].rid, out[2].direction, out[2].diff_us) == (300, "next", 1800_000_000)
    assert out[3].rid is None and out[3].direction is None and out[3].diff_us is None
    assert out[4].rid is None  # no right rows for key 99


def test_asof_nearest_exact_time_is_prev_at_zero(spark):
    from streamsurfer_spark.operators.asof import asof_nearest

    left = spark.createDataFrame([(1, 10, _t(12))], "lid long, k long, lt timestamp")
    right = spark.createDataFrame(
        [(10, _t(12), 500)], "k long, rt timestamp, rid long"
    )
    (row,) = asof_nearest(
        left, right, "k", "lt", "rt", ["rid"], tolerance_seconds=60
    ).collect()
    assert (row.rid, row.direction, row.diff_us) == (500, "prev", 0)


def test_asof_nearest_single_shuffle_single_window(spark):
    """Both direction passes must share one sort: exactly one Exchange and
    one Window operator in the plan (the forward/backward frames are frame
    variants of the same partitioning+ordering)."""
    from streamsurfer_spark.operators.asof import asof_nearest

    left = spark.createDataFrame([(1, 10, _t(12))], "lid long, k long, lt timestamp")
    right = spark.createDataFrame(
        [(10, _t(11), 100)], "k long, rt timestamp, rid long"
    )
    plan = (
        asof_nearest(left, right, "k", "lt", "rt", ["rid"], 3600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") - plan.count("WindowGroupLimit") == 1


def test_asof_join_null_payload_no_stale_leak(spark):
    """The payload rides as ONE struct per right row: a NULL field in the
    latest right row must stay NULL, not be back-filled from a stale older
    row (per-column last(ignorenulls) built franken-rows — r7 review)."""
    t0 = dt.datetime(2024, 1, 1, 10, 0)
    right = spark.createDataFrame(
        [(1, t0, 5, 7), (1, t0.replace(hour=11), None, 9)],
        "k long, rt timestamp, x int, y int",
    )
    left = spark.createDataFrame(
        [(1, t0.replace(hour=12))], "k long, lt timestamp"
    )
    row = asof_join(left, right, "k", "lt", "rt", ["x", "y"]).collect()[0]
    # both fields come from the 11:00 row — x genuinely NULL, y=9
    assert row.x is None and row.y == 9


def test_range_join_subsecond_exact(spark):
    """The exact bound compares full-precision timestamps: a right event
    0.2s past left+upper must be excluded (whole-second unix_timestamp
    truncation used to let it through — r7 review)."""
    base = dt.datetime(2024, 1, 1, 10, 0, 0, 700000)
    left = spark.createDataFrame([(1, base)], "k long, lt timestamp")
    right = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 11, 0, 0, 900000), "late"),
            (1, dt.datetime(2024, 1, 1, 11, 0, 0, 600000), "in"),
        ],
        "k long, rt timestamp, tag string",
    )
    got = {r.tag for r in range_join(left, right, "k", "lt", "rt", 0, 3600).collect()}
    assert got == {"in"}
