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
