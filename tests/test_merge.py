"""Unit tests for operators/merge.py: upsert, merge_columns, apply_cdc.

Crafted micro-frames pin the MERGE semantics the oracle queries (qr42/qr43)
exercise at fixture scale: update-vs-insert split, partial-column coalesce,
latest-wins collapse, and delete propagation.
"""

from __future__ import annotations

import pytest

from streamsurfer_spark.operators.merge import (
    apply_cdc,
    apply_cdc_snapshot,
    merge_columns,
    upsert,
)


def rows(df, *cols):
    out = [tuple(r[c] for c in cols) for r in df.collect()]
    return sorted(out)


@pytest.fixture()
def target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, name string, v double"
    )


def test_upsert_updates_and_inserts(spark, target):
    source = spark.createDataFrame(
        [(2, "B", 22.0), (4, "d", 40.0)], "k int, name string, v double"
    )
    got = upsert(target, source, keys="k")
    assert rows(got, "k", "name", "v") == [
        (1, "a", 10.0),
        (2, "B", 22.0),
        (3, "c", 30.0),
        (4, "d", 40.0),
    ]


def test_upsert_rejects_schema_drift(spark, target):
    source = spark.createDataFrame([(2, "B")], "k int, name string")
    with pytest.raises(ValueError, match="identical schemas"):
        upsert(target, source, keys="k")


def test_merge_columns_partial_update(spark, target):
    # source carries only the key + v: name must survive from the target
    source = spark.createDataFrame([(2, 99.0), (5, 50.0)], "k int, v double")
    got = merge_columns(target, source, keys="k")
    assert rows(got, "k", "name", "v") == [
        (1, "a", 10.0),
        (2, "b", 99.0),
        (3, "c", 30.0),
        (5, None, 50.0),
    ]


def test_merge_columns_null_update_keeps_target(spark, target):
    # a NULL in the source is "no new value", not an overwrite-with-NULL
    source = spark.createDataFrame([(1, None, 11.0)], "k int, name string, v double")
    got = merge_columns(target, source, keys="k")
    assert rows(got, "k", "name", "v")[0] == (1, "a", 11.0)


def test_apply_cdc_latest_wins_and_delete(spark, target):
    changes = spark.createDataFrame(
        [
            # k=1: U then D → deleted
            (1, "a1", 11.0, "U", 1),
            (1, "a1", 11.0, "D", 2),
            # k=2: D then U → the later U resurrects it
            (2, "b1", 21.0, "D", 1),
            (2, "b2", 22.0, "U", 2),
            # k=4: pure insert
            (4, "d", 40.0, "U", 1),
        ],
        "k int, name string, v double, op string, seq int",
    )
    snapshot, deletes = apply_cdc(target, changes, keys="k", order_by="seq")
    assert rows(snapshot, "k", "name", "v") == [
        (2, "b2", 22.0),
        (3, "c", 30.0),
        (4, "d", 40.0),
    ]
    assert rows(deletes, "k") == [(1,)]


def test_apply_cdc_snapshot_matches_apply_cdc(spark, target):
    changes = spark.createDataFrame(
        [(3, "c9", 33.0, "U", 7)], "k int, name string, v double, op string, seq int"
    )
    snap = apply_cdc_snapshot(target, changes, keys="k", order_by="seq")
    full, _ = apply_cdc(target, changes, keys="k", order_by="seq")
    assert rows(snap, "k", "name", "v") == rows(full, "k", "name", "v")


def test_apply_cdc_no_window_in_plan(spark, target):
    """The latest-wins collapse must be a hash aggregate, not a window."""
    changes = spark.createDataFrame(
        [(1, "x", 1.0, "U", 1)], "k int, name string, v double, op string, seq int"
    )
    snap = apply_cdc_snapshot(target, changes, keys="k", order_by="seq")
    plan = snap._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_upsert_replaces_null_keyed_row(spark):
    """NULL keys join null-safely: the source row must REPLACE the target's
    NULL-keyed row, not duplicate it (r7 review; merge_columns always
    used eqNullSafe)."""
    target = spark.createDataFrame([(None, "old")], "k string, v string")
    source = spark.createDataFrame([(None, "new")], "k string, v string")
    got = upsert(target, source, "k").collect()
    assert len(got) == 1 and got[0].v == "new"


def test_apply_cdc_null_op_raises(spark):
    """A NULL op is ambiguous (delete or upsert?) and used to vanish the
    key from snapshot AND tombstones with no trace — must raise."""
    from pyspark.errors import SparkRuntimeException

    target = spark.createDataFrame([(1, "a")], "k long, v string")
    changes = spark.createDataFrame(
        [(1, "b", None, 5)], "k long, v string, op string, seq long"
    )
    merged, _deletes = apply_cdc(target, changes, "k", "seq")
    with pytest.raises(SparkRuntimeException, match="NULL op"):
        merged.collect()
