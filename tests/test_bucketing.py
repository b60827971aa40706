"""Bucketed-table physical design: the shuffle-free co-located join.

At 100 TB the dominant cost of a fact-fact join (orders ⋈ lineitem,
events ⋈ sessions) is shuffling both sides. Bucketing both tables on the
join key with equal bucket counts records the hash layout in the catalog,
and Catalyst plans the join with ZERO Exchange nodes — the scan itself
satisfies the required distribution. These tests pin that contract on real
fixture data so a regression (bucket metadata dropped, bucketing disabled,
mismatched counts) is caught at fixture scale, not on the cluster.
"""

from __future__ import annotations

from contextlib import contextmanager

import pyspark.sql.functions as F
import pytest

from streamsurfer_spark.plans.inspect import exchange_count, formatted_plan
from streamsurfer_spark.session import table
from streamsurfer_spark.sources.files import write_bucketed
from tests.conftest import SF_DIR

N_BUCKETS = 8


@contextmanager
def _conf(spark, **kv):
    old = {k: spark.conf.get(k, None) for k in kv}
    for k, v in kv.items():
        spark.conf.set(k, str(v))
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    """orders + customer bucketed on custkey into a throwaway warehouse dir."""
    base = tmp_path_factory.mktemp("bucketed")
    orders = table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    write_bucketed(
        orders, "orders_b", ["o_custkey"], N_BUCKETS,
        sort_cols=["o_custkey"], path=str(base / "orders_b"),
    )
    write_bucketed(
        customer, "cust_b", ["c_custkey"], N_BUCKETS,
        sort_cols=["c_custkey"], path=str(base / "cust_b"),
    )
    yield {"orders": orders, "customer": customer}
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS cust_b")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    """Equal-bucket join on the bucket key: no shuffle on either side.

    Broadcast is disabled so the planner would otherwise pick a
    shuffle-both-sides sort-merge join — the Exchange-free plan can only
    come from the bucketed layout.
    """
    with _conf(spark, **{"spark.sql.autoBroadcastJoinThreshold": "-1"}):
        j = (
            spark.table("orders_b")
            .join(spark.table("cust_b"), F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n"))
        )
        plan = formatted_plan(j)
        assert "SortMergeJoin" in plan
        # one Exchange remains for the groupBy on a non-bucket key;
        # the join itself must contribute none
        assert exchange_count(j) <= 1

        # sanity: the same join on unbucketed scans shuffles both sides
        o, c = bucketed["orders"], bucketed["customer"]
        j2 = (
            o.join(c, F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n"))
        )
        assert exchange_count(j2) >= 3


def test_bucketed_groupby_has_no_exchange(spark, bucketed):
    """Aggregation keyed on the bucket column rides the scan's layout."""
    agg = (
        spark.table("orders_b")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("spend"))
    )
    assert exchange_count(agg) == 0

    # and values are identical to the unbucketed aggregation
    plain = (
        bucketed["orders"]
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("spend"))
    )
    assert agg.exceptAll(plain).isEmpty() and plain.exceptAll(agg).isEmpty()


def test_mismatched_bucket_counts_fall_back_to_shuffle(spark, bucketed, tmp_path):
    """A 4-bucket × 8-bucket join can co-locate at most one side; the plan
    must still be correct (Catalyst inserts the Exchange it needs)."""
    write_bucketed(
        bucketed["customer"], "cust_b4", ["c_custkey"], 4,
        path=str(tmp_path / "cust_b4"),
    )
    try:
        with _conf(spark, **{"spark.sql.autoBroadcastJoinThreshold": "-1"}):
            j = spark.table("orders_b").join(
                spark.table("cust_b4"), F.col("o_custkey") == F.col("c_custkey")
            )
            n = j.count()
        expected = (
            bucketed["orders"]
            .join(bucketed["customer"], F.col("o_custkey") == F.col("c_custkey"))
            .count()
        )
        assert n == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS cust_b4")
