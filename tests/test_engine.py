"""Engine facade tests: catalog, SQL, registry dispatch."""

from __future__ import annotations

from streamsurfer_spark.engine import Engine
from tests.conftest import SF_DIR


def test_engine_sql_and_table(spark):
    eng = Engine(spark=spark, sf_dir=SF_DIR)
    assert eng.table("region").count() == 5
    assert eng.sql("SELECT count(*) AS n FROM nation").first().n == 25
    # join across registered views
    n = eng.sql(
        "SELECT count(*) AS n FROM nation JOIN region ON n_regionkey = r_regionkey"
    ).first().n
    assert n == 25


def test_engine_query_dispatch(spark):
    eng = Engine(spark=spark, sf_dir=SF_DIR)
    assert "qp01_curation_report" in eng.query_names()
    df = eng.query("qr01_scan_checksum")
    assert df.first().n_rows == 6000


def test_observation_metrics_free_of_extra_pass(spark):
    """df.observe(Observation, ...) collects pipeline health metrics during
    the SAME action — the mechanism for row-count/null-rate accounting at
    100 TB without a second scan. Metrics must match an independent
    aggregate of the same frame."""
    import pyspark.sql.functions as F
    from pyspark.sql import Observation

    from streamsurfer_spark.session import table
    from tests.conftest import SF_DIR

    obs = Observation("orders_health")
    orders = table(spark, SF_DIR, "orders").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").isNull().cast("long")).alias("n_null_price"),
        F.max("o_orderkey").alias("max_key"),
    )
    # run any action through the observed frame
    n_status = orders.select("o_orderstatus").distinct().count()
    assert n_status == 3
    got = obs.get
    base = table(spark, SF_DIR, "orders")
    assert got["n_rows"] == base.count()
    assert got["n_null_price"] == 0
    assert got["max_key"] == base.agg(F.max("o_orderkey")).first()[0]


def test_expectations_empty_checks_rejected(spark):
    """check() with no checks is a caller bug — clear error, not IndexError."""
    import pytest

    from streamsurfer_spark.operators.expectations import check
    from streamsurfer_spark.session import table

    with pytest.raises(ValueError, match="at least one check"):
        check(table(spark, SF_DIR, "region"), [])
