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
