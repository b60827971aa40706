"""Oracle-differential tests: every registry query vs DuckDB (SURVEY §5.2).

This is the local twin of the driver's sf0.01 correctness gate, run at
sf0.001 for speed (override with SPARK_GRAFT_TEST_SF_DIR).
"""

from __future__ import annotations

import pytest

from streamsurfer_spark.queries import registry
from tests.conftest import SF_DIR, assert_matches_oracle

REG = registry()
ORACLE_CASES = sorted(name for name, spec in REG.items() if spec.oracle is not None)
ROWS_ONLY_CASES = sorted(name for name, spec in REG.items() if spec.oracle is None)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_match(spark, duck, name):
    spec = REG[name]
    df = spec.spark(spark, SF_DIR)
    assert_matches_oracle(df, duck, spec.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_runs(spark, name):
    spec = REG[name]
    df = spec.spark(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
