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


# Types pandas converts lossily (HUGEINT → float64, DECIMAL → object):
# a driver-side comparer that goes through pandas will hash `123` as
# `123.0` and flag a value mismatch even when the numbers agree — every
# integer aggregate in oracle SQL must be CAST to BIGINT (DuckDB's
# sum(BIGINT) returns HUGEINT), doubles must stay DOUBLE.
_PANDAS_LOSSY = ("HUGEINT", "DECIMAL")


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_dtypes_pandas_safe(duck, name):
    rel = duck.sql(REG[name].oracle)
    lossy = {
        c: str(t)
        for c, t in zip(rel.columns, rel.types)
        if any(s in str(t) for s in _PANDAS_LOSSY)
    }
    assert not lossy, f"{name}: oracle emits pandas-lossy types {lossy}"
