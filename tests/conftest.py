"""Shared fixtures: one local SparkSession per test run + the DuckDB oracle.

The ``assert_matches_oracle`` helper mirrors the driver's correctness gate
(CORRECTNESS_r{N}.json): row count, column names, and an order-insensitive
value comparison after sorting columns by name — so a test that passes here
should pass the driver's hash compare.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from streamsurfer_spark.session import TABLES, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("streamsurfer-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # rounding happened in the query; normalize -0.0 and representation
        return repr(v + 0.0)
    if isinstance(v, bool):
        return v
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(_canon_cell(x) for x in v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except ImportError:
        pass
    return v


def canonicalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    canon = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    canon.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return cols_sorted, canon


def assert_matches_oracle(spark_df, duck_con, oracle_sql: str, name: str = "?"):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck_con.sql(oracle_sql)
    d_cols = list(rel.columns)
    d_rows = [tuple(r) for r in rel.fetchall()]

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"

    _, s_canon = canonicalize(s_cols, s_rows)
    cols, d_canon = canonicalize(d_cols, d_rows)
    for i, (sr, dr) in enumerate(zip(s_canon, d_canon)):
        if sr != dr:
            diff = [
                f"  col {cols[j]}: spark={sr[j]!r} duck={dr[j]!r}"
                for j in range(len(cols))
                if sr[j] != dr[j]
            ]
            raise AssertionError(
                f"{name}: first mismatch at canonical row {i}:\n" + "\n".join(diff)
            )
