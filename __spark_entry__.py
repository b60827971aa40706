"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``streamsurfer_spark/``; this module is a thin
adapter over the query registry (streamsurfer_spark/queries).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from streamsurfer_spark.queries import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the composed curation pipeline (language-ID →
    quality gate → exact dedup → MinHash-LSH pruning → token accounting)."""
    from streamsurfer_spark.queries.pipeline_q import qp01_curation_report

    return qp01_curation_report(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.3."""
    return {name: spec.spark for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every hash-checkable query.

    Queries whose semantics are not SQL-expressible (property-tested ops,
    sketches) are intentionally absent → driver records a rows-only check.
    """
    return {name: spec.oracle for name, spec in registry().items() if spec.oracle is not None}
