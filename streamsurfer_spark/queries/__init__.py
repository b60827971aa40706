"""Query registry: every declared query from SURVEY.md §2.3.

Each module exports ``QUERIES: dict[str, QuerySpec]``. A spec couples the
Spark implementation (a callable ``(spark, sf_dir) -> DataFrame``) with the
DuckDB oracle SQL used by the driver's correctness gate. Specs with
``oracle=None`` are non-SQL-expressible and get a rows-only check; they are
covered by unit/property tests instead.

Canonicalization contract (FIXTURES.md §3): every query ends with ORDER BY on
a unique key, doubles go through ROUND, timestamps are rendered as strings in
UTC, and every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One declared query: Spark impl + DuckDB oracle + provenance note."""

    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


def registry() -> dict[str, QuerySpec]:
    """Aggregate all query modules into one name → spec mapping."""
    from streamsurfer_spark.queries import (
        envelope_q,
        llm_q,
        pipeline_q,
        relational_q,
        streaming_q,
        timeseries_q,
    )

    out: dict[str, QuerySpec] = {}
    for mod in (relational_q, envelope_q, streaming_q, llm_q, timeseries_q, pipeline_q):
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out
