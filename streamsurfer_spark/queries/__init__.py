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
    """Aggregate all query modules into one name → spec mapping.

    Ordering is load-bearing: the driver's correctness gate evaluates a
    prefix of this dict, so the families with the least external
    verification go first — envelope, streaming, timeseries, pipeline,
    then the LLM-pipeline operators — and the relational family (fully
    driver-verified in round 1) last. Within each module, oracle-bearing
    specs precede rows-only specs so every slot in the verification
    window buys a full rows+schema+hash check where one exists.
    """
    from streamsurfer_spark.queries import (
        envelope_q,
        llm_q,
        pipeline_q,
        relational_q,
        streaming_q,
        timeseries_q,
    )

    out: dict[str, QuerySpec] = {}
    for mod in (envelope_q, streaming_q, timeseries_q, pipeline_q, llm_q, relational_q):
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update({k: v for k, v in mod.QUERIES.items() if v.oracle is not None})
        out.update({k: v for k, v in mod.QUERIES.items() if v.oracle is None})
    return out
