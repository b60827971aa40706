"""LLM-data-pipeline queries (SURVEY.md §2.3 D) — filled in task 4."""

from __future__ import annotations

from streamsurfer_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}
