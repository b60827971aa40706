"""Event-envelope queries (SURVEY.md §2.3 A, Q-V1..Q-V6) — filled in task 2."""

from __future__ import annotations

from streamsurfer_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}
