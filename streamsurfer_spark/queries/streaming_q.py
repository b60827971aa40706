"""Streaming-equivalent batch queries (SURVEY.md §2.3 C) — filled in task 5."""

from __future__ import annotations

from streamsurfer_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}
