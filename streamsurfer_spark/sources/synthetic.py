"""Custom Python DataSource (Spark 4 API): deterministic synthetic events.

The extensibility surface files can't show: a from-scratch source plugged
into Spark's planner via the Python DataSource API — batch reader with
explicit input partitions AND a micro-batch stream reader with real
offset/commit bookkeeping. Registered as format "synthetic_events".

Every row is a pure function of its event_id (seeded md5, same family as
functions/hashing.py), so the dataset is identical for any partition count,
executor layout, or engine — the property every test fixture and backfill
generator needs at 100 TB: re-running a shard regenerates byte-identical
rows, no coordination required.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from streamsurfer_spark.functions.hashing import md5_long64_py

EVENT_TYPES = ("click", "view", "purchase", "error", "signup")
SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"

_BASE_TS = 1704067200  # 2024-01-01T00:00:00Z, fixed epoch anchor


def synth_row(event_id: int, n_users: int) -> tuple:
    """The one true row for `event_id` — shared by batch, stream, and tests."""
    import datetime

    h = md5_long64_py(f"synth:{event_id}")
    ts = datetime.datetime.fromtimestamp(
        _BASE_TS + (h % 2_592_000), tz=datetime.timezone.utc
    ).replace(tzinfo=None)
    return (
        event_id,
        ts,
        h % n_users,
        EVENT_TYPES[h % len(EVENT_TYPES)],
        round((h % 10_000_000) / 100.0, 2),
        f'{{"k": {h % 100}}}',
    )


class _Reader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("partitions", 4))
        self.n_users = int(options.get("users", 100))

    def partitions(self):  # noqa: D102 — API hook
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):  # noqa: D102 — API hook
        # strided assignment: content of each row is id-pure, so the stride
        # only decides placement, never values
        for event_id in range(partition.value, self.n, self.parts):
            yield synth_row(event_id, self.n_users)


class _StreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same id space: offset = next unread id."""

    def __init__(self, options: dict) -> None:
        self.n_users = int(options.get("users", 100))
        self.batch = int(options.get("batch_size", 100))
        self.max_id = int(options.get("n", 1000))

    def initialOffset(self):  # noqa: D102 — API hook
        return {"next": 0}

    def read(self, start):  # noqa: D102 — API hook
        lo = start["next"]
        hi = min(lo + self.batch, self.max_id)
        rows = [synth_row(i, self.n_users) for i in range(lo, hi)]
        return iter(rows), {"next": hi}

    def readBetweenOffsets(self, start, end):  # noqa: D102 — replay hook
        return iter(
            [synth_row(i, self.n_users) for i in range(start["next"], end["next"])]
        )


class SyntheticEventsSource(DataSource):
    """spark.read.format("synthetic_events").option("n", ...)"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema):  # noqa: D102 — API hook
        return _Reader(self.options)

    def simpleStreamReader(self, schema):  # noqa: D102 — API hook
        return _StreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsSource)
