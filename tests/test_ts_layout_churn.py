"""Fixture timestamp-layout churn guard (the round-2 bench killer).

The driver regenerates fixtures each round and the PHYSICAL type of
events.ts has already changed once: TIMESTAMP(NANOS) (rounds 1-2; Spark
reads int64 nanos under spark.sql.legacy.parquet.nanosAsLong) →
TIMESTAMP(MICROS) without timezone (round 3+; Spark reads TIMESTAMP_NTZ).
Every event-time reader must branch on the footer type, not assume a
layout — a wrong branch is a silent 1000× event-time error that makes
every watermark vacuous.

These tests write the SAME logical events in all three plausible layouts
(ns, us/NTZ, us/UTC-tz) and assert the batch reader, the streaming reader,
and the sessionize operator produce identical results on each.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

ROWS = [
    # (event_id, ts, user_id, event_type, value, props)
    (1, dt.datetime(2024, 1, 1, 12, 0, 0), 7, "click", 1.0, "{}"),
    (2, dt.datetime(2024, 1, 1, 12, 0, 30), 7, "click", 2.0, "{}"),
    # >60 s gap → second session for user 7 under gap_seconds=60
    (3, dt.datetime(2024, 1, 1, 12, 5, 0), 7, "purchase", 3.0, "{}"),
    (4, dt.datetime(2024, 1, 1, 12, 0, 10), 9, "error", 4.0, "{}"),
]


def _write_events(dirpath: str, unit: str, tz: str | None) -> str:
    os.makedirs(dirpath, exist_ok=True)
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": pa.array([r[1] for r in ROWS], pa.timestamp(unit, tz=tz)),
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS], pa.string()),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": pa.array([r[5] for r in ROWS], pa.string()),
        }
    )
    path = os.path.join(dirpath, "events.parquet")
    pq.write_table(table, path)
    return path


LAYOUTS = [("ns", None), ("us", None), ("us", "UTC")]


@pytest.mark.parametrize("unit,tz", LAYOUTS, ids=["nanos", "micros-ntz", "micros-utc"])
def test_batch_reader_adapts_to_layout(spark, tmp_path, unit, tz):
    """session.table('events') must yield a TIMESTAMP-typed ts with the
    same rendered wall-clock values under every physical layout."""
    import pyspark.sql.functions as F

    from streamsurfer_spark.session import table

    _write_events(str(tmp_path), unit, tz)
    df = table(spark, str(tmp_path), "events")
    assert df.schema["ts"].dataType.typeName() in ("timestamp", "timestamp_ntz")
    got = {
        r.event_id: r.rendered
        for r in df.select(
            "event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("rendered")
        ).collect()
    }
    want = {r[0]: r[1].strftime("%Y-%m-%d %H:%M:%S") for r in ROWS}
    assert got == want


@pytest.mark.parametrize("unit,tz", LAYOUTS, ids=["nanos", "micros-ntz", "micros-utc"])
def test_stream_reader_adapts_to_layout(spark, tmp_path, unit, tz):
    """read_events_stream must produce the same rows under every layout
    (availableNow run through the real streaming source)."""
    import pyspark.sql.functions as F

    from streamsurfer_spark.streaming.ingest import read_events_stream, run_to_memory

    path = _write_events(str(tmp_path), unit, tz)
    stream = read_events_stream(spark, path)
    out = run_to_memory(
        stream.select(
            "event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("rendered")
        ),
        "append",
    )
    got = {r.event_id: r.rendered for r in out.collect()}
    want = {r[0]: r[1].strftime("%Y-%m-%d %H:%M:%S") for r in ROWS}
    assert got == want


@pytest.mark.parametrize("unit,tz", LAYOUTS, ids=["nanos", "micros-ntz", "micros-utc"])
def test_sessionize_layout_invariant(spark, tmp_path, unit, tz):
    """The gap-based sessionizer must count the same sessions under every
    layout (interval comparisons are type-agnostic — the documented reason
    it avoids unix_micros, which rejects NTZ)."""
    import pyspark.sql.functions as F

    from streamsurfer_spark.operators.sessions import sessionize
    from streamsurfer_spark.session import table

    _write_events(str(tmp_path), unit, tz)
    ev = table(spark, str(tmp_path), "events")
    sess = sessionize(ev, key="user_id", gap_seconds=60)
    per_user = {
        r.user_id: r.n
        for r in sess.groupBy("user_id")
        .agg(F.countDistinct("session_id").alias("n"))
        .collect()
    }
    assert per_user == {7: 2, 9: 1}
