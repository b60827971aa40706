"""Streaming ingestion: file-source readers + run-to-completion helpers.

The reference ingests events one map at a time over a Go API
(/root/reference/main.go:197-242); the engine's equivalent surface is a
Structured Streaming source feeding the same envelope/transform pipeline
that batch uses (SURVEY §1.3 batch/stream duality).

The file source is the test/replay path; on a real deployment the same
pipeline hangs off a Kinesis/Kafka source — only ``read_events_stream``
changes, every transform and the sink stay identical.
"""

from __future__ import annotations

import os
from streamsurfer_spark.scratch import scratch_dir
import uuid
import weakref

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, TimestampNTZType


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of the events table (one parquet dir or file).

    max_files_per_trigger=1 forces one micro-batch per file — the replay
    knob the watermark/late-data tests use to control arrival order.

    The stream schema is derived from the files themselves (one batch
    footer read) so the reader adapts to however the fixture stores ts:
    TIMESTAMP(MICROS) [→ TIMESTAMP_NTZ], TIMESTAMP(NANOS) [→ LongType
    nanos under nanosAsLong, converted to µs here], or a plain timestamp.
    Assuming one physical layout silently corrupts event time when the
    producer changes — a 1000× ts error makes every watermark vacuous.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    # Pin UTC for EVERY layout, not just NTZ: the nanos-as-long and plain
    # TIMESTAMP paths render event time through date_format downstream
    # (transforms.py), which uses the session timezone — a caller-built
    # session in another zone would shift every window/session start
    # string away from the UTC-rendered oracle (r7 review; previously
    # only the NTZ branch pinned it).
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    if os.path.isfile(path):
        # FileStreamSource requires a directory; wrap a bare file in an
        # ephemeral symlink dir (same lifecycle as Spark's temp checkpoints).
        # abspath: a RELATIVE target would be stored relative to the
        # scratch dir and dangle (r7 review).
        d = scratch_dir("events_stream_")
        os.symlink(
            os.path.abspath(path), os.path.join(d, os.path.basename(path))
        )
        path = d
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    if isinstance(schema["ts"].dataType, LongType):
        # legacy nanos-as-long read: integer div keeps full precision
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(schema["ts"].dataType, TimestampNTZType):
        # withWatermark requires TIMESTAMP. NTZ → TIMESTAMP interprets the
        # wall clock in the session timezone (pinned UTC above) so window
        # boundaries and rendered output agree with the wall-clock
        # semantics a batch NTZ read (and the DuckDB oracle) produce.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# run_to_memory keeps at most this many memory-sink tables registered
# PER SparkSession; older ones are dropped LRU. Each memory sink pins its
# full materialized result in the driver JVM, and the gate/bench drivers
# call this ~150× per long-lived process — unbounded growth otherwise
# (r7 review). The LRU is keyed by the owning session (r8 advice): a
# module-global list mixed sessions, so an eviction triggered from
# session B called dropTempView on a name registered in session A's
# catalog — a no-op there that leaked A's sink while evicting the name
# from the shared list. WeakKeyDictionary so a stopped/collected session
# releases its name list instead of pinning the session object forever.
# The cap is safe because consumers (gate hash, bench noop write)
# evaluate each returned frame before constructing the next query; only
# code holding a frame across >MEM_TABLE_CAP newer same-session calls
# would see a TABLE_OR_VIEW_NOT_FOUND on re-evaluation.
MEM_TABLE_CAP = 16
_mem_tables: "weakref.WeakKeyDictionary[SparkSession, list[str]]" = (
    weakref.WeakKeyDictionary()
)


def run_to_memory(stream_df: DataFrame, output_mode: str = "complete") -> DataFrame:
    """Run a streaming DataFrame to completion into an in-memory table.

    availableNow processes everything currently in the source then stops —
    the streaming twin of the reference's Flush (main.go:254-264: drain all,
    then return). Returns the result as a batch DataFrame. The backing
    in-memory table is dropped after MEM_TABLE_CAP newer calls (see above).
    """
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    owned = _mem_tables.setdefault(spark, [])
    owned.append(name)
    while len(owned) > MEM_TABLE_CAP:
        spark.catalog.dropTempView(owned.pop(0))
    return spark.table(name)
