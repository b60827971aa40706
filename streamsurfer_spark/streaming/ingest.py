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
import tempfile
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# events.parquet stores ts as TIMESTAMP(NANOS); with nanosAsLong the scan
# surfaces LongType nanoseconds (see session.table) — the stream schema
# must match the physical read, then we convert ns → µs.
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of the events table (one parquet dir or file).

    max_files_per_trigger=1 forces one micro-batch per file — the replay
    knob the watermark/late-data tests use to control arrival order.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    if os.path.isfile(path):
        # FileStreamSource requires a directory; wrap a bare file in an
        # ephemeral symlink dir (same lifecycle as Spark's temp checkpoints).
        d = tempfile.mkdtemp(prefix="events_stream_")
        os.symlink(path, os.path.join(d, os.path.basename(path)))
        path = d
    reader = spark.readStream.schema(EVENTS_RAW_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def run_to_memory(stream_df: DataFrame, output_mode: str = "complete") -> DataFrame:
    """Run a streaming DataFrame to completion into an in-memory table.

    availableNow processes everything currently in the source then stops —
    the streaming twin of the reference's Flush (main.go:254-264: drain all,
    then return). Returns the result as a batch DataFrame.
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
    return stream_df.sparkSession.table(name)
