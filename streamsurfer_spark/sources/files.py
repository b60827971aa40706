"""File sources & sinks: parquet / CSV / JSON-lines, batch and streaming.

The reference reads nothing (its only I/O is the Kinesis client —
/root/reference/main.go:159-172; SURVEY §2.2 "no file formats, no
readers"), so this is engine-side surface: one reader/writer API over the
formats a data pipeline actually meets, built directly on Spark's
DataSource framework so pushdown/pruning/partition-discovery all apply.

Scale notes:
- parquet is the canonical format (columnar, predicate+projection
  pushdown, splittable); ORC gets the same vectorized/pushdown treatment
  for Hive-lineage lakes; CSV/JSON are ingest-edge formats — land them
  once, convert to parquet, never re-scan raw text at 100 TB.
- ``write_table(..., partition_by=...)`` produces hive-style partition
  dirs → partition pruning turns time/tenant filters into directory skips.
- explicit schemas everywhere: schema inference reads data twice and can
  mistype columns at the worst moment (CSV int that later holds a float).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "csv", "json", "xml")
XML_ROW_TAG = "row"  # default rowTag for the XML reader/writer


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Batch reader. CSV defaults to header=true; JSON means JSON-lines."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format: {fmt!r} (one of {FORMATS})")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if fmt == "xml":
        reader = reader.option("rowTag", options.pop("rowTag", XML_ROW_TAG))
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "csv":
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def read_stream(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    """Streaming file reader (schema mandatory — streaming can't infer)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format: {fmt!r} (one of {FORMATS})")
    reader = spark.readStream.format(fmt).schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if fmt == "xml":
        # same default as read_table/write_table — without it Spark
        # raises XML_ROW_TAG_MISSING on a directory the batch twin of
        # this API reads fine (r7 review)
        reader = reader.option("rowTag", options.pop("rowTag", XML_ROW_TAG))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Batch writer; hive-style partitioning via ``partition_by``."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format: {fmt!r} (one of {FORMATS})")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if fmt == "xml":
        writer = writer.option("rowTag", options.pop("rowTag", XML_ROW_TAG))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write a hash-bucketed (optionally bucket-sorted) catalog table.

    Bucketing is the batch analog of the reference's keyed routing it never
    had (its partition key is a random UUID — /root/reference/main.go:275):
    rows are hash-assigned to `num_buckets` files per partition by
    `bucket_cols`, and the catalog records that layout. Catalyst then treats
    the scan as already hash-partitioned, so:

    - a join of two tables bucketed on the join key with the same bucket
      count needs NO Exchange on either side (see test_bucketing.py) —
      at 100 TB that deletes the two largest shuffles a fact-fact join has;
    - an aggregation grouped on the bucket key needs no shuffle at all;
    - `sort_cols` additionally pre-sorts within each bucket file, removing
      the Sort below a sort-merge join.

    Bucket count is a physical-design choice: pick so each bucket is
    100-500 MB at production scale (e.g. 100 TB / 4096 buckets / partitions).
    Must go through `saveAsTable` — bucket metadata lives in the catalog,
    not the files; a plain `.save(path)` write silently drops it.
    """
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be positive, got {num_buckets}")
    writer = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def compact(
    spark: SparkSession,
    src: str,
    dest: str,
    target_mb: float = 128,
    fmt: str = "parquet",
    cluster_by: list[str] | None = None,
) -> dict:
    """Small-file compaction: rewrite ``src`` into ≈``target_mb``-sized files
    at ``dest``, optionally range-clustered for data skipping.

    The two chronic diseases of a 100 TB table are millions of tiny files
    (listing + task-scheduling overhead) and files with no value locality
    (every filter reads every file). One rewrite fixes both: size the file
    count from the actual input bytes, and — with ``cluster_by`` —
    repartitionByRange + sortWithinPartitions so each output file covers a
    narrow range of the cluster key and parquet min/max stats prune reads.

    File sizes come from a local directory walk (fixture scale); a real
    deployment swaps in the store's listing API — the planning math is the
    same. Returns {n_input_files, input_mb, n_output_files}.
    """
    import math
    import os

    if fmt not in FORMATS:
        raise ValueError(f"unsupported format: {fmt!r} (one of {FORMATS})")
    sizes = [
        os.path.getsize(os.path.join(d, f))
        for d, _, fs in os.walk(src)
        for f in fs
        if not f.startswith(("_", "."))
    ]
    n_files = max(1, math.ceil(sum(sizes) / (target_mb * 1024 * 1024)))
    df = read_table(spark, src, fmt)
    if cluster_by:
        cols = [F.col(c) for c in cluster_by]
        out = df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)
    else:
        out = df.repartition(n_files)
    # one file per partition: the partition count IS the file plan
    write_table(out, dest, fmt=fmt, mode="overwrite")
    # count non-hidden part files rather than matching the format suffix:
    # compressed csv/json part files carry codec extensions (.csv.gz etc.)
    # and would undercount under a suffix test
    n_out = sum(
        1
        for d, _, fs in os.walk(dest)
        for f in fs
        if not f.startswith(("_", "."))
    )
    return {
        "n_input_files": len(sizes),
        "input_mb": round(sum(sizes) / (1024 * 1024), 3),
        "n_output_files": n_out,
    }
