"""SparkSession factory with scale-ready defaults.

Design notes (100 TB target):
- AQE on: runtime shuffle coalescing, skew-join splitting, and dynamic
  broadcast selection — essential at 1000-executor scale where static
  partition counts are always wrong for at least one stage.
- UTC session timezone: deterministic timestamp rendering (the reference
  stamps UTC strings — /root/reference/main.go:179) and oracle parity.
- shuffle.partitions is a *local* default sized to the thread count. On
  a real cluster, raise `spark.sql.adaptive.coalescePartitions.
  initialPartitionNum` (or SPARK_GRAFT_SHUFFLE_PARTITIONS here) so
  partitions scale with data and AQE coalesces the small stages back
  down. Measured on this box (30× probe, ql54): 128 partitions cut a
  GC-bound linear-volume shuffle 40%, but blanket-raising
  initialPartitionNum to 256 SLOWED every fixture-scale query 1.5-2×
  (local-mode pre-coalesce reducer overhead) — so the wide default is a
  cluster setting, deliberately NOT baked in locally.
- Arrow enabled for every pandas interchange (vectorized UDF hot paths).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def get_spark(app_name: str = "streamsurfer-spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the session used by the engine, tests, and bench.

    Local mode uses $SPARK_GRAFT_CPUS threads; on a cluster the same
    configuration is valid — nothing here assumes single-node.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        env_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "")
        if env_parts.isdigit() and int(env_parts) > 0:
            shuffle_partitions = int(env_parts)
        else:
            shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # shuffle/spill block codec. Default = Spark's own default (lz4,
        # fastest); big single-box scale probes set zstd (~1.5-2× smaller
        # shuffle files) because their binding resource is scratch DISK,
        # not CPU — see tools/qp08_bounded_probe.py
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"),
        )
        .config("spark.ui.enabled", "false")
        # Python workers (UDF executors AND the Python streaming-source
        # runner) get 15 s by default to connect back to the JVM after
        # spawn; under co-tenant host contention a fork+import can exceed
        # that (observed once in the r13 driver's pytest run: a 23-minute
        # suite hit SocketTimeoutException inside the streaming source
        # runner). 120 s trades slower surfacing of a genuinely dead
        # worker for immunity to contention stalls; zero effect on any
        # healthy-path timing.
        .config("spark.python.authenticate.socketTimeout", "120s")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet stores TIMESTAMP(NANOS) which parquet-mr rejects by
        # default; read as long and convert ns→µs in table() below.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every fixture table and register it as a temp view.

    Plain `spark.read.parquet` so Catalyst sees a pruneable file scan:
    filters and projections push into the parquet reader (verify with
    .explain → PushedFilters / ReadSchema).
    """
    dfs = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = table(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            dfs[name] = df
    return dfs


def table(spark: SparkSession, sf_dir: str, name: str):
    """Read one fixture table (no view registration)."""
    if name == "events":
        # Runtime-settable SQL conf — needed when the caller (e.g. the
        # driver) built the session without our factory.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # nanosAsLong surfaces ts as nanoseconds-since-epoch (LongType).
        # Integer `div` keeps full precision (double division would lose
        # bits above 2^53); truncation to µs matches DuckDB's ns→µs read.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
