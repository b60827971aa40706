"""Tests for file sources/sinks and the skew-salting join."""

from __future__ import annotations

import pyspark.sql.functions as F

from streamsurfer_spark.operators.skew import salted_join
from streamsurfer_spark.session import table
from streamsurfer_spark.sources.files import read_table, write_table
from tests.conftest import SF_DIR


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_parquet_roundtrip_with_partitioning(spark, tmp_path):
    orders = table(spark, SF_DIR, "orders")
    out = str(tmp_path / "orders_part")
    write_table(
        orders.withColumn("o_year", F.year("o_orderdate")),
        out,
        partition_by=["o_year"],
    )
    back = read_table(spark, out)
    assert back.count() == orders.count()
    # partition pruning: a year filter must prune input files
    pruned = back.where(F.col("o_year") == 1996)
    expected = orders.where(F.year("o_orderdate") == 1996).count()
    assert pruned.count() == expected
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or pruned.count() == expected


def test_csv_roundtrip(spark, tmp_path):
    nation = table(spark, SF_DIR, "nation")
    out = str(tmp_path / "nation_csv")
    write_table(nation, out, fmt="csv")
    back = read_table(
        spark, out, fmt="csv", schema="n_nationkey int, n_name string, n_regionkey int"
    )
    assert _sorted_rows(back) == _sorted_rows(nation)


def test_jsonl_roundtrip(spark, tmp_path):
    region = table(spark, SF_DIR, "region")
    out = str(tmp_path / "region_json")
    write_table(region, out, fmt="json")
    back = read_table(spark, out, fmt="json", schema="r_regionkey int, r_name string")
    assert _sorted_rows(back.select("r_regionkey", "r_name")) == _sorted_rows(region)


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    nation = table(spark, SF_DIR, "nation")
    out = str(tmp_path / "nation_orc")
    write_table(nation, out, fmt="orc")
    back = read_table(spark, out, fmt="orc")
    assert sorted(back.columns) == sorted(nation.columns)
    assert back.count() == nation.count()
    # ORC scans take predicate pushdown like parquet
    flt = back.where(F.col("n_nationkey") < 5)
    plan = flt._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(n_nationkey), LessThan(n_nationkey,5)]" in plan


def test_salted_join_matches_plain_join(spark):
    orders = table(spark, SF_DIR, "orders")
    customer = table(spark, SF_DIR, "customer").withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(customer, "o_custkey").groupBy("c_mktsegment").count()
    salted = salted_join(orders, customer, on="o_custkey", n_salt=8).groupBy(
        "c_mktsegment"
    ).count()
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_hot_keys_only(spark):
    orders = table(spark, SF_DIR, "orders")
    customer = table(spark, SF_DIR, "customer").withColumnRenamed("c_custkey", "o_custkey")
    hot = [r.o_custkey for r in orders.groupBy("o_custkey").count().orderBy(F.desc("count")).limit(3).collect()]
    plain = orders.join(customer, "o_custkey").count()
    salted = salted_join(orders, customer, on="o_custkey", n_salt=8, hot_keys=hot).count()
    assert salted == plain


def test_salted_left_join(spark):
    orders = table(spark, SF_DIR, "orders")
    customer = table(spark, SF_DIR, "customer").withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(customer, "o_custkey", "left").count()
    salted = salted_join(orders, customer, on="o_custkey", n_salt=4, how="left").count()
    assert salted == plain


def test_read_table_rejects_unknown_format(spark):
    import pytest

    with pytest.raises(ValueError, match="unsupported format"):
        read_table(spark, "/tmp/x", fmt="avro")


def test_hash_sample_rejects_bad_rate(spark):
    import pytest
    from streamsurfer_spark.operators.sampling import hash_sample
    from streamsurfer_spark.session import table

    docs = table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError, match="rate_pct"):
        hash_sample(docs, "doc_id", 101)
    assert hash_sample(docs, "doc_id", 0).count() == 0
    assert hash_sample(docs, "doc_id", 100).count() == docs.count()


def test_compact_file_count_and_clustering(spark, tmp_path):
    """compact(): output file count follows the byte-budget plan, and
    cluster_by produces disjoint per-file key ranges (the parquet min/max
    stats a reader prunes on)."""
    import pyarrow.parquet as pq

    from streamsurfer_spark.session import table
    from streamsurfer_spark.sources.files import compact
    from tests.conftest import SF_DIR

    # fragment events into 40 tiny files
    frag = str(tmp_path / "frag")
    table(spark, SF_DIR, "events").repartition(40).write.parquet(frag)

    dest = str(tmp_path / "compacted")
    # target sized so the whole table fits in ONE file
    stats = compact(spark, frag, dest, target_mb=64, cluster_by=["user_id"])
    assert stats["n_input_files"] == 40
    assert stats["n_output_files"] == 1

    # re-fragment target: force multiple output files via a tiny budget
    dest2 = str(tmp_path / "clustered")
    stats2 = compact(spark, frag, dest2, target_mb=0.05, cluster_by=["user_id"])
    assert stats2["n_output_files"] >= 2
    # per-file user_id ranges must be disjoint (range clustering worked)
    import glob

    ranges = []
    for f in sorted(glob.glob(dest2 + "/*.parquet")):
        t = pq.read_table(f, columns=["user_id"])
        vals = t.column("user_id").to_pylist()
        if vals:
            ranges.append((min(vals), max(vals)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: ({lo1},{hi1}) vs ({lo2},{hi2})"
    # row-count parity: compaction moves, never drops
    n_src = spark.read.parquet(frag).count()
    assert spark.read.parquet(dest2).count() == n_src


def test_schema_evolution_merge_read(spark, tmp_path):
    """Parquet schema evolution: a directory whose newer files carry an
    added column reads coherently with mergeSchema — old rows surface NULL,
    and predicate pushdown on the shared columns still reaches the scan."""
    from streamsurfer_spark.plans.inspect import pushed_filters
    from streamsurfer_spark.sources.files import read_table

    d = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string").write.parquet(
        d + "/gen=1"
    )
    spark.createDataFrame(
        [(3, "c", 0.5)], "id long, name string, score double"
    ).write.parquet(d + "/gen=2")

    df = read_table(spark, d, mergeSchema="true").where("id >= 2")
    rows = {r.id: (r.name, r.score) for r in df.collect()}
    assert rows == {2: ("b", None), 3: ("c", 0.5)}
    assert any("id" in f for f in pushed_filters(df))


def test_python_datasource_batch_partition_invariance(spark):
    """Custom Python DataSource (Spark 4 API): content is a pure function of
    event_id — any partition count yields the identical dataset — and the
    partition count requested is the partition count planned."""
    from streamsurfer_spark.sources.synthetic import register, synth_row

    register(spark)
    a = spark.read.format("synthetic_events").option("n", "50").option(
        "partitions", "2"
    ).load()
    b = spark.read.format("synthetic_events").option("n", "50").option(
        "partitions", "7"
    ).load()
    rows_a = sorted(tuple(r) for r in a.collect())
    rows_b = sorted(tuple(r) for r in b.collect())
    assert rows_a == rows_b and len(rows_a) == 50
    assert a.rdd.getNumPartitions() == 2
    assert b.rdd.getNumPartitions() == 7
    # spot-check against the pure generator
    assert rows_a[0] == synth_row(0, 100)


def test_python_datasource_stream_offsets(spark):
    """The stream reader walks the id space in batch_size offsets and the
    union of micro-batches equals the batch read of the same range."""
    import uuid

    from streamsurfer_spark.sources.synthetic import register

    register(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("n", "120")
        .option("batch_size", "50")
        .load()
    )
    name = f"synth_{uuid.uuid4().hex[:8]}"
    # a simple stream reader surfaces one read() per trigger — run a
    # fast processing-time trigger and stop once the id space is drained
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    import time

    deadline = time.time() + 60
    while spark.table(name).count() < 120 and time.time() < deadline:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()
    got = spark.table(name)
    batch = spark.read.format("synthetic_events").option("n", "120").load()
    assert got.count() == 120
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in batch.collect()
    )


def test_xml_round_trip_parity(spark, tmp_path):
    """Built-in XML (Spark 4): events written as XML read back value-equal
    to the parquet source (timestamps rendered to strings first — XML has
    no native timestamp type)."""
    import pyspark.sql.functions as F

    from streamsurfer_spark.session import table
    from streamsurfer_spark.sources.files import read_table, write_table
    from tests.conftest import SF_DIR

    src = (
        table(spark, SF_DIR, "events")
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
        .limit(200)
    )
    d = str(tmp_path / "events_xml")
    write_table(src, d, fmt="xml")
    back = read_table(
        spark,
        d,
        fmt="xml",
        schema="event_id bigint, ts string, user_id bigint, event_type string, value double",
    )
    assert sorted(back.columns) == sorted(src.columns)
    a = sorted(tuple(r) for r in src.collect())
    b = sorted(
        tuple(r[c] for c in src.columns) for r in back.collect()
    )
    assert a == b


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join handling: a 95%-hot key must be flagged skew=true and
    split across tasks in the executed plan — the runtime defense the
    engine leans on before manual salting (operators/skew.py) is needed.
    Thresholds are lowered so fixture-scale data trips the same code path
    production trips at 100 TB."""
    saved = {}
    tuned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
    }
    for k, v in tuned.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        # md5 payload: incompressible, so the hot partition's SHUFFLE bytes
        # (what skew detection measures) reflect its row count
        left = spark.range(0, 300_000).select(
            F.when(F.col("id") < 285_000, 0).otherwise(F.col("id")).alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        right = spark.range(0, 2_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("dim")
        )
        joined = left.join(right, "k").groupBy().count()
        # collect() (not first(), which plans a separate LIMIT query) so THIS
        # DataFrame's AQE plan executes and finalizes
        [row] = joined.collect()
        assert row[0] == 285_000  # every hot-key row matches right's k=0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE did not flag the skewed partition"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_xml_stream_read_gets_row_tag_default(spark, tmp_path):
    """read_stream must apply the same rowTag default as read_table —
    without it Spark raises XML_ROW_TAG_MISSING on a directory the batch
    twin of the same API reads fine (r7 review)."""
    from streamsurfer_spark.sources.files import read_stream, write_table
    from streamsurfer_spark.streaming.ingest import run_to_memory

    d = str(tmp_path / "xmlstream")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    write_table(df, d, fmt="xml")

    stream = read_stream(spark, d, "id long, v string", fmt="xml")
    got = run_to_memory(
        stream.groupBy().count(), output_mode="complete"
    ).collect()
    assert got[0]["count"] == 2


def test_cents_tracker_ignores_non_finite(spark):
    """A NULL value (NaN in the Arrow slice) must contribute 0 to the
    running cent total like the batch F.sum skipping NULLs —
    NaN.astype(int64) is INT64_MIN and silently wrecked the state
    (r7 review)."""
    import pandas as pd

    from streamsurfer_spark.streaming.stateful import _cents_half_up

    assert _cents_half_up(pd.Series([1.0, None, 2.5])) == 350
    assert _cents_half_up(pd.Series([float("nan"), float("inf")])) == 0


def test_salted_join_rejects_build_preserving_how(spark):
    """With the build side exploded across salts, a right/full join would
    return each unmatched build row n_salt times (r7 review, verified by
    execution) — those join types must be rejected."""
    import pytest

    from streamsurfer_spark.operators.skew import salted_join

    probe = spark.createDataFrame([(1, "p1")], "k long, pv string")
    build = spark.createDataFrame([(1, "b1"), (2, "b2")], "k long, bv string")
    with pytest.raises(ValueError, match="probe-preserving"):
        salted_join(probe, build, "k", n_salt=4, how="right")
    # probe-preserving joins stay correct
    assert salted_join(probe, build, "k", n_salt=4).count() == 1
    assert salted_join(probe, build, "k", n_salt=4, how="left").count() == 1


def test_salted_join_scatters_identical_probe_rows(spark):
    """Byte-identical probe rows (the null-ish-defaults hot key) must
    spread across salts — a whole-row hash sent them all to ONE salt,
    defeating the mitigation (r7 review)."""
    import pyspark.sql.functions as F

    from streamsurfer_spark.operators.skew import SALT_COL

    probe = spark.createDataFrame([(1, "same")] * 64, "k long, v string")
    salts = probe.repartition(8).withColumn(
        SALT_COL, F.pmod(F.monotonically_increasing_id(), F.lit(16))
    )
    n_salts = salts.select(SALT_COL).distinct().count()
    assert n_salts > 1
