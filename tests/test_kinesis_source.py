"""Consume-side round trip: sink spool → kinesis_replay source.

The sink ships one JSON-array record per greedy chunk (the reference's
wire format, main.go:266-276); the source must unbatch every record back
into the exact envelope items — batch AND micro-batch stream paths.
"""

from __future__ import annotations

import json

from streamsurfer_spark.session import table
from streamsurfer_spark.sink.config import KinesisSinkConfig
from streamsurfer_spark.sink.kinesis import (
    FileKinesisClient,
    envelope_payload,
    write_batch_to_kinesis,
)
from tests.conftest import SF_DIR


def _fill_spool(spark, spool: str, n: int = 120) -> list[str]:
    """Write n enveloped events through the real sink; return the expected
    item payloads (sorted-key JSON, as the envelope render emits)."""
    cfg = KinesisSinkConfig("rt-stream", max_size_bytes=2048, origin="rt")
    ev = table(spark, SF_DIR, "events").limit(n)
    payloads = envelope_payload(ev, event_col="event_type", ts_col="ts", origin="rt")
    expected = sorted(r.payload for r in payloads.collect())
    write_batch_to_kinesis(payloads, cfg, lambda _cfg: FileKinesisClient(spool))
    return expected


def test_spool_batch_round_trip(spark, tmp_path):
    spool = str(tmp_path / "spool")
    expected = _fill_spool(spark, spool)

    from streamsurfer_spark.sources.kinesis_source import register

    register(spark)
    out = spark.read.format("kinesis_replay").option("spool_dir", spool).load()
    rows = out.collect()

    assert sorted(r.item for r in rows) == expected
    # every item is the sink's envelope: origin stamped, parseable JSON
    assert all(json.loads(r.item)["origin"] == "rt" for r in rows)
    # metadata columns land in the RIGHT columns (a round-6 review found
    # both readers passing them to _unbatch in rotated order): stream is
    # the configured stream name, shard_id the provider's shard, and
    # partition_key the sink's per-record UUID (hex-dashed, not a name)
    assert {r.stream for r in rows} == {"rt-stream"}
    assert all(r.shard_id == "shardId-0" for r in rows)
    assert all(len(r.partition_key) >= 32 and "-" in r.partition_key for r in rows)
    assert not any(r.partition_key == "rt-stream" for r in rows)
    # item_index enumerates within each record; multi-item records exist
    # (2048-byte chunks hold several envelopes)
    per_record = {}
    for r in rows:
        per_record.setdefault((r.record_seq, r.partition_key), []).append(r.item_index)
    assert any(len(v) > 1 for v in per_record.values())
    assert all(sorted(v) == list(range(len(v))) for v in per_record.values())


def test_spool_stream_round_trip(spark, tmp_path):
    spool = str(tmp_path / "spool")
    expected = _fill_spool(spark, spool)

    import time
    import uuid

    from streamsurfer_spark.sources.kinesis_source import register

    register(spark)
    stream = (
        spark.readStream.format("kinesis_replay")
        .option("spool_dir", spool)
        .option("batch_files", "2")  # force multiple micro-batches
        .load()
    )
    # a simple stream reader surfaces one read() per trigger (availableNow
    # falls back to a single batch) — drive with a fast processing-time
    # trigger until the spool is drained, as the synthetic-source test does
    name = f"krt_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    deadline = time.time() + 60
    while spark.table(name).count() < len(expected) and time.time() < deadline:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()
    assert sorted(r.item for r in spark.table(name).collect()) == expected


def test_boto3_gated_and_option_validation(spark):
    import pytest

    from streamsurfer_spark.sources.kinesis_source import (
        KinesisReplaySource,
        _Boto3Reader,
    )

    reader = _Boto3Reader({"stream_name": "s", "region": "us-east-1"})
    try:
        import boto3  # noqa: F401 — probe only

        # boto3 present (real cluster / this container): client constructs
        # without any network call
        assert reader._client() is not None
    except ImportError:
        with pytest.raises(NotImplementedError, match="spool_dir replay"):
            reader._client()
    with pytest.raises(ValueError, match="spool_dir or stream_name"):
        KinesisReplaySource({}).reader(None)
    with pytest.raises(ValueError, match="landing zone"):
        KinesisReplaySource({"stream_name": "s"}).simpleStreamReader(None)


def test_spool_items_matches_datasource(spark, tmp_path):
    """The JVM scan path (spool_items: read.json → from_json array<variant>
    → posexplode → to_json) must agree with the Python DataSource unbatch
    on a real sink-produced spool — the equivalence the 100 TB
    consume-side scan relies on (r7: the one Python-loop row path in the
    repo, now with a codegen twin). Metadata columns are byte-exact; the
    item payloads are JSON-equal (variant normalizes integral doubles,
    "11.0" → "11" — invisible to the from_json consumers downstream, and
    the only render difference on the envelope wire domain)."""
    from streamsurfer_spark.sources.kinesis_source import register, spool_items

    spool = str(tmp_path / "spool")
    _fill_spool(spark, spool)

    register(spark)
    ds = spark.read.format("kinesis_replay").option("spool_dir", spool).load()
    jvm = spool_items(spark, spool)

    assert ds.columns == jvm.columns

    def canon(rows):
        keyed = sorted(
            ((r.stream, r.shard_id, r.partition_key, r.record_seq, r.item_index),
             json.loads(r.item))
            for r in rows
        )
        return keyed

    ds_rows, jvm_rows = canon(ds.collect()), canon(jvm.collect())
    assert len(ds_rows) == len(jvm_rows) > 0
    # python dict equality compares 11.0 == 11 numerically — exactly the
    # normalization tolerance we want
    assert ds_rows == jvm_rows


def test_spool_partitions_are_bounded_groups(tmp_path):
    """Spool batch reads group files into at most max_partitions input
    partitions (default 64) — one-partition-per-file measured super-linear
    at the 30× probe (BASELINE.md round-7). Grouping must preserve each
    file's GLOBAL sorted seq and cover every file exactly once."""
    import os

    from streamsurfer_spark.sources.kinesis_source import _SpoolReader

    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    names = [f"rec_{i:05d}.json" for i in range(200)]
    for n in names:
        with open(os.path.join(spool, n), "w") as f:
            f.write('{"Data": "[]"}')

    parts = _SpoolReader({"spool_dir": spool}).partitions()
    assert len(parts) <= 64
    flat = [pair for p in parts for pair in p.value]
    assert flat == [(n, i) for i, n in enumerate(names)]

    # explicit option honored
    parts4 = _SpoolReader(
        {"spool_dir": spool, "max_partitions": "4"}
    ).partitions()
    assert len(parts4) == 4
    assert [pair for p in parts4 for pair in p.value] == flat


def test_spool_items_failure_parity(spark, tmp_path):
    """The JVM scan must not silently drop what the Python path surfaces
    (r7 review): malformed/missing Data fails LOUDLY naming the file
    (PERMISSIVE from_json + non-outer explode would drop the record with
    zero rows), and a bare-object Data unbatches as a one-item array,
    matching _unbatch's bare-object tolerance."""
    import json as _json
    import os

    import pytest
    from pyspark.errors import SparkRuntimeException

    from streamsurfer_spark.sources.kinesis_source import spool_items

    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    with open(os.path.join(spool, "a_bare.json"), "w") as f:
        _json.dump({"Data": '{"event": "x", "k": 1}', "PartitionKey": "p",
                    "StreamName": "s"}, f)

    rows = spool_items(spark, spool).collect()
    assert len(rows) == 1 and rows[0].item_index == 0
    assert _json.loads(rows[0].item) == {"event": "x", "k": 1}

    with open(os.path.join(spool, "b_malformed.json"), "w") as f:
        _json.dump({"Data": '[{"event": tru', "PartitionKey": "p",
                    "StreamName": "s"}, f)
    with pytest.raises(SparkRuntimeException, match="b_malformed"):
        spool_items(spark, spool).collect()


def test_flush_put_records_parks_on_raising_call():
    """A put_records CALL that raises (socket error — not a per-record
    ErrorCode) must cost one attempt and park the batch, not abort the
    partition mid-flight (r7 review): the reference Flush contract
    (main.go:269-288) returns failed items, never raising away the
    survivors."""
    from streamsurfer_spark.sink.config import KinesisSinkConfig
    from streamsurfer_spark.sink.kinesis import flush_put_records

    class AlwaysRaises:
        calls = 0

        def put_records(self, **kwargs):
            type(self).calls += 1
            raise ConnectionError("reset")

    cfg = KinesisSinkConfig("s")
    records = [{"Data": b"[]", "PartitionKey": "k"}] * 3
    failed = flush_put_records(
        AlwaysRaises(), cfg, records, max_attempts=4, backoff_s=0
    )
    assert failed == records
    assert AlwaysRaises.calls == 4

    class RaisesOnceThenAcks(AlwaysRaises):
        calls = 0

        def put_records(self, **kwargs):
            type(self).calls += 1
            if type(self).calls == 1:
                raise ConnectionError("reset")
            return {"FailedRecordCount": 0,
                    "Records": [{} for _ in kwargs["Records"]]}

    assert flush_put_records(
        RaisesOnceThenAcks(), cfg, records, max_attempts=4, backoff_s=0
    ) == []
    assert RaisesOnceThenAcks.calls == 2


def test_empty_spool_both_paths_return_zero_rows(spark, tmp_path):
    """An EMPTY spool (producer saw zero rows) must read back as an empty
    frame on BOTH consume paths, not error. The round-7 empty-fixture
    sweep caught both: Spark substitutes [None] for an empty DataSource
    partitions() list and still calls read(None) (pyspark worker
    plan_data_source_read), and the JVM scan's *.json glob raises
    PATH_NOT_FOUND when the directory has no spool files."""
    from streamsurfer_spark.sources.kinesis_source import (
        SCHEMA,
        register,
        spool_items,
    )

    spool = str(tmp_path / "empty_spool")
    import os

    os.makedirs(spool)

    register(spark)
    ds = spark.read.format("kinesis_replay").option("spool_dir", spool).load()
    jvm = spool_items(spark, spool)

    assert ds.count() == 0
    assert jvm.count() == 0
    # same shape as the populated path — downstream from_json/aggregate
    # plans bind by name either way
    assert ds.columns == jvm.columns
    assert [f.dataType for f in ds.schema.fields] == [
        f.dataType for f in jvm.schema.fields
    ]
