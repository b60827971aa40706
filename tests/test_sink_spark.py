"""End-to-end sink test: events DataFrame → envelope → per-partition
chunking → (file-backed) put_record, entirely executor-side (Q-S6 seam)."""

from __future__ import annotations

import glob
import json

from streamsurfer_spark.session import table
from streamsurfer_spark.sink.config import KinesisSinkConfig
from streamsurfer_spark.sink.kinesis import (
    FileKinesisClient,
    envelope_payload,
    write_batch_to_kinesis,
)
from tests.conftest import SF_DIR


def test_batch_sink_end_to_end(spark, tmp_path):
    spool = str(tmp_path / "spool")
    cfg = KinesisSinkConfig("test-stream", max_size_bytes=4096, origin="e2e")
    ev = table(spark, SF_DIR, "events").limit(200)
    n_events = ev.count()

    payloads = envelope_payload(ev, event_col="event_type", ts_col="ts", origin="e2e")
    write_batch_to_kinesis(payloads, cfg, lambda _cfg: FileKinesisClient(spool))

    records = [json.load(open(p)) for p in glob.glob(f"{spool}/*.json")]
    assert records, "sink wrote no records"

    total = 0
    for rec in records:
        assert rec["StreamName"] == "test-stream"
        batch = json.loads(rec["Data"])  # each record is one JSON array
        assert isinstance(batch, list) and batch
        total += len(batch)
        for event in batch:
            assert event["origin"] == "e2e"
            assert event["server_timestamp"].endswith("Z")
    assert total == n_events

    # per-record payload stays within one item of the threshold (the
    # reference counts item bytes, not array overhead — main.go:203/267)
    sizes = sorted(len(json.dumps(json.loads(r["Data"]), separators=(",", ":"))) for r in records)
    assert sizes[0] > 0


# --- round-6: PutRecords partial-failure passback (r5 verdict item 6) --------
#
# The Kinesis batch API rejects any SUBSET of a call (per-record ErrorCode)
# while accepting the rest; the sink must retry only the failed records and
# pass survivors-of-all-retries back (the reference Flush's failed-items
# contract, main.go:269-288), never silently dropping or double-sending.

import pytest
from hypothesis import given, settings, strategies as st

from streamsurfer_spark.sink.kinesis import (
    MockKinesisClient,
    flush_put_records,
    write_partition,
)


def _mk_rows(n):
    return [{"payload": '{"event":"e","n":%d}' % i} for i in range(n)]


@given(
    n_chunks=st.integers(min_value=1, max_value=30),
    fail_pattern=st.lists(
        st.sets(st.integers(min_value=0, max_value=29), max_size=12),
        max_size=4,
    ),
    attempts=st.integers(min_value=1, max_value=5),
)
@settings(max_examples=60, deadline=None)
def test_put_records_every_record_acked_once_or_passed_back(
    n_chunks, fail_pattern, attempts
):
    """Conservation law: each submitted record is either acknowledged by
    the mock exactly once, or returned in the failed list — regardless of
    which subsets fail on which retry pass."""
    cfg = KinesisSinkConfig("s", max_size_bytes=1 << 20)
    client = MockKinesisClient(partial_failures=fail_pattern)
    records = [
        {"Data": b"[%d]" % i, "PartitionKey": str(i)} for i in range(n_chunks)
    ]
    failed = flush_put_records(client, cfg, records, max_attempts=attempts, backoff_s=0)

    acked = [r["Data"] for r in client.records]
    assert len(acked) == len(set(acked)), "a record was double-sent"
    assert sorted(acked + [r["Data"] for r in failed]) == sorted(
        r["Data"] for r in records
    ), "records lost or invented"
    # each retry pass resubmits EXACTLY the previous pass's failed
    # entries, in order — never an acked record, never a dropped one
    for k, (call, nxt) in enumerate(
        zip(client.put_records_calls, client.put_records_calls[1:])
    ):
        failing = fail_pattern[k] if k < len(fail_pattern) else set()
        expected = [r["Data"] for i, r in enumerate(call) if i in failing]
        assert [r["Data"] for r in nxt] == expected


def test_put_records_full_success_is_single_call():
    cfg = KinesisSinkConfig("s", max_size_bytes=1 << 20)
    client = MockKinesisClient()
    records = [{"Data": b"[1]", "PartitionKey": "k"}] * 3
    assert flush_put_records(client, cfg, records) == []
    assert len(client.put_records_calls) == 1


def test_put_records_retry_then_success():
    """Records failing on pass 1 are resubmitted alone and succeed."""
    cfg = KinesisSinkConfig("s", max_size_bytes=1 << 20)
    client = MockKinesisClient(partial_failures=[{0, 2}])
    records = [{"Data": b"[%d]" % i, "PartitionKey": str(i)} for i in range(4)]
    failed = flush_put_records(client, cfg, records, max_attempts=3, backoff_s=0)
    assert failed == []
    assert [r["Data"] for r in client.put_records_calls[1]] == [b"[0]", b"[2]"]
    assert sorted(r["Data"] for r in client.records) == sorted(
        r["Data"] for r in records
    )


def test_put_records_exhausted_retries_pass_failed_back():
    """A record failing EVERY pass survives into the failed list with its
    payload intact — Flush's failed-items contract."""
    cfg = KinesisSinkConfig("s", max_size_bytes=1 << 20)
    # index 1 fails in pass 1; the resubmitted batch is [rec1] where it is
    # index 0 — fail it on every subsequent pass too
    client = MockKinesisClient(partial_failures=[{1}, {0}, {0}, {0}, {0}])
    records = [{"Data": b"[%d]" % i, "PartitionKey": str(i)} for i in range(3)]
    failed = flush_put_records(client, cfg, records, max_attempts=3, backoff_s=0)
    assert [r["Data"] for r in failed] == [b"[1]"]


def test_write_partition_put_records_loud_on_dead_records():
    """write_partition with no on_failed handler must raise when records
    exhaust their retries — silent drop is the one unacceptable outcome."""
    cfg = KinesisSinkConfig("s", max_size_bytes=64)
    client = MockKinesisClient(
        partial_failures=[{0}, {0}, {0}, {0}, {0}, {0}]
    )
    with pytest.raises(RuntimeError, match="failed to put"):
        write_partition(
            iter(_mk_rows(10)), cfg, lambda c: client, use_put_records=True
        )


def test_write_partition_put_records_failed_handler_receives_payloads():
    cfg = KinesisSinkConfig("s", max_size_bytes=64)
    client = MockKinesisClient(
        partial_failures=[{0}, {0}, {0}, {0}, {0}, {0}]
    )
    out: list[dict] = []
    n = write_partition(
        iter(_mk_rows(10)),
        cfg,
        lambda c: client,
        use_put_records=True,
        on_failed=out.extend,
    )
    assert len(out) == 1 and out[0]["Data"].startswith(b"[")
    # acked + passed-back covers every chunk exactly once
    assert n == len(client.records)
    assert n + len(out) == len(client.put_records_calls[0])


# --- round-7: PutRecord-per-chunk path honors the same failed-items contract
#
# Before r7 the default (non-batch) path raised mid-partition on the first
# client error, stranding every later chunk — while the docstring cited the
# reference Flush contract (main.go:269-288) for the whole function. Now a
# chunk whose put_record exhausts the retry budget is parked and the rest
# of the partition still ships.


class FlakyPutRecordClient:
    """put_record raises for chunk payloads in ``fail_chunks`` (by call
    order of FIRST attempt) for the first ``fail_times`` attempts each."""

    def __init__(self, fail_chunks: set[int], fail_times: int = 10**9) -> None:
        self.records: list[dict] = []
        self.fail_chunks = fail_chunks
        self.fail_times = fail_times
        self.seen: dict[bytes, int] = {}
        self._failed: dict[bytes, int] = {}

    def put_record(self, **record) -> dict:
        data = record["Data"]
        if data not in self.seen:
            self.seen[data] = len(self.seen)
        if self.seen[data] in self.fail_chunks and self._failed.get(data, 0) < self.fail_times:
            self._failed[data] = self._failed.get(data, 0) + 1
            raise RuntimeError("mock put_record failure")
        self.records.append(record)
        return {"SequenceNumber": str(len(self.records)), "ShardId": "shardId-0"}


def test_write_partition_put_record_parks_failed_and_ships_rest():
    cfg = KinesisSinkConfig("s", max_size_bytes=64)
    client = FlakyPutRecordClient(fail_chunks={1})
    out: list[dict] = []
    n = write_partition(
        iter(_mk_rows(10)),
        cfg,
        lambda c: client,
        on_failed=out.extend,
        backoff_s=0,
    )
    # the poisoned chunk is passed back; every other chunk still shipped
    assert len(out) == 1 and out[0]["Data"].startswith(b"[")
    assert n == len(client.records)
    assert n + len(out) == len(client.seen)
    assert out[0]["Data"] not in [r["Data"] for r in client.records]


def test_write_partition_put_record_loud_without_handler():
    cfg = KinesisSinkConfig("s", max_size_bytes=64)
    client = FlakyPutRecordClient(fail_chunks={0})
    with pytest.raises(RuntimeError, match="failed to put"):
        write_partition(iter(_mk_rows(10)), cfg, lambda c: client, backoff_s=0)
    # later chunks were still attempted and shipped before the loud error
    assert len(client.records) > 0


def test_write_partition_put_record_transient_failure_recovers():
    cfg = KinesisSinkConfig("s", max_size_bytes=64)
    client = FlakyPutRecordClient(fail_chunks={0, 2}, fail_times=2)
    out: list[dict] = []
    n = write_partition(
        iter(_mk_rows(10)),
        cfg,
        lambda c: client,
        on_failed=out.extend,
        backoff_s=0,
    )
    # transient (< retry budget) failures recover in place: nothing parked,
    # every chunk acked exactly once
    assert out == []
    assert n == len(client.seen) == len(client.records)
