"""Round-13 property pins.

1. The bench FINAL stdout line must stay inside the driver's
   tail-capture window (r12 verdict item 1: the r12 line carried
   `load_per_query` + `ratio_reruns` + canaries, outgrew the window,
   and the official artifact recorded `parsed: null` — the round's
   perf record simply didn't exist). The adjudication evidence now
   travels on its own earlier stdout line + the BENCH_EVIDENCE.json
   sidecar; this file pins the final record's byte length so it can
   never silently regrow.
2. CANARY_BANDS.json (r12 verdict item 5) must exist, parse, and name
   exactly the metrics bench.py emits, so a judge or the driver can
   adjudicate a hot record mechanically instead of from prose.
"""

from __future__ import annotations

import json
import os


def test_bench_final_record_stays_compact():
    """Build the final record EXACTLY as bench.main() shapes it — every
    key it can emit on a healthy run, all BENCH_QUERIES rows, worst
    realistic widths (4-digit seconds, 3 decimals) — and pin the byte
    length under 2000 (the r11-proven size the driver demonstrably
    parses; the r12 evidence-laden line did not). `errors` /
    `rerun_errors` are excluded: they only appear on broken runs, where
    a fat line is the least of the record's problems."""
    import bench

    out = {
        "metric": "bench_total_wall",
        "value": 9999.999,
        "unit": "sec",
        "queries": {name: 999.999 for name in bench.BENCH_QUERIES},
        "sf": 0.1,
        "loadavg": [99.99, 99.99],
        "membw_mbps": [11499, 11499],
        "matmul_ms": [844.7, 844.7],
    }
    size = len(json.dumps(out))
    assert size < 2000, (
        f"bench final record would be {size} B at {len(bench.BENCH_QUERIES)} "
        "rows — over the pinned compact budget; move any new field to the "
        "bench_evidence line/sidecar instead (module docstring, r12 lesson)"
    )
    # the evidence payload (the fields that blew up the r12 line) must
    # NOT be in the final record's shape
    assert "load_per_query" not in out and "ratio_reruns" not in out


def test_canary_bands_machine_readable():
    """The quiet-band reference data the self-adjudication protocol
    leans on must be committed JSON, keyed by the exact metric names
    bench.py records (r12 verdict item 5)."""
    path = os.path.join(os.path.dirname(__file__), "..", "CANARY_BANDS.json")
    bands = json.load(open(path))
    for metric in ("membw_mbps", "matmul_ms"):
        assert metric in bands, metric
        lo, hi = bands[metric]["quiet_band"]
        assert lo < hi
    q = bands["quiet_if"]
    # the mechanical rule: inside-band iff membw >= floor AND matmul <= cap
    assert q["membw_mbps_min"] <= bands["membw_mbps"]["quiet_band"][0]
    assert q["matmul_ms_max"] >= bands["matmul_ms"]["quiet_band"][1]
