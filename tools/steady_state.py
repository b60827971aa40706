"""Steady-state re-measure for bench rows that flap the 2× gate.

BASELINE.md's round-5 protocol, as a standing tool: the bench runs each
query ONCE inside a ~44-query session, so sub-2.5 s rows carry whichever
JIT/GC/first-compile noise lands on them. Adjudicating drift vs noise
needs isolated warm loops: N runs per query (default 4), same session,
warm JVM, noop sink, min/max reported.

Run on a quiet DISK, not just a quiet CPU (r10 lesson, BASELINE.md
"Round 10"): an active dirty-page writeback storm — e.g. minutes after
writing a multi-GB probe corpus — stalls checkpoint-heavy queries
(qp06's per-round CC checkpoints measured 2-3× their band, getting
WORSE across warm runs) while loadavg looks normal. `sync` and let
writeback settle before trusting a measurement.

Usage:  python tools/steady_state.py [runs] name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = sys.argv[1:]
    runs = 4
    if argv and argv[0].isdigit():
        runs, argv = int(argv[0]), argv[1:]
    if not argv:
        raise SystemExit("usage: python tools/steady_state.py [runs] name [name ...]")

    from streamsurfer_spark.queries import registry
    from streamsurfer_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("steady-state")
    reg = registry()
    # one throwaway warm-up job so the first measured loop isn't the
    # session's first codegen/scan
    reg["qr02_filter_agg"].spark(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in argv:
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            reg[name].spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.perf_counter() - t0)
        body = " ".join(f"{t:.2f}" for t in times)
        print(
            f"{name}: min {min(times):.2f}s max {max(times):.2f}s  [{body}]",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
