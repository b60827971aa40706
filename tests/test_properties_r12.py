"""Round-12 property pins.

1. The ContextCleaner-GC empirical rule behind qp08's bounded passes
   gets its version sentinel (r11 verdict item 4): the rule joins the
   empirical-rule inventory in test_properties_r11.
2. bench.py's BASELINE_SEC table (the r12 load self-adjudication —
   r11 verdict item 1) must cover exactly BENCH_QUERIES, so no bench
   row can land ratio-blind and no stale key can linger after a row
   is retired.
"""

from __future__ import annotations

import pyspark

# EMPIRICAL RULE (pipeline_q.qp08_canonical_map_bounded): after the
# last Python references to a pass's DataFrames are dropped, a
# `spark.sparkContext._jvm.System.gc()` call makes ContextCleaner
# enqueue the dead ShuffleDependency cleanups promptly enough that the
# pass's shuffle files are deleted BEFORE the next pass writes its own
# — the property the bounded-scratch claim rests on (r11 1000× probe:
# 54.8 GB peak vs two monolithic DNFs; without the GC the passes'
# scratch ADDS). Observed behavior, not documented API — ContextCleaner
# is driven by JVM weak-reference processing, and `_jvm` itself is a
# private py4j surface that a Spark release may rename or gate.
#
# On upgrade: re-run tools/qp08_bounded_probe.py at a replica count
# big enough that per-pass scratch is visible (≥100×) and confirm
# scratch plateaus per-pass instead of climbing monotonically; then
# bump the pin.
_CONTEXTCLEANER_GC_RULE_DERIVED_ON = "4.1.2"


def test_contextcleaner_gc_rule_spark_version_sentinel():
    """Fail LOUDLY on a Spark version change instead of letting the
    bounded-pass scratch bound silently stop holding (or the private
    `_jvm` access start raising) — see the rule note above."""
    assert pyspark.__version__ == _CONTEXTCLEANER_GC_RULE_DERIVED_ON, (
        f"Spark version changed ({pyspark.__version__} != "
        f"{_CONTEXTCLEANER_GC_RULE_DERIVED_ON}): the ContextCleaner-"
        "promptness-after-System.gc() rule and the private _jvm access "
        "in qp08_canonical_map_bounded were derived empirically on "
        f"{_CONTEXTCLEANER_GC_RULE_DERIVED_ON} — re-verify per the rule "
        "note, then bump the pin."
    )


def test_bench_baseline_table_covers_bench_queries_exactly():
    """Every bench row needs a BASELINE_SEC entry (else its expensive-row
    reading is a one-shot hostage to host load again — the exact r10/r11
    failure mode item 1 closes), and no entry may outlive its row."""
    import bench

    missing = set(bench.BENCH_QUERIES) - set(bench.BASELINE_SEC)
    stale = set(bench.BASELINE_SEC) - set(bench.BENCH_QUERIES)
    assert not missing, f"bench rows without a baseline number: {missing}"
    assert not stale, f"baseline numbers without a bench row: {stale}"
    assert all(v > 0 for v in bench.BASELINE_SEC.values())
    # the trigger must sit strictly inside the 2x grade gate
    assert 1.0 < bench.RERUN_RATIO < 2.0
