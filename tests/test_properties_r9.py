"""Round-9 pins.

Version sentinel for the empirically-derived streaming emission rules: the
qs16 stream-stream LEFT OUTER NULL-emission cutoff encodes an undocumented
Spark internal, so a Spark upgrade must fail HERE with a named rule to
re-verify — not as a silent hash flip in the driver's correctness gate.
"""

from __future__ import annotations

import pyspark

# The Spark version the qs16 outer-emission rule was derived and
# oracle-pinned on (streamsurfer_spark/queries/streaming_q.py, qs16
# docstring). The rule, restated:
#
#   effective watermark = MIN over both filtered input streams of
#   (that stream's max observed event time − delay); an unmatched left
#   row emits NULL-padded iff ts + upper_bound < that watermark, in the
#   post-data no-data batch of an availableNow run.
#
# Both clauses are Spark-internal behavior (per-stream watermark
# accounting under a shared source file; no-data-batch state eviction
# timing), verified empirically by exact ID-set parity at sf0.001 and
# sf0.01 and continuously by the wide-grid differential fuzz
# (test_differential_fuzz.py::test_generated_wide_events_match_oracle).
_QS16_RULE_DERIVED_ON = "4.1.2"


def test_qs16_emission_rule_spark_version_sentinel():
    """Fail LOUDLY on a Spark version change instead of letting the qs16
    oracle hash-diverge in the gate.

    On upgrade: re-run the qs16 wide-grid fuzz and the sf0.001/sf0.01
    ID-set parity check against the new Spark; if the emission rule
    changed, update QS16_SQL's wm CTE to the new rule, then bump the
    pinned version here.
    """
    assert pyspark.__version__ == _QS16_RULE_DERIVED_ON, (
        f"Spark version changed ({pyspark.__version__} != "
        f"{_QS16_RULE_DERIVED_ON}): the qs16_stream_outer_join "
        "NULL-emission rule (min-over-streams effective watermark + "
        "no-data-batch eviction cutoff) was derived empirically on "
        f"{_QS16_RULE_DERIVED_ON} and may have changed. Re-verify the "
        "rule (see this test's docstring) before trusting QS16_SQL."
    )


def test_cosine_topk_zero_vector_excluded(spark):
    """The zero-norm class (r9 deep-fuzz find #3), pinned deterministically:
    a zero vector neither ranks as a neighbor nor emits rows as a probe —
    and the job does NOT die with an ANSI DIVIDE_BY_ZERO."""
    from streamsurfer_spark.operators.similarity import cosine_topk

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 0.0]),  # zero vector
            (3, [-1.0, 0.0]),
        ],
        "vec_id bigint, embedding array<double>",
    )
    out = cosine_topk(df, df, k=3).collect()
    ids = {r.vec_id for r in out} | {r.probe_id for r in out}
    assert 2 not in ids, "zero vector must not rank or probe"
    assert all(r.sim is not None for r in out)


def test_cosine_near_dup_zero_vector_never_pairs(spark):
    """Threshold form of the same class: a zero vector near-dups NOTHING
    (NULL sim fails the threshold on both engines), and no ANSI raise."""
    from streamsurfer_spark.operators.similarity import cosine_near_dup_pairs

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [1.0, 0.001], 0),
            (2, [0.0, 0.0], 0),  # zero vector, same block
        ],
        "vec_id bigint, embedding array<double>, label int",
    )
    pairs = cosine_near_dup_pairs(df, 0.9, block_col="label").collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(0, 1)}
