"""Round-10 pins.

Three r9-ADVICE behavior changes (silhouette ragged attribution, zscore
integrality contract, ql18's NULL-aware oracle guard) plus the second
streaming version sentinel: the session-window exactly-at-gap MERGE rule
(qs03/qt19) — the very rule that hid an 8-round latent oracle bug — gets
the same Spark-upgrade tripwire the qs16 emission rule received in r9.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pyspark
import pytest


def _emb_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )


# --- session-window merge-rule version sentinel (r9 verdict item 3) ---------

# The Spark version BOTH empirically-derived session rules were verified
# on. The rules, restated:
#
# 1. exactly-at-gap MERGE (qs03/qs08 gaps-and-islands oracles, qt19's
#    native session_window twin): an event at exactly last_ts + gap
#    JOINS the open session — Spark unions the adjacent half-open
#    [ts, ts + gap) ranges; only a STRICTLY greater gap splits. The
#    oracles therefore use `> INTERVAL '4 hours'`, never `>=`. This is
#    the rule the planted-boundary test caught after eight hash-green
#    rounds of `>=` (FIXTURES.md §3, time-boundary conventions).
# 2. qt19's native session_window aggregation emits the same merged
#    sessions batch-side, so its oracle inherits rule 1 verbatim.
#
# Continuously re-verified by the wide half-hour-grid differential fuzz
# (gap == 4 h lands on the grid every 8 steps), but ONLY on this version.
_SESSION_MERGE_RULE_DERIVED_ON = "4.1.2"


def test_session_merge_rule_spark_version_sentinel():
    """Fail LOUDLY on a Spark version change instead of letting the
    qs03/qs08/qt19 session oracles hash-diverge in the gate.

    On upgrade: re-run the planted exactly-at-gap boundary tests
    (tests/test_properties_r8b.py) and the qs03/qs08/qt19 wide-grid fuzz
    rows on the new Spark; if session_window's boundary rule changed,
    flip the oracles' `>` to the new rule, then bump the pin here.
    """
    assert pyspark.__version__ == _SESSION_MERGE_RULE_DERIVED_ON, (
        f"Spark version changed ({pyspark.__version__} != "
        f"{_SESSION_MERGE_RULE_DERIVED_ON}): the session-window "
        "exactly-at-gap MERGE rule (qs03/qs08 islands oracles, qt19 "
        "native session_window) was derived empirically on "
        f"{_SESSION_MERGE_RULE_DERIVED_ON} and may have changed. "
        "Re-verify the boundary (see this test's docstring) before "
        "trusting the session oracles."
    )


# --- silhouette ragged attribution (r9 ADVICE item 3) ------------------------

def test_silhouette_ragged_raise_names_row_in_ragged_label(spark):
    """When cross-label centroid dims agree, the per-row check compares
    against the row's OWN label dim, so the raise names a row inside the
    actually-ragged label — not a normal row elsewhere (the old
    corpus-wide array_max compare did exactly that)."""
    from streamsurfer_spark.operators.similarity import label_silhouette

    rows = [
        (1, [1.0, 0.0], 0),         # short row in the ragged label
        (2, [1.0, 0.0, 9.9], 0),    # over-long row defines label 0's dim
        (3, [-1.0, 0.0, 0.0], 1),   # label 1 agrees with label 0's dim
    ]
    with pytest.raises(Exception, match=r"at id=1"):
        label_silhouette(_emb_df(spark, rows)).collect()


def test_silhouette_cross_label_dim_mismatch_names_labels(spark):
    """When every label is internally consistent but labels disagree on
    dim, the label-grain uniformity guard raises naming LABELS — no
    per-row misattribution is possible (each row matches its own label
    dim, so only the label-grain check can fire)."""
    from streamsurfer_spark.operators.similarity import label_silhouette

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.9, 0.1], 0),
        (3, [-1.0, 0.0, 0.0], 1),
    ]
    with pytest.raises(Exception, match="centroid dims differ across labels"):
        label_silhouette(_emb_df(spark, rows)).collect()


# --- zscore integrality contract (r9 ADVICE item 4) ---------------------------

def test_zscore_by_group_float_input_loud_fails(spark):
    """A float-valued value_col must raise, not floor toward zero: int(v)
    silently truncating was a quiet-divergence hazard for any caller that
    violated the docstring-only INTEGER contract."""
    from streamsurfer_spark.operators.udx import zscore_by_group

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "a", 2.0), (3, "a", 3.0)],
        "doc_id long, source string, val double",
    )
    out = zscore_by_group(
        df, "source", "val", "doc_id long, source string, val double, zscore double"
    )
    with pytest.raises(Exception, match="INTEGER"):
        out.collect()


# --- ql18's NULL-aware zero guard (r9 ADVICE item 1) -------------------------

def test_ql18_null_nchars_cross_engine(spark, tmp_path):
    """A NULL n_chars routes to the zero-sentinel on the Spark side
    (group geo-mean 0.0); the oracle's FILTER now counts NULLs too
    (`n_chars <= 0` alone is NULL for NULL input — the r9 ADVICE
    divergence). Differential: both engines on a planted-NULL table."""
    from streamsurfer_spark.queries import registry
    from tests.conftest import assert_matches_oracle

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["alpha beta", "gamma", "delta", "epsilon"], pa.string()),
            "lang": pa.array(["en", "en", "fr", "fr"], pa.string()),
            "source": pa.array(["s0", "s0", "s1", "s1"], pa.string()),
            # en gets a NULL (group must collapse to 0.0 on BOTH engines);
            # fr stays all-positive (normal geo-mean path)
            "n_chars": pa.array([10, None, 5, 7], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    spec = registry()["ql18_udaf_geo_mean"]
    df = spec.spark(spark, str(tmp_path))
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{os.path.join(str(tmp_path), 'documents.parquet')}')"
        )
        assert_matches_oracle(df, con, spec.oracle, name="ql18 planted-NULL")
        rows = {r.lang: r.geo_mean_chars for r in df.collect()}
        assert rows["en"] == 0.0  # NULL routed to the sentinel
        assert rows["fr"] > 0.0
    finally:
        con.close()


# --- qr71 duplicate-aware rank audit (r10 deep-fuzz find) --------------------


def test_qr71_rank_audit_is_duplicate_aware(spark, tmp_path):
    """The GK rank audit must check the target rank against the approx
    value's whole rank INTERVAL [count(<v)+1, count(<=v)], not the upper
    endpoint: a value appearing m times occupies all m ranks, and the
    upper-endpoint form flipped within_tol to False on a perfectly valid
    sketch over 3 identical prices (25-example fuzz falsifying case:
    |100·3 − 50·3| = 150 > tol 100). Fixture prices are near-unique, so
    eight rounds of gate evidence never hit a tie at a probe value.

    Three planted groups: the literal falsifying example (A), a heavy
    duplicate run where the overshoot is maximal (N: 999 copies + 1
    outlier — upper-endpoint error ≈ n·q, far past any tolerance), and a
    distinct-value control (R). Differential vs the oracle (which pins
    within_tol TRUE) plus a direct all-True assert.
    """
    from streamsurfer_spark.queries import registry
    from tests.conftest import assert_matches_oracle

    flags = ["A"] * 3 + ["N"] * 1000 + ["R"] * 100
    prices = (
        [1.0] * 3
        + [2.5] * 999 + [9999.99]
        + [float(i) + 0.25 for i in range(100)]
    )
    t = pa.table(
        {
            "l_returnflag": pa.array(flags, pa.string()),
            "l_extendedprice": pa.array(prices, pa.float64()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "lineitem.parquet"))
    spec = registry()["qr71_approx_quantile_gate"]
    df = spec.spark(spark, str(tmp_path))
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW lineitem AS SELECT * FROM read_parquet("
            f"'{os.path.join(str(tmp_path), 'lineitem.parquet')}')"
        )
        assert_matches_oracle(df, con, spec.oracle, name="qr71 tie audit")
    finally:
        con.close()
    rows = df.collect()
    assert len(rows) == 9 and all(r.within_tol for r in rows)
