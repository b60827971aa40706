"""Query registry: every declared query from SURVEY.md §2.3.

Each module exports ``QUERIES: dict[str, QuerySpec]``. A spec couples the
Spark implementation (a callable ``(spark, sf_dir) -> DataFrame``) with the
DuckDB oracle SQL used by the driver's correctness gate. Specs with
``oracle=None`` are non-SQL-expressible and get a rows-only check; they are
covered by unit/property tests instead.

Canonicalization contract (FIXTURES.md §3): every query ends with ORDER BY on
a unique key, doubles go through ROUND, timestamps are rendered as strings in
UTC, and every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One declared query: Spark impl + DuckDB oracle + provenance note."""

    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


# Ordering is load-bearing: the driver's correctness gate evaluates a
# prefix of this dict (50 entries in every round so far). Round-8 window
# policy (continuing the standing rotation):
# (1) the 6 NEW round-8 entries (qt15/ql56/ql57/ql58/ql59/qr73 — no
#     gate row yet) and
#     the 15 entries whose Spark plan changed in round 8: apply_cdc's
#     shared NULL-op guard → qr43 (its ONE registry consumer,
#     relational_q.py:1752 — qs14 reimplements CDC inline and is NOT
#     affected); kmeans_fit's 3-tuple + returned cache → qp06 (ql38/qp03
#     lead band 3); checked_dot's NULL-safe guard → every transitive
#     consumer: cosine_topk (ql03/ql43/ql51/ql52), lsh_ann_pairs (ql10),
#     cosine_near_dup_pairs (ql21/ql23/qp06); the area-review fixes —
#     exact-cents qr18 threshold, validated-input envelope
#     serialization (qv03/qv05/qv08), and the try_*/string-route variant
#     reads + exact half-up sum_div (qr52/qr57, already in the r3 band
#     below). Values are expected unchanged on the shipped fixtures —
#     the gate proves it.
# (2) the ENTIRE 30-entry band whose latest gate row is ROUND 3 — the
#     oldest evidence left after r7 retired the r2 band (histogram going
#     into r8, recomputed from CORRECTNESS_r01..r07: r3=30, r4=24,
#     r5=33, r6=48, r7=50; sums to 185 = the pre-r8 registry). After r8
#     no entry's gate row is older than r4.
# (3) the 2 r8-touched members of the 24-entry r4 band (ql38/qp03),
#     filling the window to exactly 50. The 22 leftover r4 rows
#     (ql07c/ql39/ql40/ql44/ql48/ql49, qr08/qr63-qr67, qr68/qr69/qr71,
#     qs01/qs02/qs11/qs12, qt10/qt11/qt13) are the r9 rotation head. Every entry regardless
#     of window is covered by the standing full-registry sim
#     (tools/driver_sim.py → DRIVER_SIM_r8.txt, ALL PASS).
# (0, continuation session) 17 brand-new entries (ql61-ql67, qt22,
#     qt16-qt21, qp10, qs17, qs18) took the window head, plus qs03/qs08
#     whose ORACLE strings changed (session-gap boundary >= -> >) — zero gate evidence beats
#     re-proving; each is differentially hash-proven at sf0.001+sf0.01
#     AND through targeted vanilla-session driver sims this session.
#     They displaced the prefix-tail rows (see the boundary comment
#     below), which now lead the r9 head.
_VERIFY_FIRST = (
    # (0) new in the r8 continuation session — zero gate evidence beats
    # everything; each is differentially proven at sf0.001+sf0.01 this
    # session (tests/test_properties_r8b.py + targeted driver-sim runs)
    # but has no driver CORRECTNESS row yet
    "ql61_matryoshka_energy",    # NEW: prefix-energy truncation diagnostic
    "ql62_label_silhouette",     # NEW: silhouette vs label centroids
    "qt16_psi_drift",            # NEW: PSI value-distribution drift
    "qt17_linear_attribution",   # NEW: linear multi-touch attribution
    "qp10_retention_waterfall",  # NEW: sequential filter waterfall capstone
    "qs17_stream_heavy_hitters", # NEW: per-window top-K from complete state
    "ql63_entropy_threshold_sweep",  # NEW: quality-threshold retention curve
    "qt18_cusum_changepoint",    # NEW: CUSUM volume changepoint
    "qt19_session_window_native", # NEW: batch session_window parity
    "ql64_cluster_aware_split",  # NEW: leakage-proof cluster-aware split
    "qt20_rolling_actives",      # NEW: rolling DAU/WAU/MAU distinct actives
    "qs18_stream_psi_monitor",   # NEW: streaming PSI drift monitor
    "ql65_source_overlap_matrix",  # NEW: cross-source containment matrix
    "qt21_rolling_median",       # NEW: composed percentile window
    "ql66_source_minhash_jaccard", # NEW: mergeable source MinHash sketch
    "ql67_langid_quality",       # NEW: language-ID classifier QA metrics
    "qt22_seasonal_backtest",    # NEW: seasonal-naive forecast backtest
    "qs03_session_window",       # oracle boundary rule fixed (>= -> >)
    "qs08_stream_sessions",      # oracle boundary rule fixed (>= -> >)
    # (1) new in r8 + r8-changed plans
    "qt15_scd2_user_state",      # NEW: SCD2 history build
    "ql56_weighted_sample",      # NEW: A-ES weighted sampling
    "ql57_embedding_corr",       # NEW: top-variance dim correlations
    "ql58_char_entropy",         # NEW: character-entropy quality signal
    "ql59_robust_outliers",      # NEW: median/MAD length outliers
    "qr43_cdc_apply",            # apply_cdc guard moved before branching
    "qp06_semdedup_report",      # kmeans_fit 3-tuple + cosine pair path
    "ql21_cosine_near_dup",      # checked_dot NULL-safe guard
    "ql03_cosine_topk",          # checked_dot consumer
    "ql10_lsh_ann_pairs",        # checked_dot consumer
    "ql23_dedup_clusters",       # checked_dot consumer (pair graph)
    "ql43_ann_recall",           # checked_dot consumer (exact leg)
    "ql51_hard_negatives",       # checked_dot consumer
    "ql52_multimodal_ann",       # checked_dot consumer (mm_vec leg)
    # r8 area-review plan changes (qr52/qr57 also changed — they are
    # already in the r3 band below): exact-cents qr18 threshold,
    # validated-input envelope serialization. qv08 shares qv05's exact
    # _validated/_VALIDATED_WHERE mechanism, has an r7-fresh gate row,
    # and is differentially tested over the adversarial fixture this
    # round — it yields its slot to the brand-new qr73 (zero evidence
    # beats re-proving a mechanism twice) and leads the r9 head.
    "qr18_subqueries",
    "qv03_origin_stamp",
    "qv05_envelope_json",
    "qr73_hierarchy_rollup",     # NEW: Spark 4 WITH RECURSIVE rollup
    # (2) the r3-latest band — oldest gate evidence
    "ql07b_multimodal_features",  # rows-only spec (pytest + ql07c twin)
    "ql13_fingerprint",
    "ql24_chunk_windows",
    "ql25_pii_redaction",
    "ql26_export_shards",
    "ql28_quantization_error",
    "ql29_split_manifest",
    "ql33_sequence_packing",
    "ql35_domain_mixture",
    "ql41_binary_header",
    "qr45_window_value_fns",
    "qr46_disjunctive_join",
    "qr48_nation_volume",
    # --- window boundary: 19 continuation + 18 + 13 = exactly 50 ---
    # The continuation entries (12 new + the 2 boundary-rule-fixed
    # session oracles, which moved UP into the head since their oracle
    # strings changed this session) displaced the tail of the old prefix
    # (qr54/qr55/qr56/qr57/qr58/qr60/qs04/qs09/qs10/qt03/qt08 from the
    # r3 band, ql38/qp03 from the r4 fill) — those lead the r9 head
    # below, ahead of ql60/qp09. qs08 was already window-bound via the
    # r3 band; its slot moved to the head with the oracle change.
    "qr49_except_all",
    "qr49_intersect_all",
    "qr50_expectations_orders",
    "qr51_grouping_sets",
    "qr52_variant_props",
    "qr54_top_supplier",
    "qr55_empty_result",
    "qr56_inventory_drawdown",
    "qr57_try_arithmetic",
    "qr58_collated_grouping",
    "qr60_priority_lateness",
    "qs04_watermarked_append",
    "qs09_chained_windows",
    "qs10_interval_join",
    "qt03_sessionize",
    "qt08_rolling_anomaly",
    "ql38_kmeans_clusters",      # kmeans_fit 3-tuple caller
    "qp03_ivfpq_build_report",   # kmeans_fit 3-tuple caller
    # overflow head for r9. ql60/qp09 landed AFTER the 50-slot window
    # was already owed to the r3 band + the round's changed set — both
    # are hash-proven this round by targeted runs of the identical
    # rows+schema+hash compare (tools/driver_sim.py) and lead the r9
    # gate window for their first driver rows. Then qv08 (see band-1
    # note) and the leftover r4 band.
    #
    # ALSO changed late in r8 (the llm_q area review: cap replication in
    # the shared bands/shingle twins, BM25 constant interpolation, exact
    # -int ql15/ql28 reformulations, ql07c empty-payload guard):
    # ql02/ql07c/ql09/ql15/ql28/ql32/ql34/ql44/ql45/ql49/ql54 and the
    # qp01/qp05/qp08 capstone twins. All 14 hash-proven by a targeted
    # driver_sim run this round plus cap-binding/empty-payload
    # differential tests; the r9 window MUST rotate them in behind the
    # new entries above.
    "ql60_simhash_hamming",
    "qp09_intake_gate",
    "qs16_stream_outer_join",
    "qv08_batch_wire_format",
    "ql07c_features_parity",
    "ql39_pq_encode",
    "ql40_epoch_plan",
    "ql44_split_leakage",
    "ql48_bpe_pair_stats",
    "ql49_pagerank",
    "qr08_approx_count_distinct",
    "qr63_returned_items",
    "qr64_important_parts",
    "qr65_shipping_speed",
    "qr66_customer_distribution",
    "qr67_supplier_part_counts",
    "qr68_promotable_suppliers",
    "qr69_waiting_suppliers",
    "qr71_approx_quantile_gate",
    "qs01_stream_ingest_counts",
    "qs02_tumbling_window",
    "qs11_stateful_tracker",
    "qs12_stream_temporal_dim",
    "qt10_nearest_error",
    "qt11_seasonal_profile",
    "qt13_cohort_retention",
)


def registry() -> dict[str, QuerySpec]:
    """Aggregate all query modules into one name → spec mapping.

    See _VERIFY_FIRST for the prefix ordering contract; after the explicit
    prefix, families follow in least-externally-verified-first order, with
    oracle-bearing specs before rows-only specs so every slot in the
    verification window buys a full rows+schema+hash check where one exists.
    """
    from streamsurfer_spark.queries import (
        envelope_q,
        llm_q,
        pipeline_q,
        relational_q,
        streaming_q,
        timeseries_q,
    )

    merged: dict[str, QuerySpec] = {}
    for mod in (envelope_q, streaming_q, timeseries_q, pipeline_q, llm_q, relational_q):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update({k: v for k, v in mod.QUERIES.items() if v.oracle is not None})
        merged.update({k: v for k, v in mod.QUERIES.items() if v.oracle is None})

    out: dict[str, QuerySpec] = {}
    for name in _VERIFY_FIRST:
        if name in merged:
            out[name] = merged[name]
    out.update({k: v for k, v in merged.items() if k not in out})
    return out
