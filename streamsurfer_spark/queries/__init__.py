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
# prefix of this dict (50 entries in every round so far).
#
# ROUND-10 WINDOW (current). Evidence histogram going into r10,
# recomputed from CORRECTNESS_r01..r09 (latest gate row per entry):
# r4=5, r5=33, r6=34, r7=43, r8=46, r9=50 → all 211 entries gated at
# least once. The 50 slots, per the standing policy (changed-this-round
# + the promised deferral ledger + the entire oldest bands):
#   (a) the 3 entries whose plan or oracle changed THIS round, all from
#       r9 ADVICE: ql18 (oracle's zero-guard made NULL-aware — the
#       FILTER missed NULL n_chars while count(*) counted it), ql19
#       (loud-fail integrality assert in zscore_by_group — int(v) was
#       silently flooring float inputs), ql62 (ragged-embedding check
#       now compares each row to its OWN label's centroid dim, plus a
#       label-grain cross-dim uniformity raise — the corpus-wide
#       array_max compare blamed normal rows);
#   (b) the ENTIRE 16-entry r9 deferral ledger, honored verbatim:
#       qv08 (deferred twice), qt10/qr08/qr63/ql38/qp03 (the whole r4
#       band — the oldest evidence anywhere), qp04, the 7 zero-norm-
#       class siblings ql10/ql21/ql23/ql42/ql43/ql51/ql52 (plans AND
#       oracles changed in r9, carried only targeted-sim + fuzz
#       evidence), and qs13/qs14;
#   (c) the remaining 31 entries of the r5 band — with qs13/qs14
#       already in (b), the window retires the ENTIRE r5 band, so
#       after r10 no gate row anywhere is older than r6.
# 3 + 16 + 31 = exactly 50. No deferrals this round: every promised
# entry and every changed entry is in-window.
#
# R11 DEFERRAL LEDGER (one entry): qr71_approx_quantile_gate's plan
# changed AFTER the r10 rotation (the r10 deep fuzz caught its rank
# audit flipping within_tol on duplicate runs; the audit is now
# interval-based — relational_q.py docstring has the find). The r10
# window was already exactly 50, so per the r8/r9 overflow precedent
# qr71 re-gates at the NEXT window head; this round it carries the
# targeted-sim green (gate form, sf0.01), the replayed falsifying
# example, a fresh 25-example fuzz run, and the deterministic tie pin
# (tests/test_properties_r10.py::test_qr71_rank_audit_is_duplicate_aware).
#
# Every entry regardless of window membership is covered by the
# standing full-registry sim (tools/driver_sim.py → DRIVER_SIM_r*.txt,
# ALL PASS — the identical rows+schema+hash compare, just not
# driver-recorded). Earlier rounds' window layouts and their rationale
# live in this file's git history (r9: commit a82f86a and before).
_VERIFY_FIRST = (
    # (a) plan/oracle changed this round (r9 ADVICE fixes)
    "ql18_udaf_geo_mean",
    "ql19_grouped_map_zscore",
    "ql62_label_silhouette",
    # (b) the r9 deferral ledger, in the order it was promised:
    # qv08 first (deferred in both r8 and r9) …
    "qv08_batch_wire_format",
    # … the whole r4 band (oldest gate evidence in the registry) …
    "qt10_nearest_error",
    "qr08_approx_count_distinct",
    "qr63_returned_items",
    "ql38_kmeans_clusters",
    "qp03_ivfpq_build_report",
    # … the r6 kmeans-family filler deferred alongside them …
    "qp04_quality_dashboard",
    # … the 7 zero-norm-class siblings (r9 plans+oracles changed;
    # gate evidence predates the change — the r8 overflow precedent
    # says they re-gate at the next window head) …
    "ql10_lsh_ann_pairs",
    "ql21_cosine_near_dup",
    "ql23_dedup_clusters",
    "ql42_hybrid_rrf",
    "ql43_ann_recall",
    "ql51_hard_negatives",
    "ql52_multimodal_ann",
    # … and the two r5-band streaming rows named in the ledger (also
    # freshly wide-grid-fuzzed in r9)
    "qs13_foreachbatch_upsert",
    "qs14_stream_cdc_apply",
    # (c) the remaining 31 entries of the r5 band — the whole band
    # retires this round (r10 additionally re-fuzzed qs07 through the
    # half-hour wide grid alongside the other previously fixture-only
    # streaming oracles)
    "qr01_scan_checksum",
    "qr02_filter_agg",
    "qr03_join_orders_customer",
    "qr04_multiway_join",
    "qr05_anti_join",
    "qr05_left_join_histogram",
    "qr05_semi_join",
    "qr07_count_distinct",
    "qr09_rollup",
    "qr09b_cube",
    "qr10_window_rank",
    "qr11_window_running",
    "qr12_topk",
    "qr13_except",
    "qr13_intersect",
    "qr13_union",
    "qr14_string_fns",
    "qr15_date_fns",
    "qr19_case_when",
    "qr20_pivot",
    "qr22_histogram",
    "qr23_levenshtein_pairs",
    "qr24_bit_and_array_ops",
    "qr25_full_outer_join",
    "qr27_string_agg",
    "qr29_range_frame",
    "qr30_arg_extrema",
    "qr44_profile_orders",
    "qr70_schema_evolution",
    "qs07_update_mode",
    "qv06_json_extract",
    # --- r10 window boundary: exactly 50 entries above ---
    # Post-window order (informational — every entry below has an r8 or
    # r9 gate row; the full-registry sim covers all of them each round):
    # first the r9 window's members (freshest evidence), then the r8
    # window's, newest first.
    "ql60_simhash_hamming",
    "qp09_intake_gate",
    "qs16_stream_outer_join",
    "ql07c_features_parity",
    "ql39_pq_encode",
    "ql40_epoch_plan",
    "ql44_split_leakage",
    "ql48_bpe_pair_stats",
    "ql49_pagerank",
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
    "qt11_seasonal_profile",
    "qt13_cohort_retention",
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
    "qt05_ohlc_bars",
    "ql28_quantization_error",
    "qp06_semdedup_report",
    "qp08_canonical_map",
    "qr26_stats_pack",
    "qp01_curation_report",
    "qr28_filtered_agg",
    "ql03_cosine_topk",
    "ql14_ivf_topk",
    "ql61_matryoshka_energy",
    "qt16_psi_drift",
    "qt17_linear_attribution",
    "qp10_retention_waterfall",
    "qs17_stream_heavy_hitters",
    "ql63_entropy_threshold_sweep",
    "qt18_cusum_changepoint",
    "qt19_session_window_native",
    "ql64_cluster_aware_split",
    "qt20_rolling_actives",
    "qs18_stream_psi_monitor",
    "ql65_source_overlap_matrix",
    "qt21_rolling_median",
    "ql66_source_minhash_jaccard",
    "ql67_langid_quality",
    "qt22_seasonal_backtest",
    "qs03_session_window",
    "qs08_stream_sessions",
    "qt15_scd2_user_state",
    "ql56_weighted_sample",
    "ql57_embedding_corr",
    "ql58_char_entropy",
    "ql59_robust_outliers",
    "qr43_cdc_apply",
    "qr18_subqueries",
    "qv03_origin_stamp",
    "qv05_envelope_json",
    "qr73_hierarchy_rollup",
    "ql07b_multimodal_features",  # rows-only spec (pytest + ql07c twin)
    "ql13_fingerprint",
    "ql24_chunk_windows",
    "ql25_pii_redaction",
    "ql26_export_shards",
    "ql29_split_manifest",
    "ql33_sequence_packing",
    "ql35_domain_mixture",
    "ql41_binary_header",
    "qr45_window_value_fns",
    "qr46_disjunctive_join",
    "qr48_nation_volume",
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
