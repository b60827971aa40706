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
# ROUND-11 WINDOW (current). Evidence histogram going into r11,
# recomputed from CORRECTNESS_r01..r10 (latest gate row per entry):
# r6=33, r7=41, r8=40, r9=47, r10=50 → all 211 entries gated at least
# once, none older than r6. The 50 slots, per the standing policy
# (changed-this-round + the promised deferral ledger + the entire
# oldest band, then an oldest-evidence fill):
#   (a) the r10 deferral ledger + this round's changed entries:
#       qr71 (promised verbatim — the interval-based rank audit from
#       the r10 deep-fuzz find, further tightened this round per r10
#       ADVICE: lower bound now 100*(r_lt+1), the documented interval
#       start), and qv05/qv08, whose ORACLES changed this round (the
#       JSON string field now rendered with DuckDB to_json() so the
#       twin escapes quotes/backslashes/control chars exactly as
#       Spark's to_json — the unescaped concat silently diverged on
#       adversarial event names, found by the new envelope fuzz);
#   (b) the ENTIRE 33-entry r6 band — the oldest gate evidence in the
#       registry (ql04 ql06 ql09 ql11 ql15 ql22 ql27 ql30 ql31 ql34
#       ql37 ql45 ql53 ql54 qp02 qp05 qr31 qr32 qr33 qr34 qr36 qr37
#       qr39 qr40 qr41 qr42 qs15 qt12 qt14 qv01 qv02 qv07 qv09);
#   (c) a 14-entry fill from the r7 band, chosen as EXACTLY the r7
#       entries whose only differential evidence was the fixtures at
#       rotation time — the other 27 r7 entries all run generated-frame
#       differential fuzz (24 pre-existing + ql01/ql16/ql17 added to
#       the doc family this round), so fixture-only rows were the
#       scarce-evidence class the slots buy the most for: ql02 ql07
#       ql08 ql12 ql20 ql32 ql46 ql47 ql50 qr17 qr21 qr35 qt06 qt07.
# 3 + 33 + 14 = exactly 50.
#
# POST-ROTATION (same round, after the window landed): the fixture-only
# class was then RETIRED registry-wide — 12 of the 14 fill entries
# gained generated-frame fuzz (doc/emb/wide-events families,
# 25-example hunts zero finds); the remaining two are excluded with
# documented rationale, not by gap (qr21: interpolated-percentile
# half-ulp class the operators don't promise cross-engine — the
# verify-skill gotcha; qr35: synthesized frames only, no generated
# table to vary). The window stays as designed — it was correct at
# rotation time and the gate rows these slots buy are still the
# freshest evidence the class gets.
#
# R12 PLAN (not a deferral — nothing changed is out-of-window): after
# r11 the oldest band is the 27-entry r7 remainder; the rotation-policy
# test (tests/test_properties_r4.py) will require all 27 in the r12
# window, leaving ~23 slots for r12-changed entries + the r8 band head.
#
# Every entry regardless of window membership is covered by the
# standing full-registry sim (tools/driver_sim.py → DRIVER_SIM_r*.txt,
# ALL PASS — the identical rows+schema+hash compare, just not
# driver-recorded). Earlier rounds' window layouts and their rationale
# live in this file's git history (r10: commit ab67056 and before).
_VERIFY_FIRST = (
    # (a) the r10 deferral ledger + this round's oracle-changed entries
    "qr71_approx_quantile_gate",
    "qv05_envelope_json",
    "qv08_batch_wire_format",
    # (b) the ENTIRE r6 band — the oldest gate evidence in the registry
    "ql04_text_stats",
    "ql06_udf_norm_parity",
    "ql09_ngram_jaccard",
    "ql11_quality_features",
    "ql15_label_centroids",
    "ql22_tfidf_top_terms",
    "ql27_bigram_collocations",
    "ql30_decontamination",
    "ql31_repetition_metrics",
    "ql34_cluster_representatives",
    "ql37_duplicate_spans",
    "ql45_minhash_calibration",
    "ql53_vocab_diagnostics",
    "ql54_containment_pairs",
    "qp02_vector_index_report",
    "qp05_export_manifest",
    "qr31_null_semantics",
    "qr32_unpivot",
    "qr33_posexplode",
    "qr34_timezone_pack",
    "qr36_lateral_topk",
    "qr37_salted_join",
    "qr39_large_volume_customers",
    "qr40_scd2_intervals",
    "qr41_dormant_customers",
    "qr42_upsert_snapshot",
    "qs15_stream_lsh_dedup",
    "qt12_funnel",
    "qt14_transition_matrix",
    "qv01_validate_required",
    "qv02_payload_parse",
    "qv07_json_typed_parse",
    "qv09_consume_roundtrip",
    # (c) the 14 fixture-only r7 entries (every other r7 entry carries
    # generated-frame fuzz evidence; see the header comment)
    "ql02_minhash_lsh_pairs",
    "ql07_multimodal_envelope",
    "ql08_simhash",
    "ql12_language_id",
    "ql20_udtf_tokenize",
    "ql32_bm25_topk",
    "ql46_dsir_importance",
    "ql47_perplexity_buckets",
    "ql50_snapshot_novelty",
    "qr17_array_fns",
    "qr21_percentiles",
    "qr35_lambda_pack",
    "qt06_resample_interpolate",
    "qt07_ewma_smoothing",
    # --- r11 window boundary: exactly 50 entries above ---
    # Post-window order (informational — every entry below has an r8,
    # r9 or r10 gate row; the full-registry sim covers all of them each
    # round): freshest evidence first — the r10 band, then r9, then r8,
    # then the 27-entry r7 remainder promised whole at the r12 head.
    "ql10_lsh_ann_pairs",
    "ql18_udaf_geo_mean",
    "ql19_grouped_map_zscore",
    "ql21_cosine_near_dup",
    "ql23_dedup_clusters",
    "ql38_kmeans_clusters",
    "ql42_hybrid_rrf",
    "ql43_ann_recall",
    "ql51_hard_negatives",
    "ql52_multimodal_ann",
    "ql62_label_silhouette",
    "qp03_ivfpq_build_report",
    "qp04_quality_dashboard",
    "qr01_scan_checksum",
    "qr02_filter_agg",
    "qr03_join_orders_customer",
    "qr04_multiway_join",
    "qr05_anti_join",
    "qr05_left_join_histogram",
    "qr05_semi_join",
    "qr07_count_distinct",
    "qr08_approx_count_distinct",
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
    "qr63_returned_items",
    "qr70_schema_evolution",
    "qs07_update_mode",
    "qs13_foreachbatch_upsert",
    "qs14_stream_cdc_apply",
    "qt10_nearest_error",
    "qv06_json_extract",
    "ql03_cosine_topk",
    "ql07c_features_parity",
    "ql14_ivf_topk",
    "ql28_quantization_error",
    "ql39_pq_encode",
    "ql40_epoch_plan",
    "ql44_split_leakage",
    "ql48_bpe_pair_stats",
    "ql49_pagerank",
    "ql60_simhash_hamming",
    "qp01_curation_report",
    "qp06_semdedup_report",
    "qp08_canonical_map",
    "qp09_intake_gate",
    "qr26_stats_pack",
    "qr28_filtered_agg",
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
    "qr64_important_parts",
    "qr65_shipping_speed",
    "qr66_customer_distribution",
    "qr67_supplier_part_counts",
    "qr68_promotable_suppliers",
    "qr69_waiting_suppliers",
    "qs01_stream_ingest_counts",
    "qs02_tumbling_window",
    "qs04_watermarked_append",
    "qs09_chained_windows",
    "qs10_interval_join",
    "qs11_stateful_tracker",
    "qs12_stream_temporal_dim",
    "qs16_stream_outer_join",
    "qt03_sessionize",
    "qt05_ohlc_bars",
    "qt08_rolling_anomaly",
    "qt11_seasonal_profile",
    "qt13_cohort_retention",
    "ql07b_multimodal_features",  # rows-only spec (pytest + ql07c twin)
    "ql13_fingerprint",
    "ql24_chunk_windows",
    "ql25_pii_redaction",
    "ql26_export_shards",
    "ql29_split_manifest",
    "ql33_sequence_packing",
    "ql35_domain_mixture",
    "ql41_binary_header",
    "ql56_weighted_sample",
    "ql57_embedding_corr",
    "ql58_char_entropy",
    "ql59_robust_outliers",
    "ql61_matryoshka_energy",
    "ql63_entropy_threshold_sweep",
    "ql64_cluster_aware_split",
    "ql65_source_overlap_matrix",
    "ql66_source_minhash_jaccard",
    "ql67_langid_quality",
    "qp10_retention_waterfall",
    "qr18_subqueries",
    "qr43_cdc_apply",
    "qr45_window_value_fns",
    "qr46_disjunctive_join",
    "qr48_nation_volume",
    "qr73_hierarchy_rollup",
    "qs03_session_window",
    "qs08_stream_sessions",
    "qs17_stream_heavy_hitters",
    "qs18_stream_psi_monitor",
    "qt15_scd2_user_state",
    "qt16_psi_drift",
    "qt17_linear_attribution",
    "qt18_cusum_changepoint",
    "qt19_session_window_native",
    "qt20_rolling_actives",
    "qt21_rolling_median",
    "qt22_seasonal_backtest",
    "qv03_origin_stamp",
    "ql01_exact_dedup",
    "ql05_top_terms",
    "ql16_hash_sample",
    "ql17_stratified_sample",
    "ql36_unigram_surprisal",
    "ql55_gopher_rules",
    "qp07_training_mix",
    "qp07b_training_mix_manifest",
    "qr06_hash_agg_q1",
    "qr10b_window_analytics",
    "qr16_math_decimal",
    "qr38_shipping_priority",
    "qr47_promo_share",
    "qr53_small_quantity_revenue",
    "qr59_min_cost_supplier",
    "qr61_market_share",
    "qr62_product_profit",
    "qr72_winsorized_stats",
    "qs02b_sliding_window",
    "qs05_dedup_earliest",
    "qs06_stream_static_join",
    "qt01_asof_last_click",
    "qt02_range_join_errors",
    "qt04_gapfill_daily",
    "qt09_time_weighted_avg",
    "qv04_ts_render",
    "qv10_put_records_roundtrip",
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
