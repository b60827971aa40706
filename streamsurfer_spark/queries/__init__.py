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
# ROUND-13 WINDOW (current). Evidence histogram going into r13,
# recomputed from CORRECTNESS_r01..r12 (latest gate row per entry):
# r8=18, r9=45, r10=48, r11=50, r12=50 → all 211 entries gated at
# least once, none older than r8. The 50 slots, per the standing
# policy (changed-this-round + the promised band + the entire oldest
# band, then an oldest-evidence fill):
#   (a) this round's engine-touched entries: qp08 (the bounded-pass
#       band-exchange slicing — r12 verdict item 4 — changes
#       pipeline_q.py's scratch staging; fixture-scale plans collapse
#       to one slice so oracle hashes are unchanged, windowed as the
#       proof), plus ql14 and ql43, the IVF-family representatives for
#       this round's similarity.py edits (Arrow-conf restore around
#       the centroid collect + the pre-cast raw-integer magnitude for
#       the float64 guard — both r12 ADVICE, both fixture-invisible);
#   (b) the ENTIRE 18-entry r8 remainder — the oldest gate evidence in
#       the registry, promised whole at the r13 head by the r12
#       rotation (R13 PLAN in this header's git history; mechanically
#       enforced by the rotation-policy test's missing_stale assert
#       now that CORRECTNESS_r12 is on disk). Includes ql07b, the one
#       rows-only-by-design entry: when its band is the OLDEST the
#       whole-band promise outranks the oracle-first fill preference
#       (it was skipped as a FILL in r12; as stale debt it rotates).
#   (c) a 29-entry fill from the head of the r9 band in registry
#       order (skipping qp08, already windowed at the head):
#       ql03 ql07c ql28 ql39 ql40 ql44 ql48 ql49 ql60 qp01 qp06 qp09
#       qr26 qr28 qr49e qr49i qr50 qr51 qr52 qr54 qr55 qr56 qr57 qr58
#       qr60 qr64 qr65 qr66 qr67.
# 3 + 18 + 29 = exactly 50.
#
# R14 PLAN: after CORRECTNESS_r13 lands the oldest band is the
# 15-entry r9 remainder (qr68 qr69 qs01 qs02 qs04 qs09 qs10 qs11 qs12
# qs16 qt03 qt05 qt08 qt11 qt13); it fits in the r14 window whole
# with ~35 slots for r14-changed entries + the r10 band head; the
# rotation-policy test enforces the promise mechanically.
#
# Every entry regardless of window membership is covered by the
# standing full-registry sim (tools/driver_sim.py → DRIVER_SIM_r*.txt,
# ALL PASS — the identical rows+schema+hash compare, just not
# driver-recorded). Earlier rounds' window layouts and their rationale
# live in this file's git history (r12: commit 0e3cfa3 and before).
_VERIFY_FIRST = (
    # (a) this round's engine-touched entries
    "qp08_canonical_map",
    "ql14_ivf_topk",
    "ql43_ann_recall",
    # (b) the ENTIRE 18-entry r8 remainder — the oldest gate band
    "ql07b_multimodal_features",  # rows-only spec (pytest + ql07c twin)
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
    # (c) the 29-entry head of the r9 band (registry order)
    "ql03_cosine_topk",
    "ql07c_features_parity",
    "ql28_quantization_error",
    "ql39_pq_encode",
    "ql40_epoch_plan",
    "ql44_split_leakage",
    "ql48_bpe_pair_stats",
    "ql49_pagerank",
    "ql60_simhash_hamming",
    "qp01_curation_report",
    "qp06_semdedup_report",
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
    # --- r13 window boundary: exactly 50 entries above ---
    # Post-window order (informational — every entry below has an r9,
    # r10, r11 or r12 gate row; the full-registry sim covers all of
    # them each round): freshest evidence first — the r12 band, then
    # r11, then r10, then the 15-entry r9 remainder promised whole at
    # the r14 head.
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
    "qr71_approx_quantile_gate",
    "qv05_envelope_json",
    "qv08_batch_wire_format",
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
    "ql10_lsh_ann_pairs",
    "ql18_udaf_geo_mean",
    "ql19_grouped_map_zscore",
    "ql21_cosine_near_dup",
    "ql23_dedup_clusters",
    "ql38_kmeans_clusters",
    "ql42_hybrid_rrf",
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
