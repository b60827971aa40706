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
# prefix of this dict (~50 entries). Round-4 window, in order:
# (1) the only queries with no driver row in ANY round (qr63-qr69),
# (2) qr08, whose exact-twin oracle postdates its only (r1) driver row,
# (3) queries NEW in round 4,
# (4) queries whose execution path CHANGED in round 4 (scatter-hash
#     codebook init, DECIMAL epoch budget, half-up tracker cents, cosine
#     block cap, hashed-shingle span coverage) — a fresh green row proves
#     each Spark+oracle lockstep update,
# (5) rotation: real streaming runs and event-time readers (fixture ts
#     churn), Python-boundary paths, then the least-recently-verified
#     capstones and dedup/ANN family.
# After round 4 the overflow tail consists ONLY of entries already
# hash-verified green in rounds 1-3 and unchanged since.
_VERIFY_FIRST = (
    # (1) the LAST queries with no driver row in ANY round: the round-2
    # TPC-H completion tail (rounds 1-3 windows never reached them)
    "qr63_returned_items",
    "qr64_important_parts",
    "qr65_shipping_speed",
    "qr66_customer_distribution",
    "qr67_supplier_part_counts",
    "qr68_promotable_suppliers",
    "qr69_waiting_suppliers",
    # (2) qr08: its exact-twin tolerance oracle landed in r2 but its only
    # driver row predates it (r1, rows-only) — verification-stale
    "qr08_approx_count_distinct",
    # (3) NEW in round 4
    "ql07c_features_parity",
    "qt10_nearest_error",
    "ql43_ann_recall",
    "ql44_split_leakage",
    "ql45_minhash_calibration",
    "qp05_export_manifest",
    "qs12_stream_temporal_dim",
    "ql46_dsir_importance",
    "ql47_perplexity_buckets",
    "ql48_bpe_pair_stats",
    "qp06_semdedup_report",
    "qs13_foreachbatch_upsert",
    "ql49_pagerank",
    "qr70_schema_evolution",
    "qr71_approx_quantile_gate",
    "qt11_seasonal_profile",
    "ql50_snapshot_novelty",
    "ql51_hard_negatives",
    "ql52_multimodal_ann",
    "qt12_funnel",
    "qr72_winsorized_stats",
    "qp07_training_mix",
    "ql53_vocab_diagnostics",
    "qt13_cohort_retention",
    "qs14_stream_cdc_apply",
    "ql54_containment_pairs",
    "qt14_transition_matrix",
    "qp08_canonical_map",
    # (4) CHANGED in round 4 (scatter-hash codebook init; DECIMAL epoch
    # budget; half-up tracker cents; cosine block cap) — fresh green rows
    # prove the Spark+oracle lockstep updates
    "ql03_cosine_topk",
    "ql09_ngram_jaccard",
    "ql14_ivf_topk",
    "ql38_kmeans_clusters",
    "ql39_pq_encode",
    "qp03_ivfpq_build_report",
    "ql40_epoch_plan",
    "qs11_stateful_tracker",
    "ql21_cosine_near_dup",
    "ql23_dedup_clusters",
    "ql37_duplicate_spans",
    "qp04_quality_dashboard",
    # (5) rotation: high-churn families — real streaming runs and
    # event-time readers (the fixture ts type has changed across rounds),
    # Python-boundary paths, then the least-recently-verified capstones
    "qs01_stream_ingest_counts",
    "qs02_tumbling_window",
    "qs02b_sliding_window",
    "qs03_session_window",
    "qs05_dedup_earliest",
    "qs06_stream_static_join",
    "qs07_update_mode",
    "qs10_interval_join",
    "qt01_asof_last_click",
    "qt02_range_join_errors",
    "qt04_gapfill_daily",
    "qt05_ohlc_bars",
    "qt06_resample_interpolate",
    "qt07_ewma_smoothing",
    "ql06_udf_norm_parity",
    "ql07_multimodal_envelope",
    "qp01_curation_report",
    "qp02_vector_index_report",
    "ql01_exact_dedup",
    "ql02_minhash_lsh_pairs",
    "ql10_lsh_ann_pairs",
    # --- ~window boundary (driver evaluates the first ~50) ---
    # rows-only spec (weaker check by design; pytest + ql07c twin cover it)
    "ql07b_multimodal_features",
    # overflow tail: verified green in r3, stable plain twins
    "qs04_watermarked_append",
    "qs08_stream_sessions",
    "qs09_chained_windows",
    "qt03_sessionize",
    "ql13_fingerprint",
    "qt08_rolling_anomaly",
    "qt09_time_weighted_avg",
    "qp04_quality_dashboard",
    "ql41_binary_header",
    "ql24_chunk_windows",
    "ql25_pii_redaction",
    "ql26_export_shards",
    "ql27_bigram_collocations",
    "ql28_quantization_error",
    "ql29_split_manifest",
    "ql31_repetition_metrics",
    "ql34_cluster_representatives",
    "qr45_window_value_fns",
    "qr46_disjunctive_join",
    "qr47_promo_share",
    "qr48_nation_volume",
    "qr49_except_all",
    "qr49_intersect_all",
    "qr50_expectations_orders",
    "qr51_grouping_sets",
    "qr52_variant_props",
    "qr53_small_quantity_revenue",
    "qr54_top_supplier",
    "qr55_empty_result",
    "qr56_inventory_drawdown",
    "qr57_try_arithmetic",
    "qr58_collated_grouping",
    "qr59_min_cost_supplier",
    "qr60_priority_lateness",
    "qr61_market_share",
    "qr62_product_profit",
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
