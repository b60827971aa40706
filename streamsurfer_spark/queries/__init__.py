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
# prefix of this dict (~50 entries). Round-5 window policy (per the r4
# verdict: "spend the round-5 window on rotation, not growth"):
# (1) queries whose execution path or oracle CHANGED in round 5 (LSH
#     bucket cap + plane-DIM guard + twin cap replication, cosine twin
#     caps, qt12 coalesce, scratch-dir lifecycle, qp07b manifest variant)
#     — a fresh green row proves each Spark+oracle lockstep update,
# (2) rotation, oldest-verified-first: entries whose latest driver row
#     is ROUND 1 (the qr01-qr33 band) fill the remaining 38 slots,
# (3) the overflow tail continues the rotation order — remaining r1
#     entries, then the 38 r2-latest entries (qv/ql/qs/qt bands), so a
#     wider window or the r6 rotation picks them up next, then everything
#     verified in r3/r4.
# Latest-driver-row histogram going into r5: r1=49, r2=38, r3=43, r4=50.
_VERIFY_FIRST = (
    # (1) CHANGED in round 5
    "ql10_lsh_ann_pairs",       # LSH_ANN_BUCKET_CAP + dim guard + capped twin
    "ql21_cosine_near_dup",     # twin now replicates COSINE_BLOCK_CAP
    "qp06_semdedup_report",     # twin now replicates COSINE_BLOCK_CAP
    "qt12_funnel",              # NULL-sum coalesce on empty funnel stage
    "qp07b_training_mix_manifest",  # NEW: checkpointed-manifest qp07 variant
    "qr70_schema_evolution",    # scratch-dir lifecycle
    "qs07_update_mode",         # scratch-dir lifecycle
    "qs13_foreachbatch_upsert", # scratch-dir lifecycle
    "qs14_stream_cdc_apply",    # scratch-dir lifecycle
    "qs15_stream_lsh_dedup",    # NEW: incremental LSH dedup stream (stretch)
    "qr44_profile_orders",      # profile emits all-zero rows on empty input
    "ql19_grouped_map_zscore",  # twin: degenerate-group zscore CASE
    "qv06_json_extract",        # try_cast payload extraction (fuzz find)
    "qv02_payload_parse",       # try_parse_json validity + typed-k guard
    "qv07_json_typed_parse",    # json_type-guarded twin (fuzz find)
    # (2) rotation, oldest-verified-first: latest driver row is r1
    "qr01_scan_checksum",
    "qr02_filter_agg",
    "qr03_join_orders_customer",
    "qr04_multiway_join",
    "qr05_anti_join",
    "qr05_left_join_histogram",
    "qr05_semi_join",
    "qr06_hash_agg_q1",
    "qr07_count_distinct",
    "qr09_rollup",
    "qr09b_cube",
    "qr10_window_rank",
    "qr10b_window_analytics",
    "qr11_window_running",
    "qr12_topk",
    "qr13_except",
    "qr13_intersect",
    "qr13_union",
    "qr14_string_fns",
    "qr15_date_fns",
    "qr16_math_decimal",
    "qr17_array_fns",
    "qr18_subqueries",
    "qr19_case_when",
    "qr20_pivot",
    "qr21_percentiles",
    "qr22_histogram",
    "qr23_levenshtein_pairs",
    "qr24_bit_and_array_ops",
    "qr25_full_outer_join",
    "qr26_stats_pack",
    "qr27_string_agg",
    "qr28_filtered_agg",
    "qr29_range_frame",
    "qr30_arg_extrema",
    # --- ~window boundary (driver evaluates the first ~50; the 15
    # round-5-changed entries above + qr01-qr30 = exactly 50) ---
    # (3) overflow tail: remaining r1-latest entries first...
    "qr31_null_semantics",
    "qr32_unpivot",
    "qr33_posexplode",
    "qr34_timezone_pack",
    "qr35_lambda_pack",
    "qr36_lateral_topk",
    "qr37_salted_join",
    "qr38_shipping_priority",
    "qr39_large_volume_customers",
    "qr40_scd2_intervals",
    "qr41_dormant_customers",
    "qr42_upsert_snapshot",
    "qr43_cdc_apply",
    # ...then the r2-latest band (oldest families first)
    "qv01_validate_required",
    "qv03_origin_stamp",
    "qv04_ts_render",
    "qv05_envelope_json",
    "qv08_batch_wire_format",
    "ql01_exact_dedup",
    "ql02_minhash_lsh_pairs",
    "ql04_text_stats",
    "ql05_top_terms",
    "ql06_udf_norm_parity",
    "ql07_multimodal_envelope",
    "ql08_simhash",
    "ql11_quality_features",
    "ql12_language_id",
    "ql15_label_centroids",
    "ql16_hash_sample",
    "ql17_stratified_sample",
    "ql18_udaf_geo_mean",
    "ql20_udtf_tokenize",
    "ql22_tfidf_top_terms",
    "qp01_curation_report",
    "qp02_vector_index_report",
    "qs02b_sliding_window",
    "qs03_session_window",
    "qs05_dedup_earliest",
    "qs06_stream_static_join",
    "qt01_asof_last_click",
    "qt02_range_join_errors",
    "qt04_gapfill_daily",
    "qt05_ohlc_bars",
    "qt06_resample_interpolate",
    "qt07_ewma_smoothing",
    # rows-only spec (weaker check by design; pytest + ql07c twin cover it)
    "ql07b_multimodal_features",
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
