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
# prefix of this dict (50 entries in every round so far). Round-6 window
# policy (same shape as r5's):
# (1) queries whose execution path or oracle CHANGED in round 6 — the
#     ROUND tie-class retirement (FIXTURES.md §3: every similarity/ratio
#     score now goes through functions/rounding.py scaled_round on the
#     Spark side and the matching CAST(round(x*1e4) AS BIGINT)/1e4 in the
#     twin, edited in lockstep), the qv02 NULL-props coalesce, the ql10
#     derived-plane-count twin, and the qs15 checkpoint cadence — plus
#     the NEW qv09 produce→consume wire-loop round trip. A fresh green
#     row proves each lockstep update (and baptizes the new entry).
#     35 entries.
# (2) rotation, oldest-verified-first: the 13 entries whose latest driver
#     row is ROUND 1 (qr31–qr43), then the oldest of the r2-latest band
#     (qv01/qv03) to fill the 50-slot window; qv04 heads the overflow
#     tail.
# (3) the overflow tail continues the rotation order — the remaining
#     r2-latest entries (the untouched qv/ql/qs/qt bands below), so a
#     wider window or the r7 rotation picks them up next; then everything
#     verified in r3+. The full-registry sim (tools/driver_sim.py →
#     DRIVER_SIM_r6.txt) covers every entry regardless of the window.
# Latest-driver-row histogram going into r6: r1=13, r2=32, r3=43, r4=44,
# r5=50 (recomputed from CORRECTNESS_r01..r05 at round start).
_VERIFY_FIRST = (
    # (1) CHANGED in round 6 — ROUND tie-class retirement + ADVICE fixes
    "qv02_payload_parse",        # twin: coalesce(json_valid, FALSE) NULL symmetry
    "qv07_json_typed_parse",     # avg_k scaled_round
    "qv09_consume_roundtrip",    # NEW: sink spool → kinesis_replay → aggregate
    "ql03_cosine_topk",          # cosine_topk sim scaled (operator)
    "ql09_ngram_jaccard",        # jaccard scaled + threshold (operator)
    "ql10_lsh_ann_pairs",        # cos_sim scaled + twin derives plane count
    "ql14_ivf_topk",             # ivf_topk sim scaled (operator)
    "ql21_cosine_near_dup",      # cosine_near_dup_pairs sim scaled (operator)
    "ql23_dedup_clusters",       # edge threshold on scaled sim
    "ql34_cluster_representatives",  # quality_score scaled (via operator)
    "ql43_ann_recall",           # both sim paths + recall4 scaled
    "ql45_minhash_calibration",  # est/exact/err on the micro grid
    "ql51_hard_negatives",       # cosine_topk sim scaled
    "ql52_multimodal_ann",       # cosine_topk sim scaled
    "ql53_vocab_diagnostics",    # type/hapax ratios scaled
    "ql54_containment_pairs",    # containment scaled + threshold (operator)
    "ql27_bigram_collocations",  # lift scaled
    "ql30_decontamination",      # contamination ratio scaled + threshold
    "ql31_repetition_metrics",   # repetition ratios scaled + flag
    "ql37_duplicate_spans",      # dup_coverage scaled (operator)
    "qp04_quality_dashboard",    # q4/aggregate reads scaled
    "qp05_export_manifest",      # ql30-threshold reuse scaled
    "qp06_semdedup_report",      # cell-pair sim scaled
    "qp08_canonical_map",        # containment stage scaled
    "qt12_funnel",               # conversion ratio scaled
    "qt14_transition_matrix",    # p_transition scaled
    "qs15_stream_lsh_dedup",     # checkpoint cadence (output unchanged)
    # changed AND r2-band (rotation + lockstep in one slot):
    "ql04_text_stats",           # avg_tokens scaled
    "ql06_udf_norm_parity",      # l2_norm scaled
    "ql11_quality_features",     # all four ratios scaled (operator)
    "ql15_label_centroids",      # centroid_norm scaled
    "ql18_udaf_geo_mean",        # geo_mean scaled
    "ql22_tfidf_top_terms",      # tfidf score scaled
    "qp01_curation_report",      # quality_score + avg_quality scaled
    "qp02_vector_index_report",  # avg_dist scaled
    # (2) rotation: latest driver row is r1 (qr31–qr43)
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
    # ...then the oldest r2-latest entries up to the ~50 boundary
    "qv01_validate_required",
    "qv03_origin_stamp",
    # --- ~window boundary (35 changed/new + 13 r1 + 2 r2 = exactly 50) ---
    # (3) overflow tail: the remaining r2-latest band, oldest families
    # first, for the r7 rotation
    "qv04_ts_render",
    "qv05_envelope_json",
    "qv08_batch_wire_format",
    "ql01_exact_dedup",
    "ql02_minhash_lsh_pairs",
    "ql05_top_terms",
    "ql07_multimodal_envelope",
    "ql08_simhash",
    "ql12_language_id",
    "ql16_hash_sample",
    "ql17_stratified_sample",
    "ql20_udtf_tokenize",
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
