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
# prefix of this dict (~50 entries). Front of the line, in order:
# (1) queries fixed this round (need a fresh green row to prove the fix),
# (2) queries with no driver verification in ANY previous round
#     (rounds 1-2 covered qr01..qr50-era relational + qv/qs/qt/qp/ql01-23),
# (3) high-churn event-time queries worth re-verifying, then everything else.
# 58 entries have no green driver row yet but the window is ~50 — the
# overflow (the tail below) is deliberately the LOWEST-risk group: the
# round-2 TPC-H completion pack, plain SQL twins whose shapes the driver
# already verified eleven times over in rounds 1-2. Every novel execution
# path (stateful stream, iterative k-means, PQ, binary codec, RRF fusion)
# sits inside the window.
_VERIFY_FIRST = (
    # fixed in round 3 (ts-type adaptivity + oracle HUGEINT cast)
    "qs04_watermarked_append",
    "qs08_stream_sessions",
    "qs09_chained_windows",
    "qt03_sessionize",
    "ql13_fingerprint",
    # new operators this round — highest verification value first
    "qt08_rolling_anomaly",
    "qt09_time_weighted_avg",
    "ql36_unigram_surprisal",
    "ql37_duplicate_spans",
    "ql38_kmeans_clusters",
    "qs10_interval_join",
    "ql39_pq_encode",
    "qp03_ivfpq_build_report",
    "ql40_epoch_plan",
    "qs11_stateful_tracker",
    "qp04_quality_dashboard",
    "ql41_binary_header",
    "ql42_hybrid_rrf",
    # never driver-verified before round 3 (rounds 1-2 windows missed them)
    "ql24_chunk_windows",
    "ql25_pii_redaction",
    "ql26_export_shards",
    "ql27_bigram_collocations",
    "ql28_quantization_error",
    "ql29_split_manifest",
    "ql30_decontamination",
    "ql31_repetition_metrics",
    "ql32_bm25_topk",
    "ql33_sequence_packing",
    "ql34_cluster_representatives",
    "ql35_domain_mixture",
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
    # rows-only spec (weaker check by design; pytest-covered)
    "ql07b_multimodal_features",
    # overflow tail: TPC-H completion pack — plain SQL twins, lowest risk,
    # first in line for the round-4 window
    "qr59_min_cost_supplier",
    "qr60_priority_lateness",
    "qr61_market_share",
    "qr62_product_profit",
    "qr63_returned_items",
    "qr64_important_parts",
    "qr65_shipping_speed",
    "qr66_customer_distribution",
    "qr67_supplier_part_counts",
    "qr68_promotable_suppliers",
    "qr69_waiting_suppliers",
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
