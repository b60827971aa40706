"""Partitioning-invariance sweep (round 5).

The repo's canonicalization discipline (FIXTURES.md §3) claims results are
independent of physical execution: money in scaled int64, transcendentals
rounded to integer micro-units before aggregation, integer div, discrete
percentiles. The number of shuffle partitions changes reduce-side
accumulation ORDER — exactly the thing float sums are sensitive to — so
running the same query under different shuffle.partitions and comparing
canonicalized rows is a direct falsifier: any hidden
aggregation-order-sensitive float path shows up as a mismatch.

Representative set: one query per exactness mechanism (scaled-int money
aggregate, micro-nat ln sums, DECIMAL(38,0) moments, integer-div
PageRank, DECIMAL epoch budget, a 4-stage capstone composition, and the
adaptive-LSH pair path whose bucketing must not depend on layout).
"""

from __future__ import annotations

import pytest

from streamsurfer_spark.queries import registry
from tests.conftest import SF_DIR, canonicalize

CASES = (
    "qr06_hash_agg_q1",        # scaled-int64 money aggregates
    "ql36_unigram_surprisal",  # ln() → integer micro-nats → BIGINT sums
    "qt11_seasonal_profile",   # DECIMAL(38,0) second moments
    "ql49_pagerank",           # integer-div contribution sums
    "ql40_epoch_plan",         # DECIMAL(38,0) budget products
    "ql10_lsh_ann_pairs",      # corpus-derived plane count + bucket cap
    "qp07_training_mix",       # 4-stage composition of the above
    # r9 additions — one per r8-continuation exactness mechanism:
    "ql62_label_silhouette",   # BIGINT diffs → DECIMAL(38,0) square-sums
    "ql66_source_minhash_jaccard",  # mergeable per-source min sketch
    "qt21_rolling_median",     # discrete percentile over a window frame
    "qt16_psi_drift",          # PSI in integer micro-nat terms
    "ql58_char_entropy",       # per-char micro-nat entropy sums
)


@pytest.mark.parametrize("name", CASES)
def test_result_invariant_under_shuffle_partitioning(spark, name):
    spec = registry()[name]

    def canon(n_parts: int):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
        try:
            df = spec.spark(spark, SF_DIR)
            return canonicalize(df.columns, [tuple(r) for r in df.collect()])
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    cols_a, rows_a = canon(3)
    cols_b, rows_b = canon(13)
    assert cols_a == cols_b
    assert rows_a == rows_b, (
        f"{name}: result depends on shuffle partitioning — an "
        "aggregation-order-sensitive float path escaped the exact-int "
        "discipline"
    )
