"""qp08's bounded-pass variant must be hash-identical to the monolithic
plan (round 11, r10 verdict item 4).

The bounded variant partitions the containment family's corpus-linear
shingle exchange into pmod(shingle, n_passes) slices, spooling pair /
set-size partials between passes — the single-box answer to the 1000×
disk-ceiling DNF recorded in BASELINE.md. Correctness rests on slice
self-containment (distinct, df-cap, and self-join are all shingle-keyed)
and partial-sum exactness (integer counts); these tests pin the
equality at two SFs and at two pass counts, including n_passes=1 (the
degenerate case that must equal the monolithic plan trivially) and a
pass count that does NOT divide the shingle space evenly.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

SF_DIR_MID = "/root/testdata/sf0.01"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def mono_sf0001(spark):
    # the monolithic reference is identical across this module's
    # sf0.001 comparisons — computing it once saves two full capstone
    # runs per suite pass (r11 verdict item 6) with zero coverage loss
    from streamsurfer_spark.queries.pipeline_q import qp08_canonical_map

    return _rows(qp08_canonical_map(spark, SF_DIR))


# n_passes=1 is NOT parametrized here: the derived-default test below
# resolves to exactly 1 pass at this SF, so the degenerate case runs
# through a strictly larger code path (the derivation aggregate + the
# 1-pass spool) every suite pass anyway (r11 verdict item 6)
def test_bounded_equals_monolithic_sf0001(spark, mono_sf0001):
    from streamsurfer_spark.queries.pipeline_q import (
        qp08_canonical_map_bounded,
    )

    bounded = _rows(qp08_canonical_map_bounded(spark, SF_DIR, n_passes=3))
    assert bounded == mono_sf0001


def test_bounded_equals_monolithic_sf001(spark):
    from streamsurfer_spark.queries.pipeline_q import (
        qp08_canonical_map,
        qp08_canonical_map_bounded,
    )

    mono = _rows(qp08_canonical_map(spark, SF_DIR_MID))
    bounded = _rows(qp08_canonical_map_bounded(spark, SF_DIR_MID, n_passes=4))
    assert bounded == mono


def test_bounded_derived_default_equals_monolithic(spark, mono_sf0001):
    """n_passes=None (the r12 default) derives the pass count from the
    corpus char volume and must reproduce the monolithic hashes — the
    no-human-in-the-loop contract of r11 verdict item 3."""
    from streamsurfer_spark.queries.pipeline_q import (
        qp08_canonical_map_bounded,
    )

    bounded = _rows(qp08_canonical_map_bounded(spark, SF_DIR))
    assert bounded == mono_sf0001


def test_derived_pass_count_rule():
    """The derivation rule itself: reproduces the r11 1000× green
    operating point (~2.3e9 chars → 8 passes at the 48 GB default
    budget), collapses to 1 at fixture scale, floors at 1 on an empty
    corpus, and scales inversely with the budget."""
    from streamsurfer_spark.queries.pipeline_q import derived_qp08_passes

    assert derived_qp08_passes(2_300_000_000, 48.0) == 8
    assert derived_qp08_passes(1_485_576, 48.0) == 1  # sf0.1 census
    assert derived_qp08_passes(0, 48.0) == 1
    # half the scratch → twice the passes (same estimated exchange)
    assert derived_qp08_passes(2_300_000_000, 24.0) == 16
