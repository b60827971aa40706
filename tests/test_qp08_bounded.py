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


@pytest.mark.parametrize("n_passes", [1, 3])
def test_bounded_equals_monolithic_sf0001(spark, n_passes):
    from streamsurfer_spark.queries.pipeline_q import (
        qp08_canonical_map,
        qp08_canonical_map_bounded,
    )

    mono = _rows(qp08_canonical_map(spark, SF_DIR))
    bounded = _rows(qp08_canonical_map_bounded(spark, SF_DIR, n_passes=n_passes))
    assert bounded == mono


def test_bounded_equals_monolithic_sf001(spark):
    from streamsurfer_spark.queries.pipeline_q import (
        qp08_canonical_map,
        qp08_canonical_map_bounded,
    )

    mono = _rows(qp08_canonical_map(spark, SF_DIR_MID))
    bounded = _rows(qp08_canonical_map_bounded(spark, SF_DIR_MID, n_passes=4))
    assert bounded == mono
