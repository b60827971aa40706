"""Edge-semantics tests for connected components (operators/graph.py).

The oracle suite (ql23) proves parity with DuckDB's recursive-CTE
transitive closure on fixture data; these pin convergence behavior on
crafted graph shapes.
"""

from __future__ import annotations

import pytest

from streamsurfer_spark.operators.graph import connected_components


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, **kw)
    return {r.id: r.cluster_id for r in out.collect()}


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_longer_than_checkpoint_interval(spark):
    # a 9-node path: min label must walk the whole chain (8 hops > the
    # localCheckpoint interval of 5), covering the lineage-truncation path
    edges = [(i, i + 1) for i in range(1, 9)]
    got = _cc(spark, edges)
    assert got == {i: 1 for i in range(1, 10)}


def test_direction_does_not_matter(spark):
    # label flows against edge direction too (undirected semantics)
    got = _cc(spark, [(5, 1), (5, 9)])
    assert got == {1: 1, 5: 1, 9: 1}


def test_max_iter_exceeded_raises(spark):
    edges = [(i, i + 1) for i in range(1, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2)
