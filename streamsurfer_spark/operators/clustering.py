"""Distributed Lloyd's k-means over integer-quantized embeddings.

No counterpart in the reference (/root/reference/main.go:1-312 is an event
batching client — SURVEY §2.2); this is the clustering stage a training-data
pipeline runs for corpus bucketing / semantic dedup cohorts / IVF codebook
training (the proper replacement for similarity.py's modulus-sampled coarse
centroids).

Determinism contract: all distances and all per-cluster moments are EXACT
integer arithmetic on ×1000-quantized vectors (similarity.quantize); the
only float op per update is one floor(sum/count) per (cluster, dim) whose
operands are exact BIGINTs — IEEE division of exact ints is correctly
rounded, so new centroids are bit-identical across engines and partition
layouts. Init is the k smallest vec_ids (fixture ids are dense from 0), so
runs are reproducible with no RNG state.

Scale (100 TB, n vectors × d dims, k clusters):
- assign: reuses similarity.ivf_assign — k is a CONSTANT budget, the
  centroid table broadcasts, and the n×k candidate expansion collapses
  map-side via groupBy(vec_id).min_by before the only exchange (O(n) wire).
- update: posexplode to (cluster, dim) rows is a ×d fan-out, but the
  groupBy key space is k×d (tiny) → partial aggregation collapses almost
  everything map-side; the exchange moves ≤ partitions × k × d rows.
- iterations are a fixed small count (codebook training norm); each round
  is two shuffles, lineage stays flat because every round starts from the
  same cached quantized input.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from streamsurfer_spark.operators.similarity import ivf_assign, quantize

KMEANS_K = 8
KMEANS_ITERS = 2

_DIST = (
    "aggregate(zip_with(qv, cent_qv, (x, y) -> (x - y) * (x - y)),"
    " cast(0 as bigint), (acc, v) -> acc + v)"
)


def _update(assigned: DataFrame, id_col: str) -> DataFrame:
    """New centroids: per-(cluster, dim) floor-mean, reassembled to arrays.

    Element-wise mean via posexplode + two-level aggregate; the collect_list
    is per (cluster) over exactly d rows — bounded, and made deterministic
    by sorting on the dim field before projection.
    """
    dims = assigned.select(
        "cent_id", F.posexplode("qv").alias("dim", "x")
    )
    per_dim = dims.groupBy("cent_id", "dim").agg(
        F.floor(F.sum("x") / F.count("*")).cast("bigint").alias("cx")
    )
    return (
        per_dim.groupBy("cent_id")
        .agg(F.collect_list(F.struct("dim", "cx")).alias("_parts"))
        .select(
            F.col("cent_id").alias(id_col),
            F.expr("transform(array_sort(_parts), s -> s.cx)").alias("qv"),
        )
    )


def kmeans_report(
    df: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run `iters` Lloyd iterations; return per-cluster (size, exact SSE).

    Clusters that lose all members simply drop out of the report (standard
    Lloyd behavior without re-seeding — deterministic on both engines).
    """
    q = quantize(df, vec_col).select(id_col, "qv")
    cents = q.where(F.col(id_col) < k)
    assigned = None
    for _ in range(iters):
        if assigned is not None:
            cents = _update(assigned, id_col)
        assigned = ivf_assign(q, cents, id_col=id_col)
    final_cents = cents.select(
        F.col(id_col).alias("cent_id"), F.col("qv").alias("cent_qv")
    )
    return (
        assigned.join(F.broadcast(final_cents), "cent_id")
        .withColumn("dist", F.expr(_DIST))
        .groupBy("cent_id")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("dist").alias("sse"),
            F.min(id_col).alias("exemplar_id"),
        )
        .orderBy("cent_id")
    )
