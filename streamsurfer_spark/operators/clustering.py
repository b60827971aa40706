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
layouts. Init is hash-scattered but RNG-free: the k rows with the smallest
(id × 2654435761) mod 2^32 multiplicative scatter (id tiebreak), so seeds
are spread across the id space even when ingest is sorted/homogeneous at
the head, and the same k rows are chosen by any engine from pure integer
arithmetic (exact for id < 2^63 / 2654435761 ≈ 3.4e9; shard the id space
before seeding above that).

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

from streamsurfer_spark.operators.similarity import (
    DIST_SQ_EXPR,
    ivf_assign,
    quantize,
)

KMEANS_K = 8
KMEANS_ITERS = 2

PQ_SUBSPACES = 8
PQ_CODEWORDS = 8


# Knuth's 2^32 golden-ratio multiplier: (id * SEED_SCATTER) % 2^32 is a
# bijective scatter of any 32-bit id range, so "k smallest scatter values"
# picks k pseudo-uniform rows deterministically — no RNG state, and the
# DuckDB oracle reproduces the exact same k rows with the same two integer
# ops. BIGINT product stays exact for id < 2^63 / SEED_SCATTER ≈ 3.4e9.
SEED_SCATTER = 2654435761


def seed_rows(q: DataFrame, k: int, id_col: str = "vec_id") -> DataFrame:
    """The k seed rows for codebook init: smallest scatter-hash, id tiebreak.

    orderBy().limit(k) compiles to TakeOrderedAndProject — a per-partition
    k-row heap merged at the driver, NOT a global sort — so seeding a
    1e9-row corpus moves k rows over the wire, no full-table exchange.
    """
    return (
        q.withColumn("_sc", F.expr(f"({id_col} * {SEED_SCATTER}) % 4294967296"))
        .orderBy("_sc", id_col)
        .limit(k)
        .drop("_sc")
    )


def _sub_slices(m: int) -> str:
    """SQL expr: split qv into m subvectors of floor(d/m) dims; the LAST
    subspace absorbs the d % m remainder so no trailing dimension is
    silently dropped from codes or recon_sse when d is not divisible by m
    (identical to the plain slicing whenever d % m == 0)."""
    w = f"(size(qv) div {m})"
    return (
        f"transform(sequence(0, {m - 1}), s -> slice(qv, s * {w} + 1,"
        f" if(s = {m - 1}, size(qv) - {m - 1} * {w}, {w})))"
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


def pq_encode_quantized(
    q: DataFrame,
    m: int = PQ_SUBSPACES,
    k: int = PQ_CODEWORDS,
    id_col: str = "vec_id",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """pq_encode over an already-quantized (id, qv) frame — the reusable
    core, so IVF-PQ can feed it RESIDUAL vectors (see queries/pipeline_q
    qp03). Same contract and scale shape as pq_encode.

    ``carry`` names q-columns functionally dependent on the id (e.g. the
    vector's cent_id) to keep through both aggregations — they ride the
    group keys, whose groups the unique id already determines, so results
    are unchanged while the caller skips a corpus-sized re-join on the id
    to recover them (the qp03 r13 fix, guide §2.4)."""
    subs = q.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.posexplode(F.expr(_sub_slices(m))).alias("sub", "sv"),
    )
    cb = seed_rows(q.select(id_col, "qv"), k, id_col).select(
        F.col(id_col).alias("code_id"),
        F.posexplode(F.expr(_sub_slices(m))).alias("sub", "cw"),
    )
    dist = F.expr(DIST_SQ_EXPR.format(a="sv", b="cw"))
    scored = subs.join(F.broadcast(cb), "sub").withColumn("dist", dist)
    best = scored.groupBy(id_col, *carry, "sub").agg(
        F.min_by(
            F.struct(F.col("code_id"), F.col("dist")),
            F.struct(F.col("dist"), F.col("code_id")),
        ).alias("_best")
    )
    return (
        best.groupBy(id_col, *carry)
        .agg(
            F.collect_list(
                F.struct(F.col("sub"), F.col("_best.code_id").alias("code_id"))
            ).alias("_codes"),
            F.sum("_best.dist").alias("recon_sse"),
        )
        .select(
            id_col,
            *[F.col(c) for c in carry],
            F.expr(
                "concat_ws(',', transform(array_sort(_codes), c -> cast(c.code_id as string)))"
            ).alias("pq_code"),
            "recon_sse",
        )
    )


def pq_encode(
    df: DataFrame,
    m: int = PQ_SUBSPACES,
    k: int = PQ_CODEWORDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization encode: split each ×1000-quantized vector into
    `m` subspaces, assign each subvector its nearest of `k` codewords
    (exact integer L2²), emit the m-digit code + exact reconstruction SSE.

    The codebook is the scatter-hash-seeded `k` vectors' subvectors
    (seed_rows — deterministic, no RNG, robust to a homogeneous id-space
    head; production would feed kmeans_report per subspace — the assign
    machinery is identical). PQ is the memory side of ANN at scale: a
    64-dim float vector (256 B) compresses to m bytes, so a 1e9-vector
    index fits executor memory for re-rank.

    Distributed shape (100 TB): the exploded (vector, subspace) table is a
    ×m row fan-out of pure codegen slices; the codebook (m×k rows) joins
    as a broadcast keyed on the subspace id — NO shuffle to score; the
    per-(vec, sub) argmin is a partial-aggregating min_by groupBy, and the
    final per-vector reassembly groups on the prefix-compatible vec key.
    Nothing in the plan grows with corpus size except the linear row count.
    """
    q = quantize(df, vec_col).select(id_col, "qv")
    return pq_encode_quantized(q, m, k, id_col)


def kmeans_fit(
    df: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    carry: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Run `iters` Lloyd iterations; return (assignments, centroids, cached).

    assignments: the quantized input plus its final `cent_id`;
    centroids: the final (id, qv) centroid table (≤ k rows, broadcastable);
    cached: the persisted quantized input — call ``cached.unpersist()``
    once the assignment/centroid results are materialized.

    ``carry`` names input columns to keep alongside (id, qv) through the
    cache and into the returned assignments. The assign is map-only and
    ivf_assign passes every input column through, so carrying is free on
    the wire — while re-joining the corpus on the id afterward to recover
    e.g. the raw embedding costs a corpus-sized self-join (the qp06 r13
    fix, guide §2.4). The intermediate rounds never read the carried
    columns: the persisted frame is columnar (InMemoryTableScan prunes
    columns), so seeding/update iterations scan only (id, qv); the cost is
    cache residency for the extra columns.

    The quantized input is persisted (MEMORY_AND_DISK): every round —
    seeding, each assign, each update — re-references it, and without the
    cache each action re-scans and re-quantizes the corpus once per
    reference (the docstring's scale contract promised the cache; the
    code previously omitted it — r7 review). Safe against the documented
    persist-hides-AQE-stats trap because every join in the loop is an
    EXPLICIT F.broadcast (ivf_assign). The cache handle is RETURNED (r8
    advice): "unpersist via the returned frames' lineage" is not a real
    DataFrame API, so callers looping over many fits previously
    accumulated MEMORY_AND_DISK entries with no supported release path.
    One-shot callers (the registry queries) may ignore it — the cache
    dies with the session.
    """
    q = quantize(df, vec_col).select(id_col, "qv", *carry).persist()
    # seeds must stay (id, qv) regardless of carry: callers consume the
    # returned centroid table with that exact schema (and with iters >= 2
    # the returned cents are _update output, which is (id, qv) anyway)
    cents = seed_rows(q, k, id_col).select(id_col, "qv")
    assigned = None
    for it in range(iters):
        if assigned is not None:
            cents = _update(assigned, id_col)
        # final round carries the winning distance out — kmeans_report's
        # SSE needs exactly this value and previously re-joined centroids
        # and recomputed every distance to get it back (r7 review)
        assigned = ivf_assign(
            q, cents, id_col=id_col, keep_dist=(it == iters - 1)
        )
    return assigned, cents, q


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
    assigned, _cents, _cached = kmeans_fit(df, k, iters, id_col, vec_col)
    # the final assign carries each vector's winning distance (keep_dist),
    # so SSE aggregates directly — no centroid re-join, no second O(n·d)
    # distance pass (r7 review)
    return (
        assigned.groupBy("cent_id")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("dist").alias("sse"),
            F.min(id_col).alias("exemplar_id"),
        )
        .orderBy("cent_id")
    )
