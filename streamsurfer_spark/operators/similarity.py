"""Similarity search over embedding columns (SURVEY §2.3 D, Q-L3).

No counterpart in the reference (/root/reference/main.go:1-312 has no vector
or similarity logic — SURVEY §2.2); engine-side capability for the 100 TB
north star.

Two tiers, as the task demands:

- **Brute-force cosine top-k** (the correctness baseline): probes × corpus
  dot products as pure column expressions (zip_with + aggregate — JVM
  codegen, no Python). The probe side is broadcast, so the corpus scan
  never shuffles; per-probe top-k is a window over a key with bounded
  cardinality. Exact, O(|probes|·n) — fine when probes are few.

- **Random-hyperplane LSH buckets** (the scale path): r seeded integer
  hyperplanes → sign bits → 2^r buckets; near-dup / ANN search only joins
  within a bucket, turning O(n²) into O(Σ bucket²). Plane weights derive
  from the portable md5 hash so the DuckDB oracle reproduces them exactly.

Scale notes: both paths are shuffle-minimal — brute force shuffles only for
the final top-k window (keyed by probe id); LSH shuffles on uniform bucket
ids. Skewed buckets (mass near a hyperplane) are handled by AQE skew-join
at runtime; at 100 TB add a second independent plane set and intersect
candidates to cap bucket size.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from streamsurfer_spark.functions.hashing import md5_long64_py

N_PLANES = 8
DIM = 64

DOT_EXPR = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " cast(0.0 as double), (acc, v) -> acc + v)"
)
NORM_EXPR = (
    "sqrt(aggregate(transform({a}, x -> cast(x as double) * cast(x as double)),"
    " cast(0.0 as double), (acc, v) -> acc + v))"
)


def plane_weights(n_planes: int = N_PLANES, dim: int = DIM) -> list[list[int]]:
    """Deterministic integer hyperplane weights in [-1000, 1000].

    Derived from the portable md5 hash of 'plane:p:d' so Spark, DuckDB, and
    Python all reproduce the identical planes (no RNG state to ship).
    """
    return [
        [md5_long64_py(f"plane:{p}:{d}") % 2001 - 1000 for d in range(dim)]
        for p in range(n_planes)
    ]


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per probe: (probe_id, vec_id, sim, rk).

    probes is broadcast (it is small by contract) → the corpus-side scan is
    shuffle-free; the only shuffle is the per-probe top-k window, keyed on
    probe_id. Ties broken by neighbor id on the ROUNDED similarity so
    ranking is reproducible across engines.
    """
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    joined = corpus.join(F.broadcast(p), F.col(id_col) != F.col("probe_id"))
    dot = F.expr(DOT_EXPR.format(a="probe_vec", b=vec_col))
    norms = F.expr(NORM_EXPR.format(a="probe_vec")) * F.expr(NORM_EXPR.format(a=vec_col))
    sims = joined.select(
        "probe_id",
        F.col(id_col),
        F.round(dot / norms, 4).alias("sim"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.col(id_col))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("probe_id", id_col, "sim", "rk")
    )


@pandas_udf(DoubleType())
def l2_norm_udf(emb: pd.Series) -> pd.Series:
    """Vectorized L2 norm — the Q-L6 pandas_udf surface.

    Arrow hands each batch as a Series of numpy arrays; summing per row in
    float64 matches the built-in `aggregate` expression bit-for-bit at
    fixture dims (both accumulate in IEEE double).
    """
    import numpy as np

    return emb.map(
        lambda v: float(np.sqrt(np.add.reduce(np.asarray(v, dtype="float64") ** 2)))
    )


def lsh_buckets(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Assign each vector a 2^N_PLANES-way LSH bucket: (id, vec, bucket).

    Per-row expression only — the bucket id is computed inside codegen, no
    shuffle, no Python. sign(dot(plane, v)) per plane → bit → packed int.
    """
    bits = []
    for p, weights in enumerate(plane_weights()):
        arr = f"array({', '.join(str(w) for w in weights)})"
        dot = DOT_EXPR.format(a=arr, b=vec_col)
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return df.select(
        F.col(id_col), F.col(vec_col), F.expr(" + ".join(bits)).alias("bucket")
    )


def lsh_near_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate near-duplicate pairs: same LSH bucket AND cosine ≥ t.

    The self-join is keyed on the bucket id (uniform by construction), so
    the shuffle is balanced; cosine is verified exactly inside the bucket.
    """
    b = lsh_buckets(df, vec_col, id_col)
    a, c = b.alias("a"), b.alias("b")
    dot = F.expr(DOT_EXPR.format(a=f"a.{vec_col}", b=f"b.{vec_col}"))
    norms = F.expr(NORM_EXPR.format(a=f"a.{vec_col}")) * F.expr(
        NORM_EXPR.format(a=f"b.{vec_col}")
    )
    return (
        a.join(
            c,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(dot / norms, 4).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
