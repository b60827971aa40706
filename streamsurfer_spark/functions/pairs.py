"""Grouped upper-triangle pair expansion — the single-evaluation form of
the capped self-join (r13 optimization, guide §2.4).

Every candidate-pair family in the engine (MinHash-LSH buckets, SimHash
bands, cosine blocks, shingle inverted index) shares one shape: cap the
group membership with a row_number window, then emit all unordered member
pairs per group. The original form self-joined the capped frame on the
group key — correct, but Spark plans NO common-subtree reuse across join
sides, so the entire input pipeline (scan → hashing/signature/assign math
→ cap window) evaluated TWICE per pair stage, and persisting the capped
frame instead hides its stats from AQE (measured 3× regression on the
broadcast-argmin paths in r10 — the documented trap).

``grouped_pair_expand`` evaluates the input ONCE: the group's capped
members are collected into one sorted array and expanded with two chained
explodes. The groupBy reuses the cap window's hash partitioning on the
group key (ClusteredDistribution is satisfied — zero added Exchange), the
collect_list is bounded by the SAME membership cap that already bounds
the join's quadratic blow-up, and the two-step explode keeps every
intermediate array at group size (a single flatten of all pairs would
materialize cap²/2 structs in one value — at cap 1000 with embedded
vectors that is hundreds of MB in one row).

Join-parity notes (each pinned by the family's oracle twins and unit
tests):

- rows whose group key is NULL are dropped first — an equi-join key
  never matches NULL, so the join form never paired them;
- pairs are filtered to strictly increasing first-member-column, exactly
  the join's ``a.id < b.id`` predicate (struct ordering sorts by the
  first field; on a pathological duplicate-id input the filter drops the
  equal-id pair just as the join did);
- array_sort makes the pair orientation deterministic regardless of
  collect_list's arrival order (task retries, AQE variance).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def grouped_pair_expand(
    df: DataFrame,
    keys: list[str],
    member_cols: list[str],
    a_name: str = "_pa",
    b_name: str = "_pb",
) -> DataFrame:
    """All unordered member pairs within each ``keys`` group, one row per
    pair, as two struct columns ``a_name``/``b_name`` carrying
    ``member_cols`` (a < b by the first member column, which must be the
    group-unique id).

    The input must already be membership-capped (the caller's cap window)
    — the per-group array is bounded by that cap.

    The helper binds internal columns ``_ms``/``_i`` plus the two output
    struct names; a caller whose frame already carries one of those names
    would silently mis-bind (r13 ADVICE), so they are asserted absent.
    """
    reserved = {"_ms", "_i", a_name, b_name}
    clash = reserved.intersection(df.columns)
    if clash:
        raise ValueError(
            f"grouped_pair_expand: input columns collide with reserved "
            f"names {sorted(clash)}; rename them or pass different "
            f"a_name/b_name"
        )
    filt = df
    for k in keys:
        filt = filt.where(F.col(k).isNotNull())
    members = filt.groupBy(*keys).agg(
        F.array_sort(
            F.collect_list(F.struct(*[F.col(c) for c in member_cols]))
        ).alias("_ms")
    )
    step1 = members.select(
        F.col("_ms"), F.posexplode("_ms").alias("_i", a_name)
    )
    return step1.select(
        F.col(a_name),
        F.explode(F.expr("slice(_ms, _i + 2, size(_ms))")).alias(b_name),
    ).where(
        F.col(f"{a_name}.{member_cols[0]}") < F.col(f"{b_name}.{member_cols[0]}")
    )
