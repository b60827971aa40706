"""As-of and range joins — time-series operators Spark lacks natively.

No reference counterpart (/root/reference/main.go:1-312 never holds two
datasets — SURVEY §2.2). Composed from built-in operators per the engine's
custom-operator policy (SURVEY §2.3 note: composition first, Pandas UDF
second, mapPartitions last):

- **as-of join**: "for each left row, the latest right row with the same
  key at-or-before its timestamp". The naive formulation is an inequality
  join (quadratic blow-up per key); the distributed shape used here is the
  union-sort trick: tag both sides, union, sort by (key, time, side), and
  carry the last right-side payload forward with last_value(ignorenulls)
  — one shuffle on the key, linear work, no range explosion. This is the
  standard large-scale as-of topology (same shape kdb/Flink temporal joins
  lower to).

- **range join**: "pairs within a bounded time distance". Equi-bucketing
  the time axis turns the inequality into an equi-join on (key, bucket):
  each left row probes its own and adjacent buckets, then an exact filter
  trims overshoot. Bucket width = the range bound, so each row lands in
  ≤2 candidate buckets per side and the shuffle stays keyed/uniform. AQE
  skew-split handles hot buckets.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload: list[str],
) -> DataFrame:
    """Left as-of join: latest right row per key with right_time <= left_time.

    Returns all left columns plus `payload` columns from the right side
    (null when no right row precedes the left row). Ties on equal
    timestamps resolve to the right row (sort places right rows first).

    The payload is carried as ONE struct per right row (the asof_nearest
    pattern), not per-column: carrying each column independently with
    last(ignorenulls) skips a genuinely-NULL field in the latest right
    row back to a STALE older row's value, and a multi-column payload
    could mix fields from different right rows (r7 review).
    """
    lt = F.col(left_time)
    r_struct = F.struct(*[F.col(c) for c in payload])
    r_type = right.select(r_struct.alias("_r")).schema["_r"].dataType
    l_tag = left.select(
        F.col(key).alias("_k"),
        lt.alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(r_type).alias("_r"),
    )
    # SQL asof semantics on the right side (r8 area review): a NULL
    # right_time can never satisfy l.t >= r.t — but NULLS-FIRST ordering
    # would park such a row at the partition HEAD with a non-NULL
    # payload struct, and last(ignorenulls) would carry it into every
    # left row before the first real right row (a phantom match where
    # the DuckDB ASOF twin yields NULL). A NULL key likewise matches
    # nothing under equality-join semantics (Window.partitionBy would
    # group the NULL keys into one matchable partition); left NULL-key
    # rows still surface with a NULL payload, as a left join would.
    r_tag = right.where(
        F.col(right_time).isNotNull() & F.col(key).isNotNull()
    ).select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        r_struct.alias("_r"),
    )
    # right rows sort before left rows at equal (_k, _t): an order placed
    # exactly at the event time IS visible to the event
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "_side",
        "_l",
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    return carried.where(F.col("_side") == 1).select(
        "_l.*", *[F.col(f"_r.{c}").alias(c) for c in payload]
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    lower_seconds: int,
    upper_seconds: int,
) -> DataFrame:
    """Inner join on key where right_time ∈ [left_time + lower, left_time + upper].

    Buckets the right side by the window span so the candidate join is an
    equi-join on (key, bucket); the exact predicate filters afterwards.
    Returns all columns from both sides.
    """
    span = upper_seconds - lower_seconds
    if span <= 0:
        raise ValueError("upper_seconds must exceed lower_seconds")
    l_sec = F.unix_timestamp(F.col(left_time))
    r_sec = F.unix_timestamp(F.col(right_time))
    # left row's window [l+lower, l+upper] overlaps buckets b0 and b0+1
    b0 = F.floor((l_sec + lower_seconds) / span)
    l_b = left.withColumn("_b", F.explode(F.array(b0, b0 + 1)))
    r_b = right.withColumn("_b", F.floor(r_sec / span))
    # the EXACT filter compares full-precision timestamps via INTERVAL
    # arithmetic — unix_timestamp() truncates to whole seconds, which made
    # the bound wrong by up to ~1 s for sub-second event times and broke
    # parity with the exact-semantics oracle and the streaming
    # interval_join (r7 review). The truncated-second BUCKETS still cover
    # the exact window: truncation moves values down by < 1 s, and the
    # window end r ≤ l+upper gives r_sec ≤ l_sec+upper, landing every
    # true match in b0 or b0+1.
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("l._b") == F.col("r._b"))
        & (
            F.col(f"r.{right_time}")
            >= F.col(f"l.{left_time}") + F.expr(f"INTERVAL {lower_seconds} SECOND")
        )
        & (
            F.col(f"r.{right_time}")
            <= F.col(f"l.{left_time}") + F.expr(f"INTERVAL {upper_seconds} SECOND")
        )
    )
    joined = l_b.alias("l").join(r_b.alias("r"), cond)
    l_cols = [F.col(f"l.{c}") for c in left.columns]
    r_cols = [F.col(f"r.{c}") for c in right.columns if c != key]
    return joined.select(*l_cols, *r_cols)


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    tolerance_seconds: int,
) -> DataFrame:
    """Nearest-event join: for each left row, the right row of the same key
    whose time is CLOSEST to the left time, within ±tolerance (kdb `aj`'s
    bidirectional cousin; pandas merge_asof(direction="nearest")).

    Returns all left columns plus `payload`, `direction` ('prev'/'next',
    null when nothing lies within tolerance) and `diff_us` (microseconds,
    always ≥ 0). A tie between an earlier and a later right row at equal
    distance resolves to the earlier one; a right row exactly at the left
    time is a 'prev' match at distance 0.

    Contract: `right` must be unique per (key, right_time) — pre-dedup
    (e.g. min event id per timestamp, as qt10 does) so "nearest" is
    well-defined identically on every engine.

    Distributed shape: the same union-sort topology as ``asof_join`` — ONE
    shuffle on the key, then two frame variants (backward last_value /
    forward first_value) of the SAME window sort, which Spark executes in
    a single Window operator because partitioning and ordering coincide.
    No inequality join, no per-key candidate explosion: the tolerance test
    runs on exactly two carried candidates per left row. timestampdiff is
    used for the distance so TIMESTAMP and TIMESTAMP_NTZ event times both
    work (fixture parquet has shipped both physical types across rounds).
    """
    r_struct = F.struct(
        F.col(right_time).alias("_rt"), *[F.col(c) for c in payload]
    )
    r_type = right.select(r_struct.alias("_r")).schema["_r"].dataType
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(r_type).alias("_r"),
    )
    l_type = l_tag.schema["_l"].dataType
    # same NULL-time/NULL-key right-side filter as asof_join (a NULL _rt
    # candidate was incidentally nulled by the timestampdiff distance,
    # but the NULL-key partition would still phantom-match — and an
    # explicit filter beats relying on a downstream NULL propagation)
    r_tag = right.where(
        F.col(right_time).isNotNull() & F.col(key).isNotNull()
    ).select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_type).alias("_l"),
        r_struct.alias("_r"),
    )
    # right rows sort before left rows at equal (_k, _t): an exact-time
    # match is carried by the BACKWARD pass at distance 0 (and therefore
    # wins outright, so its exclusion from the forward frame is harmless)
    wprev = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wnext = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = l_tag.unionByName(r_tag).select(
        "_side",
        "_l",
        "_t",
        F.last("_r", ignorenulls=True).over(wprev).alias("_prev"),
        F.first("_r", ignorenulls=True).over(wnext).alias("_next"),
    )
    tol_us = tolerance_seconds * 1_000_000
    prev_d = F.expr("timestampdiff(MICROSECOND, _prev._rt, _t)")
    next_d = F.expr("timestampdiff(MICROSECOND, _t, _next._rt)")
    cand = carried.where(F.col("_side") == 1).select(
        "_l",
        F.when(
            F.col("_prev").isNotNull() & (prev_d <= tol_us),
            F.struct(
                prev_d.alias("d"), F.lit("prev").alias("dir"), F.col("_prev").alias("r")
            ),
        ).alias("_p"),
        F.when(
            F.col("_next").isNotNull() & (next_d <= tol_us),
            F.struct(
                next_d.alias("d"), F.lit("next").alias("dir"), F.col("_next").alias("r")
            ),
        ).alias("_n"),
    )
    best = (
        F.when(F.col("_p").isNull(), F.col("_n"))
        .when(F.col("_n").isNull(), F.col("_p"))
        .when(F.col("_n.d") < F.col("_p.d"), F.col("_n"))
        .otherwise(F.col("_p"))  # equal distance → the earlier ('prev') row
    )
    return cand.withColumn("_best", best).select(
        "_l.*",
        *[F.col(f"_best.r.{c}").alias(c) for c in payload],
        F.col("_best.dir").alias("direction"),
        F.col("_best.d").alias("diff_us"),
    )
