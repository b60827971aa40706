"""Upsert / MERGE / CDC-apply operators.

The reference has no mutation surface at all (/root/reference/main.go:1-312
is append-only event shipping), but any engine feeding a warehouse needs the
MERGE trio: full-row upsert, column-level merge, and change-data-capture
apply with latest-wins ordering. Spark on plain parquet has no transactional
MERGE INTO, so these are expressed as pure DataFrame→DataFrame transforms
over an immutable snapshot — the caller writes the result wherever the next
snapshot lives (that write is atomic-by-directory, the standard pattern for
format-agnostic pipelines).

Scale notes (100 TB):
- ``upsert``: one left_anti join on the key + a union. When the change set
  is small relative to the snapshot (the overwhelmingly common case) the
  anti join broadcasts and the big side NEVER shuffles — strictly cheaper
  than the full-outer-join formulation of MERGE.
- ``merge_columns``: the general MERGE (partial-column updates) — a full
  outer join shuffling both sides by key. Use only when updates genuinely
  carry partial rows.
- ``apply_cdc``: collapses the change log to latest-per-key with ONE hash
  aggregate (struct-keyed max_by — no window, no second shuffle), then
  upserts and drops deletes. Latest-wins needs a total order: pass a
  deterministic (seq, tiebreak) ordering column list.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _key_list(keys: str | Sequence[str]) -> list[str]:
    return [keys] if isinstance(keys, str) else list(keys)


def upsert(target: DataFrame, source: DataFrame, keys: str | Sequence[str]) -> DataFrame:
    """Full-row upsert: source rows replace matching target rows, new source
    keys are inserted. Schemas must match by name (the source is the new
    truth for every column)."""
    keys = _key_list(keys)
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"upsert needs identical schemas; target-only="
            f"{sorted(set(target.columns) - set(source.columns))} "
            f"source-only={sorted(set(source.columns) - set(target.columns))}"
        )
    # null-safe anti join: a NULL key in both sides must REPLACE, not
    # duplicate — plain equality never matches NULL = NULL, so the stale
    # target row survived alongside the new source row (r7 review;
    # merge_columns below always used eqNullSafe)
    t, s = target.alias("t"), source.select(*keys).alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys]
    kept = t.join(s, cond, "left_anti")
    return kept.unionByName(source)


def merge_columns(
    target: DataFrame,
    source: DataFrame,
    keys: str | Sequence[str],
) -> DataFrame:
    """General MERGE: full outer join on the key; for non-key columns the
    source value wins where present (column-level coalesce), target rows
    without a match survive, source rows without a match insert."""
    keys = _key_list(keys)
    t = target.alias("t")
    s = source.alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys]
    joined = t.join(s, cond, "full_outer")
    cols = [
        F.coalesce(F.col(f"t.{k}"), F.col(f"s.{k}")).alias(k) for k in keys
    ]
    for c in target.columns:
        if c in keys:
            continue
        if c in source.columns:
            cols.append(F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c))
        else:
            cols.append(F.col(f"t.{c}").alias(c))
    return joined.select(*cols)


def apply_cdc(
    target: DataFrame,
    changes: DataFrame,
    keys: str | Sequence[str],
    order_by: str | Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> tuple[DataFrame, DataFrame]:
    """Apply a CDC log (insert/update/delete rows) to a snapshot.

    ``changes`` carries the target's columns plus ``op_col``; ``order_by``
    columns define latest-wins per key (must be a total order per key —
    include a tiebreak). Deletes remove the key; any other op upserts the
    row.

    Returns two DataFrames: the merged snapshot, and the applied delete
    keys (for downstream tombstone propagation) — see apply_cdc_snapshot
    for the snapshot-only convenience wrapper."""
    keys = _key_list(keys)
    order_cols = _key_list(order_by)
    payload = [c for c in changes.columns if c not in keys]
    latest = (
        changes.groupBy(*keys)
        .agg(
            F.max_by(
                F.struct(*payload), F.struct(*[F.col(c) for c in order_cols])
            ).alias("_latest")
        )
        .select(*keys, "_latest.*")
    )
    # a NULL op is ambiguous (delete or upsert?) — both the `!= delete_op`
    # and `== delete_op` filters evaluate NULL and silently DROP the row
    # from snapshot AND tombstones, vanishing the key with no trace (r7
    # review). Fail loudly instead — and guard ONCE on `latest` before
    # branching, so a consumer acting on the tombstone frame ALONE also
    # fails loudly instead of silently losing the key (the survivors-only
    # guard left the deletes branch exposed; r8 advice).
    latest = latest.withColumn(
        op_col,
        F.when(F.col(op_col).isNotNull(), F.col(op_col)).otherwise(
            F.raise_error(
                F.lit(f"apply_cdc: NULL {op_col} — delete vs upsert ambiguous")
            )
        ),
    )
    survivors = latest.where(F.col(op_col) != delete_op)
    deletes = latest.where(F.col(op_col) == delete_op).select(*keys)
    # null-safe anti join, same reasoning as upsert above
    t = target.alias("t")
    lk = latest.select(*keys).alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys]
    kept = t.join(lk, cond, "left_anti")
    return kept.unionByName(survivors.select(*target.columns)), deletes


def scd2_history(
    changes: DataFrame,
    keys: str | Sequence[str],
    time_col: str,
    tiebreak: str | Sequence[str] = (),
    attrs: Sequence[str] | None = None,
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from a change log.

    ``changes`` carries one row per observed state (key columns, the
    ``time_col`` effective time, and attribute columns). Consecutive rows
    whose attributes are identical (null-safely) COLLAPSE into one
    version — a re-observation is not a change — and each surviving
    change opens a version:

    - ``valid_from``: the opening row's ``time_col``
    - ``valid_to``: the next version's ``valid_from`` (NULL while current)
    - ``version``: 1-based per key, in effective-time order
    - ``is_current``: exactly one per key

    ``attrs`` defaults to every column that is neither a key, the time,
    nor a tiebreak. ``(time_col, *tiebreak)`` must totally order each
    key's rows — pass a tiebreak when times can collide, or the lag
    comparison is non-deterministic.

    Scale notes (100 TB): both windows partition on the SAME key set, so
    the plan is one exchange (windows reuse the sort); the change filter
    runs before the second window, so lead/row_number see only version
    opens. Skew follows hot keys, the usual dimension-build profile. The
    reference has no dimension surface (main.go:1-312 is append-only
    shipping); this is the warehouse-side twin of apply_cdc above.
    """
    keys = _key_list(keys)
    tiebreak = _key_list(tiebreak) if tiebreak else []
    order_cols = [time_col, *tiebreak]
    if attrs is None:
        attrs = [
            c
            for c in changes.columns
            if c not in keys and c not in order_cols
        ]
    if not attrs:
        raise ValueError("scd2_history needs at least one attribute column")
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    cur = F.struct(*[F.col(c) for c in attrs])
    # first-row detection via lag(lit) — NOT prev.isNull(): a struct of
    # all-NULL attrs is itself non-null in Spark but an all-NULL tuple
    # compares not-distinct in SQL engines; the explicit marker makes
    # "first observation always opens" hold for NULL attribute states too
    opens = (
        changes.withColumn("_prev", F.lag(cur).over(w))
        .withColumn("_first", F.lag(F.lit(1)).over(w).isNull())
        .where(F.col("_first") | ~cur.eqNullSafe(F.col("_prev")))
        .drop("_prev", "_first")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order_cols)
    return opens.select(
        *keys,
        *attrs,
        F.col(time_col).alias("valid_from"),
        F.lead(time_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        F.lead(time_col).over(w2).isNull().alias("is_current"),
    )


def apply_cdc_snapshot(
    target: DataFrame,
    changes: DataFrame,
    keys: str | Sequence[str],
    order_by: str | Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """``apply_cdc`` returning just the next snapshot (deletes dropped)."""
    merged, _deletes = apply_cdc(
        target, changes, keys, order_by, op_col=op_col, delete_op=delete_op
    )
    return merged
