"""Declarative data-quality expectations, evaluated in one distributed pass.

The Deequ/Great-Expectations primitive re-expressed Spark-first: a
constraint set over a table compiles to ONE aggregate over the scan —
every row-level predicate becomes a conditional count — plus one exact
group-by for uniqueness and one broadcast anti-join per referential check.
No per-constraint passes: at 100 TB the table is read once.

Output contract (one row per constraint, stable order):
    check_name: str, n_violations: bigint, n_checked: bigint
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


@dataclass(frozen=True)
class RowCheck:
    """A row-level predicate that every row must satisfy.

    NULL-predicate convention (SQL CHECK semantics, deliberately): a
    predicate that evaluates to NULL — e.g. ``col > 0`` on a NULL col —
    counts as a PASS, exactly like a table CHECK constraint. Pair every
    domain predicate with an explicit ``isNotNull`` RowCheck when
    completeness matters (qr50 does), rather than relying on the domain
    check to catch NULLs — it will not.
    """

    name: str
    predicate: Column  # True = row passes; NULL = pass (CHECK semantics)


@dataclass(frozen=True)
class UniqueCheck:
    """Column combination must be unique across the table."""

    name: str
    cols: Sequence[str]


@dataclass(frozen=True)
class ForeignKeyCheck:
    """Every non-null key must exist in the (broadcastable) reference set."""

    name: str
    col: str
    ref: DataFrame  # single-column DataFrame of valid keys
    ref_col: str


def check(
    df: DataFrame,
    checks: Sequence[RowCheck | UniqueCheck | ForeignKeyCheck],
) -> DataFrame:
    """Evaluate all expectations; returns (check_name, n_violations, n_checked)."""
    reports: list[DataFrame] = []

    row_checks = [c for c in checks if isinstance(c, RowCheck)]
    if row_checks:
        aggs = [F.count("*").alias("_n")]
        for c in row_checks:
            aggs.append(
                F.sum(F.when(~c.predicate, 1).otherwise(0)).alias(f"_v_{c.name}")
            )
        wide = df.agg(*aggs)
        # one row per constraint via explode of the single 1-row aggregate —
        # a UNION of per-constraint selects would make Catalyst re-plan (and
        # re-scan) the aggregate once per leg
        entries = F.array(
            *[
                F.struct(
                    F.lit(c.name).alias("check_name"),
                    F.col(f"_v_{c.name}").cast("bigint").alias("n_violations"),
                    F.col("_n").cast("bigint").alias("n_checked"),
                )
                for c in row_checks
            ]
        )
        reports.append(wide.select(F.explode(entries).alias("e")).select("e.*"))

    for c in checks:
        if isinstance(c, UniqueCheck):
            dupes = (
                df.groupBy(*c.cols)
                .agg(F.count("*").alias("_cnt"))
                .where(F.col("_cnt") > 1)
            )
            reports.append(
                dupes.agg(
                    F.coalesce(F.sum(F.col("_cnt") - 1), F.lit(0))
                    .cast("bigint")
                    .alias("n_violations")
                ).select(
                    F.lit(c.name).alias("check_name"),
                    "n_violations",
                    F.lit(None).cast("bigint").alias("n_checked"),
                )
            )
        elif isinstance(c, ForeignKeyCheck):
            orphans = (
                df.where(F.col(c.col).isNotNull())
                .join(
                    F.broadcast(c.ref.select(F.col(c.ref_col).alias(c.col))),
                    c.col,
                    "left_anti",
                )
                .agg(F.count("*").cast("bigint").alias("n_violations"))
            )
            reports.append(
                orphans.select(
                    F.lit(c.name).alias("check_name"),
                    "n_violations",
                    F.lit(None).cast("bigint").alias("n_checked"),
                )
            )

    if not reports:
        raise ValueError("check() requires at least one check")
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.orderBy("check_name")
