"""Data profiling: per-column stats in one distributed pass.

The reference has no introspection surface (SURVEY §2.2); this is the
data-quality primitive every ingestion pipeline bolts on first: per column,
how many rows, how many NULLs, how many distinct values, and the min/max.

Design: instead of N passes (one per column) or a single wide Expand, each
row is exploded into (col_name, rendered_value) entries and aggregated by
col_name. That is ONE scan of the table; partial aggregation collapses
count/min/max map-side, and the distinct count spreads over (col_name,
value) before the final per-column fold — so the per-column groups don't
bottleneck a single reducer even though there are only N of them.

Values are profiled through a caller-supplied *rendering* to a sortable
string (numbers fixed-width zero-padded so lexicographic order == numeric
order, timestamps in ISO form). Profiling the rendering — not the raw
value — is what makes min/max/distinct deterministic and engine-portable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# 19 = max int64 digit count: lpad TRUNCATES beyond the pad width, so 18
# silently collapsed distinct 19-digit scaled values to one rendering
# (corrupting min/max/n_distinct — r7 review, verified by execution)
PAD = 19


def render_number(col: Column | str, nd: int = 2) -> Column:
    """Non-negative numeric → fixed-width decimal string (lexicographic ==
    numeric). nd decimal places survive the rounding. Non-finite values
    (NaN/±Inf) render NULL — the bigint cast would otherwise abort the
    whole profile job under ANSI (r7 review; same guard as
    rounding.scaled_round)."""
    c = F.col(col) if isinstance(col, str) else col
    finite = c.isNotNull() & ~F.isnan(c.cast("double")) & (
        F.abs(c.cast("double")) != float("inf")
    )
    scaled = F.round(c * (10**nd)).cast("bigint").cast("string")
    return F.when(finite, F.lpad(scaled, PAD, "0"))


def render_timestamp(col: Column | str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, fmt)


def profile(df: DataFrame, renders: dict[str, Column]) -> DataFrame:
    """Profile the given (col_name → rendered string value) columns.

    Returns one row per profiled column: col_name, n_rows, n_nulls,
    n_distinct, min_val, max_val.
    """
    entries = F.array(
        *[
            F.struct(F.lit(name).alias("col_name"), render.cast("string").alias("val"))
            for name, render in renders.items()
        ]
    )
    long = df.select(F.explode(entries).alias("e")).select("e.col_name", "e.val")
    stats = long.groupBy("col_name").agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("val")).alias("n_nulls"),
        F.countDistinct("val").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )
    # a profile of an EMPTY table is still one row per column (all-zero
    # counts, NULL extrema) — matching the per-column-aggregate formulation
    # the DuckDB twin uses; without this, the grouped shape silently drops
    # to zero rows on empty input (found by tools/empty_sweep.py). The
    # stats side (tiny after aggregation) is the broadcast build side —
    # the preserved left side of an outer join cannot be broadcast.
    names = df.sparkSession.createDataFrame(
        [(n,) for n in renders], "col_name string"
    )
    return names.join(F.broadcast(stats), "col_name", "left").select(
        "col_name",
        F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
        F.coalesce("n_nulls", F.lit(0)).alias("n_nulls"),
        F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
        "min_val",
        "max_val",
    )


def robust_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: int = 3,
) -> DataFrame:
    """Median/MAD robust outlier flags per group: a row is an outlier
    when |value − median(group)| > k · MAD(group) — the scale-in-use
    anomaly screen for corpus intake (document lengths, per-source token
    counts), robust where mean/stddev is dragged by the very outliers it
    is supposed to find.

    Exactness: medians are DISCRETE percentiles (``percentile_disc`` —
    actual data values, bit-identical to DuckDB's ``quantile_disc``,
    never interpolated), so with an integer ``value_col`` every quantity
    here (median, absolute deviation, MAD, the k·MAD threshold) is exact
    BIGINT and the flag is an integer comparison — no float appears at
    all.

    Distributed shape (100 TB): two grouped aggregations over the corpus
    (median, then MAD of deviations) keyed by ``group_col``, each
    result a |groups|-row frame broadcast back — the corpus itself never
    shuffles. A hot group makes a hot SORT inside percentile_disc's
    aggregation buffer, not a hot join. Groups are assumed ≪ corpus
    (sources, languages); for a high-cardinality group key, the same
    shape degrades gracefully to hash exchanges on a uniform key.
    """
    med = df.groupBy(group_col).agg(
        F.expr(
            f"cast(percentile_disc(0.5) WITHIN GROUP (ORDER BY {value_col})"
            " as bigint)"
        ).alias("med")
    )
    dev = df.join(F.broadcast(med), group_col).withColumn(
        "abs_dev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = dev.groupBy(group_col).agg(
        F.expr(
            "cast(percentile_disc(0.5) WITHIN GROUP (ORDER BY abs_dev)"
            " as bigint)"
        ).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), group_col)
        .withColumn("is_outlier", F.col("abs_dev") > F.lit(k) * F.col("mad"))
    )


PSI_BINS = 10


def psi_drift(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    time_col: str = "ts",
    bins: int = PSI_BINS,
) -> DataFrame:
    """Population Stability Index of ``value_col``'s distribution between
    the first and second half of the time range, per group — the standard
    drift monitor (banking scorecards; same math as the data-drift gates
    in training pipelines). Rule of thumb: PSI < 0.1 stable, 0.1–0.25
    drifting, > 0.25 shifted.

    PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i) over equal-width bins of the
    group's value range, with Laplace smoothing p_i = (c1_i + 1)/(n1 + B)
    so empty bins are defined.

    Numerics (FIXTURES.md §3 discipline): values land on the fixture's
    cent grid → exact BIGINT cents; the time split compares exact epoch
    micros against min + (max−min) div 2; bins are pure integer math
    ((cents − cmin)·B div (cmax − cmin + 1) — always < B, no clamp).
    ln() is taken ONLY on integer-valued doubles (the char_entropy
    precedent) and immediately rounded to micro-nats; each bin's term is
    one division + one multiply on bit-identical inputs, rounded to an
    integer (tie-proof), and the PSI sum is an exact BIGINT fold. No
    division can see zero: the smoothed denominators are ≥ B.

    Plan/scale: two passes over the group's rows (extrema, then binned
    counts), both partial-aggregating groupBys on tiny key spaces
    (|groups|, then |groups|·B·2); the extrema frame broadcasts back.
    Linear at 100 TB, no wide shuffle.
    """
    cents = F.round(F.col(value_col).cast("double") * 100).cast("bigint")
    base = df.select(
        F.col(group_col).alias("grp"), cents.alias("cents"), F.col(time_col).alias("t")
    )
    ext = base.groupBy("grp").agg(
        F.min("t").alias("t_min"),
        F.max("t").alias("t_max"),
        F.min("cents").alias("cmin"),
        F.max("cents").alias("cmax"),
    )
    # timestampdiff, not unix_micros: type-agnostic (NTZ or TZ — the
    # sessions.py precedent) and exact at µs resolution on both engines
    binned = (
        base.join(F.broadcast(ext), "grp")
        .select(
            "grp",
            F.expr(
                "CASE WHEN timestampdiff(MICROSECOND, t_min, t)"
                " <= timestampdiff(MICROSECOND, t_min, t_max) div 2"
                " THEN 0 ELSE 1 END"
            ).alias("half"),
            F.expr(f"((cents - cmin) * {bins}) div (cmax - cmin + 1)").alias("bin"),
        )
        .groupBy("grp", "bin")
        .agg(
            F.sum(F.expr("CASE WHEN half = 0 THEN 1 ELSE 0 END")).alias("c1"),
            F.sum(F.expr("CASE WHEN half = 1 THEN 1 ELSE 0 END")).alias("c2"),
        )
    )
    # group totals via a window over the ALREADY-AGGREGATED ≤|groups|·B
    # frame, not a groupBy+join back: the join formulation references the
    # binned subtree twice, and Spark re-executes it — the whole corpus
    # aggregation ran twice in the executed plan (verified; the window
    # form runs it once and only re-shuffles the tiny frame by grp)
    from pyspark.sql import Window

    wg = Window.partitionBy("grp")
    binned = binned.withColumn("n1", F.sum("c1").over(wg)).withColumn(
        "n2", F.sum("c2").over(wg)
    )
    b = bins
    # ln per FACTOR (not of the cross-products): ln((c1+1)(n2+B)) −
    # ln((c2+1)(n1+B)) as a 4-term sum keeps every ln argument an
    # integer-valued double ≤ the row count — the products would overflow
    # BIGINT (ANSI abort) once n² passes 2^63, i.e. ~3·10⁹-row groups.
    # Same for p−q: two divisions instead of a cross-product ratio. Each
    # step is one IEEE op on bit-identical inputs on both engines.
    terms = binned.select(
        "grp",
        "n1",
        "n2",
        F.expr(
            f"cast(round((ln(cast(c1 + 1 as double)) + ln(cast(n2 + {b} as double))"
            f" - ln(cast(c2 + 1 as double)) - ln(cast(n1 + {b} as double)))"
            f" * 1000000) as bigint)"
        ).alias("lr_micro"),
        F.expr(
            f"cast(c1 + 1 as double) / cast(n1 + {b} as double)"
            f" - cast(c2 + 1 as double) / cast(n2 + {b} as double)"
        ).alias("pq_diff"),
    )
    return (
        terms.select(
            "grp",
            "n1",
            "n2",
            F.expr("cast(round(pq_diff * lr_micro) as bigint)").alias("term_micro"),
        )
        .groupBy(F.col("grp").alias(group_col))
        .agg(
            F.max("n1").alias("n_first"),
            F.max("n2").alias("n_second"),
            F.expr(
                # 10000.0D: a bare 10000.0 literal parses as DECIMAL and
                # would type the result DECIMAL, not the oracle's DOUBLE
                "cast(round(cast(sum(term_micro) as double) / 100) as bigint)"
                " / 10000.0D"
            ).alias("psi"),
        )
        .orderBy(group_col)
    )
