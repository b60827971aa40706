"""Tie-proof cross-engine rounding for computed ratios and similarities.

`ROUND(x, d)` on a raw computed double is the one mechanism left (probed
round 5, FIXTURES.md §3) that can silently split the engines: Spark rounds
the double's SHORTEST DECIMAL REPRESENTATION half-up (``round(0.285d, 2)``
→ 0.29 even though the binary value is 0.28499999999999998), while DuckDB
rounds the EXACT binary value (→ 0.28). Ratios of small integers hit this
for real — 57/200 IS 0.285 — so every similarity/ratio score the engine
emits goes through the scaled-integer discipline instead:

    micro = CAST(ROUND(x * 10^d') AS BIGINT)   -- d' = digits kept
    score = micro / 10^d'                      -- double read-back

Why this is tie-proof: rounding a double to an INTEGER cannot diverge.
Every half-integer is exactly representable in binary, so a double either
IS a true midpoint (shortest repr "…#.5"; Spark's HALF_UP and DuckDB's
round-half-away-from-zero both move away from zero) or is strictly on one
side of it (its shortest repr then carries enough digits to show which
side, so the shortest-repr and exact-binary views agree). The divergence
window of fractional-digit rounding — shortest repr shows a bare '5' just
past the kept digit while the binary value sits below the midpoint — has
no integer-scale analogue. The read-back division by a power of ten is a
single correctly-rounded IEEE op on identical inputs, hence identical
doubles on both engines; values equal the old ``ROUND(x, d)`` output
everywhere except in the tie class being retired.

Spark sides go through :func:`scaled_round`; the DuckDB twins inline the
equivalent ``CAST(round((x) * 10^d) AS BIGINT) / 10^d.0`` SQL directly in
their (mostly static) oracle strings rather than interpolating
:func:`scaled_round_sql` — a deliberate trade: the twins were verified
value-by-value against the gate at conversion time, and rewriting 30
hash-proven strings to route through the helper re-risks each one for
cosmetic uniformity. New twins SHOULD use :func:`scaled_round_sql`; the
cross-engine agreement of both formulations is pinned by
``tests/test_differential_fuzz.py`` (tie-pair and arbitrary-double
sweeps) per the lockstep rule in FIXTURES.md §3.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def scaled_round(col: Column | str, digits: int = 4) -> Column:
    """Tie-proof replacement for ``F.round(col, digits)`` on computed
    doubles: round once at integer scale, read back as a double.

    Non-finite inputs (NaN/±Inf — e.g. a zero-norm embedding's 0/0, which
    Spark evaluates to NaN while DuckDB's x/0 is NULL) are nulled out
    BEFORE the scale step: ``CAST(NaN AS BIGINT)`` aborts the whole query
    under Spark ANSI mode and raises ConversionException in DuckDB, so
    without the guard one engine errors while the other returns rows.
    NULL-on-non-finite converges both engines to the same value.
    """
    scale = 10 ** digits
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("double")
    finite = ~F.isnan(c) & (F.abs(c) != float("inf"))
    return F.when(finite, F.round(c * scale).cast("bigint") / float(scale))


def scaled_round_np(values, digits: int = 4):
    """Pandas/NumPy twin of :func:`scaled_round` for Arrow-UDF paths.

    ``numpy.round``/``Series.round`` are HALF-TO-EVEN, which diverges from
    the Spark/DuckDB half-away-from-zero integer round on exact binary
    midpoints. This computes half-away on the EXACT binary value with no
    intermediate rounding: ``y - trunc(y)`` is an exact float subtraction
    (both operands within 1.0 of each other, |y| < 2^52 by contract), so
    the ``>= 0.5`` midpoint test sees the true fractional part — unlike
    the ``floor(abs(y) + 0.5)`` idiom, whose addition can round a
    just-below-midpoint value up to the next integer. Non-finite inputs
    come back NaN (the pandas analogue of the SQL NULL guard).
    """
    import numpy as np

    scale = float(10**digits)
    y = np.asarray(values, dtype="float64") * scale
    with np.errstate(invalid="ignore"):
        # inf - inf in the frac subtraction is an invalid op too — the
        # errstate must cover it, or ±Inf inputs emit RuntimeWarnings on
        # the way to their documented NaN result
        k = np.trunc(y)
        frac = y - k
        r = np.where(np.abs(frac) >= 0.5, k + np.sign(y), k)
        r = np.where(np.isfinite(y), r, np.nan)
    return r / scale


def scaled_round_sql(expr: str, digits: int = 4) -> str:
    """DuckDB twin of :func:`scaled_round` (same integer-scale contract,
    same NULL-on-non-finite guard)."""
    scale = 10 ** digits
    return (
        f"(CASE WHEN isfinite({expr}) THEN "
        f"CAST(round(({expr}) * {scale}) AS BIGINT) / {scale}.0 END)"
    )
