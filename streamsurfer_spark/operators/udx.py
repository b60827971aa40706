"""The full Python extensibility matrix: UDF / UDAF / grouped-map / UDTF.

The reference has zero extensibility hooks (SURVEY §2.2: "UDF/UDAF/UDTF:
none — it's a Go library, call it"); the engine exposes all four Spark
surfaces, each Arrow-batched where the API supports it:

- scalar pandas_udf          → similarity.l2_norm_udf (Q-L6)
- grouped-agg pandas_udf     → geo_mean_udf (UDAF shape, partial-less:
  runs once per group; at scale prefer expression log/exp which gets
  map-side partials — documented tradeoff)
- grouped-map applyInPandas  → zscore_by_group (whole-group vectorized
  transform; group must fit in executor memory — the documented contract)
- UDTF                       → TokenizeUDTF (1→N lateral expansion)

Every one of these is the SLOW PATH relative to built-in expressions; they
exist for semantics expressions can't reach. The oracle queries (ql18-20)
deliberately pick computations SQL *can* express so the UDx results are
hash-verifiable — the surface is what's being proven, not the math.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType


# marks a non-positive input row inside geo_mean_udf's micro-nat column;
# real |ln(x)|·1e6 values are ~1e9 for any physical doc length, nowhere
# near this
GEO_ZERO_SENTINEL = -(2**62)


@pandas_udf(DoubleType())
def geo_mean_udf(v: pd.Series) -> float:  # type: ignore[misc]
    """Grouped-agg UDAF: geometric mean — exp of the exact mean of
    MICRO-NAT log values.

    The input is ``round(ln(x)·1e6)`` as BIGINT, computed ENGINE-side
    (Spark JVM ln has proven bit-parity with DuckDB ln on integer-valued
    doubles — the ql36/ql46 precedent), NOT raw doubles: the old
    ``np.log(v).mean()`` accumulated doubles in numpy order while the
    twin's ``avg(ln(x))`` accumulated in DuckDB order — the qr26
    Welford-drift class. Here the sum is an exact Python int, the mean
    is one double division mirrored term-for-term in QL18_SQL, and the
    single exp is the only residual engine-library call (a 1-ulp exp
    divergence would need the result within ~1e-14 of a .xx5 cent to
    flip the 2dp round — vanishingly small, and documented rather than
    hidden under multi-ulp sum drift).

    Domain contract: the caller maps non-positive inputs to
    GEO_ZERO_SENTINEL before the micro-nat conversion (a grouped-agg
    pandas UDF cannot be mixed with builtin aggregates, so the zero
    flag rides IN the column); any sentinel makes the group's geometric
    mean 0.0 by definition, mirrored by the twin's count_if guard. This
    function therefore only ever does exact-int arithmetic.
    """
    vals = [int(x) for x in v]
    if any(x == GEO_ZERO_SENTINEL for x in vals):
        return 0.0
    s = sum(vals)
    return float(np.exp(np.float64(s) / (np.float64(len(vals)) * 1_000_000.0)))


def zscore_by_group(df, group_col: str, value_col: str, out_schema: str):
    """Grouped-map: z-score an INTEGER `value_col` within each group.

    applyInPandas hands each whole group as one pandas DataFrame (Arrow);
    ddof=1 semantics match SQL stddev_samp. Degenerate groups (single
    sample, or all-equal) z-score to 0.0; the QL19 twin replicates this
    with a variance-numerator > 0 guard. Groups must fit in memory — for
    unbounded groups use window expressions instead (same math,
    streaming partials).

    Numerics (r9, the qr26 lesson): pandas ``mean``/``std`` and the
    engines' Welford aggregates accumulate doubles in different orders,
    and that last-ulp drift CAN cross the 1e-4 rounding grain on
    adversarial values. Since the input is integer-valued, the co-moments
    n/Σx/Σx² are computed as EXACT Python ints and every float op is
    mirrored expression-for-expression in QL19_SQL:
    z = float(n·x − Σx) / sqrt(float(n·Σx² − Σx²ᵗᵒᵗ) · n / (n − 1)) —
    one correctly-rounded int→double conversion per term, then identical
    IEEE multiply/divide/sqrt on both engines → bit-identical z.
    """

    def zs(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from streamsurfer_spark.functions.rounding import scaled_round_np

        pdf = pdf.copy()
        # loud-fail on non-integer values (r10 ADVICE): int(v) floors
        # toward zero, so a float-valued caller would get quietly wrong
        # z-scores instead of a contract error like the repo's other
        # guards raise
        for v in pdf[value_col]:
            if v != int(v):
                raise ValueError(
                    f"zscore_by_group requires an INTEGER {value_col!r}; got {v!r}"
                )
        xs = [int(v) for v in pdf[value_col]]
        n = len(xs)
        sx = sum(xs)
        sxx = sum(v * v for v in xs)
        a = n * sxx - sx * sx  # n²·var_pop — exact, ≥ 0
        if n < 2 or a <= 0:
            pdf["zscore"] = 0.0
            return pdf
        den = np.sqrt(np.float64(a) * np.float64(n) / (np.float64(n) - 1.0))
        num = np.array([np.float64(n * x - sx) for x in xs])
        # tie-proof integer-scale round (r7): Series.round is half-even,
        # the engines are half-away — scaled_round_np matches them on the
        # exact binary value (twin in lockstep in QL19_SQL)
        pdf["zscore"] = scaled_round_np(num / den)
        return pdf

    return df.groupBy(group_col).applyInPandas(zs, schema=out_schema)


@udtf(returnType="pos int, token string")
class TokenizeUDTF:
    """UDTF: expand one text into (pos, token) rows — 1→N lateral shape.

    Equivalent to posexplode(split(...)) (which is what production uses);
    exists to prove the table-function surface end-to-end.
    """

    def eval(self, text: str) -> Iterator[tuple[int, str]]:
        if text is None:
            # posexplode(split(NULL)) emits ZERO rows — the claimed
            # equivalence (and the ql20 oracle's unnest) requires the
            # UDTF to match; `(text or '')` emitted a spurious (0, '')
            # row for NULL input (r7 review)
            return
        for i, tok in enumerate(text.split(" ")):
            yield i, tok
