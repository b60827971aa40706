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


@pandas_udf(DoubleType())
def geo_mean_udf(v: pd.Series) -> float:  # type: ignore[misc]
    """Grouped-agg UDAF: geometric mean (exp of mean log).

    Domain contract: positive inputs (ql18 feeds n_chars ≥ 1). A zero
    makes the mean log -inf → 0.0 and a negative makes it NaN — silently,
    on BOTH engines (the QL18 twin shares the exp(avg(ln)) form), so the
    oracle cannot catch a domain violation; gate the input if zeros are
    possible.
    """
    return float(np.exp(np.log(v.astype("float64")).mean()))


def zscore_by_group(df, group_col: str, value_col: str, out_schema: str):
    """Grouped-map: z-score `value_col` within each group.

    applyInPandas hands each whole group as one pandas DataFrame (Arrow);
    ddof=1 matches SQL stddev_samp. Degenerate groups z-score to 0.0 (a
    single sample — pandas std NaN — or an all-equal group — std 0; the
    QL19 twin replicates this with a CASE on stddev_samp > 0). Groups
    must fit in memory — for unbounded groups use window expressions
    instead (same math, streaming partials).
    """

    def zs(pdf: pd.DataFrame) -> pd.DataFrame:
        from streamsurfer_spark.functions.rounding import scaled_round_np

        v = pdf[value_col].astype("float64")
        sd = v.std(ddof=1)
        pdf = pdf.copy()
        # tie-proof integer-scale round (r7): Series.round is half-even,
        # the engines are half-away — scaled_round_np matches them on the
        # exact binary value (twin in lockstep in QL19_SQL)
        pdf["zscore"] = scaled_round_np((v - v.mean()) / sd if sd > 0 else v * 0.0)
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
