"""Skew mitigation for large joins (SURVEY §2.3 scale notes).

No reference counterpart (the reference never joins — SURVEY §2.2); this is
engine-side 100 TB discipline. Defense layers, in order of preference:

1. **Broadcast** the small side (no shuffle at all) — `F.broadcast`.
2. **AQE skew-join splitting** (on by default in session.py) — handles
   skew discovered at runtime by splitting oversized partitions.
3. **Salting** (this module) — the manual fallback for the case AQE can't
   fix: a mid-size build side too big to broadcast joined on keys where a
   handful of values dominate (bot users, null-ish defaults, head URLs).

Salting trades build-side duplication (×n_salt) for even reduce fan-in:
the probe side scatters each hot key across n_salt shuffle partitions.
Pick n_salt ≈ (hot-key row count) / (target rows per partition); salting
cost is linear in the build side, so salt only the keys that need it
(``hot_keys`` parameter) when the build side is large.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SALT_COL = "__salt"


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    n_salt: int = 16,
    how: str = "inner",
    hot_keys: list | None = None,
) -> DataFrame:
    """Equi-join with the probe side salted and the build side replicated.

    - probe rows get a uniform salt in [0, n_salt) from a per-row counter
      (monotonically_increasing_id), so even BYTE-IDENTICAL probe rows —
      the null-ish-defaults hot-key case this module exists for — scatter
      across salts (a whole-row hash sent all identical rows to ONE salt,
      defeating the mitigation — r7 review). The salt only routes rows to
      partitions, so its nondeterminism across retries cannot change the
      join RESULT (build carries every salt for a key);
    - build rows are exploded n_salt times so every (key, salt) probe
      partition finds its match locally.

    Only probe-preserving joins are valid: with the build side exploded,
    a build-preserving join (right/full) would return each unmatched
    build row n_salt times (verified: right-join duplication — r7
    review), so those `how` values are rejected.

    With ``hot_keys``, only those keys are salted/replicated and the rest
    join on salt 0 — bounding duplication to the skewed slice.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports probe-preserving joins only ({sorted(allowed)}); "
            f"a build-preserving {how!r} would duplicate unmatched build rows "
            f"n_salt times"
        )
    salts = F.array(*[F.lit(i) for i in range(n_salt)])
    probe_salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salt))
    if hot_keys is not None:
        is_hot_p = F.col(on).isin(hot_keys)
        probe_salt = F.when(is_hot_p, probe_salt).otherwise(F.lit(0))
        build_salts = F.when(F.col(on).isin(hot_keys), salts).otherwise(F.array(F.lit(0)))
    else:
        build_salts = salts
    p = probe.withColumn(SALT_COL, probe_salt)
    b = build.withColumn(SALT_COL, F.explode(build_salts))
    return p.join(b, on=[on, SALT_COL], how=how).drop(SALT_COL)
