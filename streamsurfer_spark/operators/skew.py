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

    - probe rows get a uniform deterministic salt in [0, n_salt) derived
      from xxhash64 of the whole row (no RNG → retries/speculative tasks
      produce identical output);
    - build rows are exploded n_salt times so every (key, salt) probe
      partition finds its match locally.

    With ``hot_keys``, only those keys are salted/replicated and the rest
    join on salt 0 — bounding duplication to the skewed slice.
    """
    salts = F.array(*[F.lit(i) for i in range(n_salt)])
    probe_salt = F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(n_salt))
    if hot_keys is not None:
        is_hot_p = F.col(on).isin(hot_keys)
        probe_salt = F.when(is_hot_p, probe_salt).otherwise(F.lit(0))
        build_salts = F.when(F.col(on).isin(hot_keys), salts).otherwise(F.array(F.lit(0)))
    else:
        build_salts = salts
    p = probe.withColumn(SALT_COL, probe_salt)
    b = build.withColumn(SALT_COL, F.explode(build_salts))
    return p.join(b, on=[on, SALT_COL], how=how).drop(SALT_COL)
