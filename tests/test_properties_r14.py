"""Round-14 property pins.

1. The SPARK_GRAFT_HASH64 production flag (optimization guide §4: md5 is
   ~3× slower than xxhash64 at per-token signature volume) must be
   byte-inert by default: hash64/hash64_expr with the flag unset emit
   EXACTLY the md5_long64 forms, so every oracle-checked hash is
   unchanged. Under xxhash64 the forms must land in the same 60-bit
   positive domain (downstream `% P31` sign and bucket arithmetic
   assume non-negative inputs).
2. The unroll opt-out on dot_sql/norm_sql/checked_dot (ql42/ql03/ql43 —
   the r13 unroll measured slower at the query level in small-row and
   BNLJ-projection call sites) must return bit-identical values to the
   unrolled forms: same accumulator start, same left-associative order.
"""

from __future__ import annotations

import pytest


def test_hash64_default_is_md5_byte_identical():
    from streamsurfer_spark.functions import hashing as h

    assert h.HASH64_IMPL == "md5", (
        "tests must run with SPARK_GRAFT_HASH64 unset — the oracle gate "
        "depends on the md5 default"
    )
    assert h.hash64_expr("t") == h.md5_long64_expr("t")
    assert h.hash64_expr("concat(a, b)") == h.md5_long64_expr("concat(a, b)")


def test_hash64_xxhash_form_is_60bit_positive(spark, monkeypatch):
    """Under the production flag the emitted expression masks xxhash64 to
    [0, 2^60): evaluate both the expr and Column forms over adversarial
    strings and check the domain (xxhash64 alone is full-range signed —
    an unmasked swap would flip `% P31` signs and split buckets)."""
    from pyspark.sql import functions as F

    from streamsurfer_spark.functions import hashing as h

    monkeypatch.setattr(h, "HASH64_IMPL", "xxhash64")
    rows = [("",), ("a",), ("token",), ("é中文",), ("x" * 500,)]
    df = spark.createDataFrame(rows, ["s"])
    got = df.select(
        F.expr(h.hash64_expr("s")).alias("e"),
        h.hash64(F.col("s")).alias("c"),
    ).collect()
    for r in got:
        assert r.e is not None and 0 <= r.e < (1 << 60), r
        assert r.c is not None and 0 <= r.c < (1 << 60), r
        assert r.e == r.c  # expr and Column forms agree
    # and it is actually a DIFFERENT family than md5 (the flag does work)
    md5 = df.select(F.expr(h.md5_long64_expr("s")).alias("m")).collect()
    assert [r.e for r in got] != [r.m for r in md5]


@pytest.mark.parametrize("width", [64, 3, 0])
def test_unroll_false_bitwise_equals_unrolled(spark, width):
    """dot_sql/norm_sql(unroll=False) must be bit-identical to the
    unrolled fast path on in-width vectors (both reproduce the same
    left-associative float64 chain) and on off-width vectors (both take
    the HOF form)."""
    import math
    import random

    from pyspark.sql import functions as F

    from streamsurfer_spark.operators.similarity import dot_sql, norm_sql

    rng = random.Random(1414)
    rows = []
    for _ in range(50):
        a = [rng.randint(-2000, 2000) for _ in range(width)]
        b = [rng.randint(-2000, 2000) for _ in range(width)]
        rows.append((a, b))
    # adversarial floats only reach the cast inside; ints model the
    # engine's ×1000-quantized embeddings (explicit schema: width 0 rows
    # are empty arrays, which defeat inference)
    df = spark.createDataFrame(rows, "a array<bigint>, b array<bigint>")
    got = df.select(
        F.expr(dot_sql("a", "b")).alias("d1"),
        F.expr(dot_sql("a", "b", unroll=False)).alias("d2"),
        F.expr(norm_sql("a")).alias("n1"),
        F.expr(norm_sql("a", unroll=False)).alias("n2"),
    ).collect()
    for r in got:
        for x, y in ((r.d1, r.d2), (r.n1, r.n2)):
            if x is None or (isinstance(x, float) and math.isnan(x)):
                assert y is None or math.isnan(y)
            else:
                assert x == y and math.copysign(1, x) == math.copysign(1, y)
