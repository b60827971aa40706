"""Round-6 property tests: ROUND tie-class retirement support, the ql10
twin's derived plane count, and the Unicode case-mapping boundary guard.

Each pins a cross-engine contract added or documented this round:

- ``lsh_planes_for`` parity: the ql10 oracle now derives the active plane
  count in SQL (ceil(log2) over a COUNT) instead of pinning 8 — the
  derivation must equal the Python/Spark one at every corpus size that
  matters (round-5 ADVICE item).
- case-mapping guard: Spark's `upper()` uses FULL Unicode case mapping
  ('ß' → 'SS'), DuckDB's ICU path uses simple mapping ('ß' → 'ẞ') —
  engine-level, not twin-fixable (FIXTURES.md §3, commit 659894b). The
  gate is safe only while every case-mapped fixture column stays inside
  the domain where the two mappings agree; this test FAILS if a fixture
  regeneration ever ships a 'ß'/ligature into `part.p_name`.
"""

from __future__ import annotations

import os
import unicodedata

import duckdb
import pytest

from tests.conftest import SF_DIR


# --- ql10 twin plane-count derivation ---------------------------------------


def _duck_np(n: int) -> int:
    from streamsurfer_spark.operators import similarity as s

    con = duckdb.connect()
    try:
        return con.sql(
            f"""SELECT least(greatest(CAST(ceil(log2(greatest(
                {n} / {s.LSH_TARGET_BUCKET_DOCS}.0, 1.0))) AS INT),
                {s.N_PLANES}), {s.LSH_MAX_PLANES})"""
        ).fetchone()[0]
    finally:
        con.close()


@pytest.mark.parametrize(
    "n",
    [0, 1, 7, 8, 9, 100, 500, 2000, 2048, 2049, 5000, 20000, 65536, 10**6, 10**9],
)
def test_ql10_twin_plane_count_matches_python(n):
    """The SQL derivation in _ql10_sql must equal lsh_planes_for(n) —
    including at the power-of-two boundaries where ceil(log2) could
    plausibly straddle (it can't: log2 is exact exactly there)."""
    from streamsurfer_spark.operators.similarity import lsh_planes_for

    if n == 0:
        # SQL COUNT over an empty table is 0 → greatest(0/8, 1) = 1 →
        # log2 = 0 → clamped to N_PLANES, same as the Python guard
        assert _duck_np(0) == lsh_planes_for(0)
    else:
        assert _duck_np(n) == lsh_planes_for(n), n


# --- Unicode case-mapping boundary guard ------------------------------------

# A character is OUTSIDE the safe domain when the FULL case mapping
# (JVM/Python `str.upper()`/`str.lower()`) expands it to a different
# length than the simple 1:1 mapping DuckDB applies — the exact
# divergence class probed in round 5 ('ß' → 'SS' vs 'ẞ', 'ﬁ' → 'FI').


def _full_map_expands(ch: str) -> bool:
    return len(ch.upper()) != 1 or len(ch.lower()) != 1


def test_casemap_guard_flags_known_divergers():
    """The guard predicate must FLAG the documented divergence class —
    if 'ß' ever stops failing here, the mapping tables changed and
    FIXTURES.md §3 needs a re-probe."""
    assert _full_map_expands("ß")
    assert _full_map_expands("ﬁ")
    assert _full_map_expands("ŉ")
    # Turkish dotted-İ expands under lower() ('İ' → 'i' + combining dot)
    # — the round-5 probe only checked upper(); the guard is (correctly)
    # stricter than the probe
    assert _full_map_expands("İ")
    # and must NOT flag the probed-safe classes
    for ch in "AZaz09 ,#ı–é漢🎉Ω":
        assert not _full_map_expands(ch), ch


@pytest.mark.parametrize(
    "sf", ["sf0.001", "sf0.01", "sf0.1"]
)
def test_fixture_part_names_within_simple_casemap_domain(sf):
    """qr14/qr58 run upper()/lower() over part.p_name; the cross-engine
    hash holds only while every character maps 1:1 under full Unicode
    case mapping. A driver fixture regeneration that introduces 'ß' or a
    ligature must fail HERE, not as a confusing gate hash flip."""
    path = os.path.join(os.path.dirname(SF_DIR), sf, "part.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{path} not generated")
    con = duckdb.connect()
    try:
        names = [
            r[0]
            for r in con.sql(
                f"SELECT DISTINCT p_name FROM read_parquet('{path}')"
            ).fetchall()
        ]
    finally:
        con.close()
    bad = {
        (ch, unicodedata.name(ch, "?"))
        for name in names
        for ch in name
        if _full_map_expands(ch)
    }
    assert not bad, (
        f"part.p_name in {sf} contains full-case-mapping expanders {bad}; "
        "qr14/qr58 hashes would diverge between Spark (full mapping) and "
        "DuckDB (simple mapping) — see FIXTURES.md §3"
    )


def test_engine_casemap_divergence_is_live(spark):
    """Document the mechanism with the real engines: Spark full-maps
    'ß' → 'SS' while DuckDB simple-maps it — the reason the guard above
    exists. If either side changes, the boundary needs re-probing."""
    import pyspark.sql.functions as F

    s_val = (
        spark.range(1).select(F.upper(F.lit("straße")).alias("u")).collect()[0]["u"]
    )
    assert s_val == "STRASSE"
    con = duckdb.connect()
    try:
        d_val = con.sql("SELECT upper('straße')").fetchone()[0]
    finally:
        con.close()
    assert d_val != "STRASSE"  # simple mapping keeps ß/ẞ single-char
    assert len(d_val) == len("straße")


def test_ql10_twin_matches_at_derived_plane_scale(spark, tmp_path_factory):
    """Differential check of the derived-plane-count twin OFF the pinned-8
    regime: 3000 vectors derive 9 planes (ceil(log2(3000/8))), so both
    engines must band on 512 buckets — the scale class the old pinned-8
    oracle silently got wrong (round-5 ADVICE). Full gate-style compare:
    schema + rows + values."""
    import os

    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from streamsurfer_spark.operators.similarity import lsh_planes_for
    from streamsurfer_spark.queries import registry
    from tests.conftest import assert_matches_oracle

    n, dim = 3000, 64
    assert lsh_planes_for(n) == 9  # the point of the fixture size
    rng = np.random.default_rng(42)
    # clustered vectors so some pairs actually clear the 0.8 cosine cut
    base = rng.normal(size=(n // 10, dim))
    vecs = (
        base[np.arange(n) % (n // 10)]
        + rng.normal(scale=0.05, size=(n, dim))
    ).astype("float32")
    d = str(tmp_path_factory.mktemp("ql10big"))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
                "label": pa.array([i % 7 for i in range(n)], pa.int32()),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )
    spec = registry()["ql10_lsh_ann_pairs"]
    df = spec.spark(spark, d)
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
            f"'{os.path.join(d, 'embeddings.parquet')}')"
        )
        assert_matches_oracle(df, con, spec.oracle, name="ql10 @ derived 9 planes")
    finally:
        con.close()
    # and the result is non-degenerate (clusters produce real pairs)
    assert df.count() > 0
