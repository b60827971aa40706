"""Degenerate-fixture differential sweep: run every oracle-bearing
registry query on a fixture where EVERY table has its real schema but
ZERO rows (mode `empty`, default) or exactly ONE row (mode `one`), and
compare Spark vs DuckDB exactly as the gate does.

Why: the round-4 ADVICE found qt12 returning NULL where its twin returned
0 — a divergence invisible at any populated scale because the fixture
always has purchases. Empty inputs are the densest source of this class
(sum/min/max over no rows, NULL vs 0 coalescing, empty-array edge cases),
so sweeping the whole registry against an empty fixture flushes out every
instance at once. qr55_empty_result pinned ONE query's empty behavior;
this sweeps all of them.

Mode `one` probes a different divergence class: single-sample variance
(NULL vs NaN), degenerate windows and percentiles, self-joins with no
partner rows.

Usage: python tools/empty_sweep.py [dstdir] [empty|one]
Prints one line per query: OK / MISMATCH / SKIP (structural) / ERR.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.001"

# Known cross-ENGINE divergences on empty input, by design outside the
# gate's populated-fixture contract. Each entry documents why; everything
# else must compare clean. (FIXTURES.md §3 records the class.)
_GSETS = (
    "Spark emits NO rows for rollup/cube/grouping-sets over empty input "
    "(even the () set); DuckDB emits the grand-total row. Engine-level "
    "semantics — Spark-first engine adopts Spark's; populated fixtures "
    "are unaffected"
)
STRUCTURAL = {
    "qr09_rollup": _GSETS,
    "qr09b_cube": _GSETS,
    "qr51_grouping_sets": _GSETS,
}


def build_fixture(dst: str, mode: str) -> None:
    import duckdb

    from streamsurfer_spark.session import TABLES

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src_path = os.path.join(SRC, f"{t}.parquet")
        if not os.path.exists(src_path):
            continue
        pred = "WHERE 1=0" if mode == "empty" else "LIMIT 1"
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src_path}') {pred})"
            f" TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )


def main() -> None:
    import duckdb

    from streamsurfer_spark.queries import registry
    from streamsurfer_spark.session import TABLES, get_spark
    from tests.conftest import canonicalize

    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfempty"
    mode = sys.argv[2] if len(sys.argv) > 2 else "empty"
    build_fixture(dst, mode)

    spark = get_spark("empty-sweep", shuffle_partitions=4)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(dst, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    ok = mism = err = skip = 0
    for name, spec in sorted(registry().items()):
        if spec.oracle is None:
            continue
        if name in STRUCTURAL:
            print(f"{name}: SKIP ({STRUCTURAL[name]})", flush=True)
            skip += 1
            continue
        try:
            df = spec.spark(spark, dst)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
            rel = con.sql(spec.oracle)
            d_cols = list(rel.columns)
            d_rows = [tuple(r) for r in rel.fetchall()]
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ERR {type(ex).__name__}: {str(ex)[:160]}", flush=True)
            err += 1
            continue
        _, sc = canonicalize(s_cols, s_rows)
        _, dc = canonicalize(d_cols, d_rows)
        if sorted(s_cols) != sorted(d_cols) or sc != dc:
            print(
                f"{name}: MISMATCH spark={len(s_rows)}r duck={len(d_rows)}r"
                f" spark_head={sc[:2]} duck_head={dc[:2]}",
                flush=True,
            )
            mism += 1
        else:
            print(f"{name}: OK ({len(s_rows)}r)", flush=True)
            ok += 1
    print(f"\n{mode} sweep: {ok} OK, {mism} MISMATCH, {err} ERR, {skip} SKIP")


if __name__ == "__main__":
    try:
        main()
    except Exception:
        traceback.print_exc()
        sys.exit(1)
