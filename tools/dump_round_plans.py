"""Dump per-query formatted plans for an optimization round.

Writes plans/r{N}/<query>_<tag>.txt (one file per bench query) with the
`.explain("formatted")` output — the before/after evidence an optimization
round commits alongside OPTIMIZATION_r{N}.md. Pre-execution AQE plans
(isFinalPlan=false), same caveat as tools/dump_plans.py.

    python tools/dump_round_plans.py before          # all bench queries
    python tools/dump_round_plans.py after qp04_quality_dashboard ...

The round number is fixed here (bump per round).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROUND = 14


def main() -> None:
    from bench import BENCH_QUERIES
    from streamsurfer_spark.plans.inspect import formatted_plan
    from streamsurfer_spark.queries import registry
    from streamsurfer_spark.session import get_spark

    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(BENCH_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(root, "plans", f"r{ROUND}")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("plan-dump")
    reg = registry()
    for name in names:
        df = reg[name].spark(spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — {tag} (sf_dir={os.path.basename(sf_dir)})\n")
            f.write(formatted_plan(df).strip() + "\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
