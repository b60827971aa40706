"""Interleaved A/B: r13 monolithic qp07 / manifest qp07b vs the r14
checkpointed shared implementation. Old forms are inlined verbatim from
git history (commit b338ee3 tree) so both run in ONE warm session,
alternating — comparatively valid even on a degraded host (the r13
protocol). Also compares collected output row-for-row.

    python tools/qp07_ab_probe.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from streamsurfer_spark.operators import text as text_ops
from streamsurfer_spark.queries.llm_q import MIX_FACTOR
from streamsurfer_spark.queries.pipeline_q import (
    qp07_training_mix,
    qp07b_training_mix_manifest,
)
from streamsurfer_spark.session import get_spark, table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_qp07(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    kept_ids = docs.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    base = docs.join(kept_ids.select("doc_id"), "doc_id")
    ds = text_ops.dsir_importance(base).where(F.col("logratio_micro") > 0)
    base2 = base.join(ds.select("doc_id"), "doc_id")
    sur = text_ops.unigram_surprisal(base2)
    scored = sur.join(base2.select("doc_id", "lang", "source"), "doc_id")
    w = Window.partitionBy("lang").orderBy("avg_surprisal_nats", "doc_id")
    ranked = scored.select(
        "source",
        "n_tokens",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("lang")).alias("n"),
    )
    keep = ranked.where(F.col("rn") * 3 <= F.col("n") * 2)
    return (
        keep.groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.least(
                F.col("n_docs"),
                F.floor(F.sqrt(F.col("n_docs")) * MIX_FACTOR).cast("long"),
            ).alias("target_n"),
        )
        .orderBy("source")
    )


def old_qp07b(spark, sf_dir):
    from streamsurfer_spark.scratch import scratch_dir

    root = scratch_dir("qp07b_old_manifests_")

    def checkpoint_manifest(df: DataFrame, name: str) -> DataFrame:
        path = os.path.join(root, name)
        df.select("doc_id").write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    docs = table(spark, sf_dir, "documents")
    m1 = checkpoint_manifest(
        docs.groupBy(F.md5("text").alias("h")).agg(F.min("doc_id").alias("doc_id")),
        "stage1_exact_dedup",
    )
    base = docs.join(m1, "doc_id")
    m2 = checkpoint_manifest(
        text_ops.dsir_importance(base).where(F.col("logratio_micro") > 0),
        "stage2_dsir_gate",
    )
    base2 = docs.join(m2, "doc_id")
    sur = text_ops.unigram_surprisal(base2)
    scored = sur.join(base2.select("doc_id", "lang", "source"), "doc_id")
    w = Window.partitionBy("lang").orderBy("avg_surprisal_nats", "doc_id")
    ranked = scored.select(
        "doc_id",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("lang")).alias("n"),
    )
    m3 = checkpoint_manifest(
        ranked.where(F.col("rn") * 3 <= F.col("n") * 2), "stage3_perplexity_cut"
    )
    kept = docs.join(m3, "doc_id")
    toks = kept.select(
        "doc_id", "source", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    return (
        toks.groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
        .select(
            "source",
            "n_docs",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.least(
                F.col("n_docs"),
                F.floor(F.sqrt(F.col("n_docs")) * MIX_FACTOR).cast("long"),
            ).alias("target_n"),
        )
        .orderBy("source")
    )


def run(fn, spark) -> float:
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("qp07-ab-probe")
    # warm
    run(old_qp07, spark)

    # parity first: collected rows identical old vs new
    for old, new, tag in (
        (old_qp07, qp07_training_mix, "qp07"),
        (old_qp07b, qp07b_training_mix_manifest, "qp07b"),
    ):
        a = [tuple(r) for r in old(spark, SF_DIR).collect()]
        b = [tuple(r) for r in new(spark, SF_DIR).collect()]
        print(f"{tag} parity: {'IDENTICAL' if a == b else 'MISMATCH'} ({len(a)} rows)")
        assert a == b

    for old, new, tag in (
        (old_qp07, qp07_training_mix, "qp07"),
        (old_qp07b, qp07b_training_mix_manifest, "qp07b"),
    ):
        olds, news = [], []
        for _ in range(reps):
            olds.append(run(old, spark))
            news.append(run(new, spark))
        print(
            f"{tag}: old best-of-{reps} {min(olds):.3f}s {sorted(round(x,3) for x in olds)}"
            f" | new best-of-{reps} {min(news):.3f}s {sorted(round(x,3) for x in news)}"
            f" | speedup {min(olds)/min(news):.2f}x"
        )
    spark.stop()


if __name__ == "__main__":
    main()
