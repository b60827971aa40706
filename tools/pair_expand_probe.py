"""A/B probe for the r13 grouped_pair_expand rewrite (guide §2.4).

For each capped-self-join family rewritten to grouped_pair_expand —
cosine blocks, LSH buckets, SimHash bands, shingle inverted index —
builds the OLD (self-join) form inline and the NEW (current module)
form, asserts the outputs are row-identical (sorted full-row compare),
and times both with the noop sink (warm, best-of-N).

    python tools/pair_expand_probe.py [sf_dir] [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import Window

from streamsurfer_spark.functions.rounding import scaled_round
from streamsurfer_spark.operators import dedup, similarity
from streamsurfer_spark.operators.similarity import checked_dot, norm_sql
from streamsurfer_spark.session import get_spark, table


def old_cosine_pairs(df, threshold, block_col="label", vec_col="embedding",
                     id_col="vec_id", block_cap=similarity.COSINE_BLOCK_CAP):
    w = Window.partitionBy("_blk").orderBy(id_col)
    normed = (
        df.select(
            F.col(id_col), F.col(block_col).alias("_blk"), F.col(vec_col),
            F.expr(norm_sql(vec_col)).alias("_nrm"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= block_cap)
        .drop("_rn")
    )
    a = normed.select(F.col(id_col).alias("id_a"), "_blk",
                      F.col(vec_col).alias("_va"), F.col("_nrm").alias("_na"))
    b = normed.select(F.col(id_col).alias("id_b"), F.col("_blk").alias("_blk_b"),
                      F.col(vec_col).alias("_vb"), F.col("_nrm").alias("_nb"))
    dot = checked_dot("_va", "_vb")
    return (
        a.join(b, (F.col("_blk") == F.col("_blk_b")) & (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b",
                scaled_round(F.try_divide(dot, F.col("_na") * F.col("_nb"))).alias("sim"))
        .where(F.col("sim") >= threshold)
    )


def old_lsh_near_pairs(df, threshold=0.8, vec_col="embedding", id_col="vec_id",
                       bucket_cap=similarity.LSH_ANN_BUCKET_CAP, n_planes=None):
    if n_planes is None:
        n_planes = similarity.lsh_planes_for(df.count())
    b = similarity.lsh_buckets(df, vec_col, id_col, n_planes=n_planes)
    w = Window.partitionBy("bucket").orderBy(id_col)
    b = (
        b.withColumn("_nrm", F.expr(norm_sql(vec_col)))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= bucket_cap)
        .drop("_rn")
    )
    a, c = b.alias("a"), b.alias("b")
    dot = checked_dot(f"a.{vec_col}", f"b.{vec_col}")
    norms = F.col("a._nrm") * F.col("b._nrm")
    return (
        a.join(c, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                scaled_round(F.try_divide(dot, norms)).alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


def old_shingle_intersection(df, text_col, id_col, max_shingle_docs):
    sh = dedup.hashed_shingle_set(df, text_col, id_col)
    wdf = Window.partitionBy("shingle")
    wdoc = Window.partitionBy(id_col)
    sh = (
        sh.withColumn("n_sh", F.count("*").over(wdoc))
        .withColumn("_df", F.count("*").over(wdf))
        .where(F.col("_df") <= max_shingle_docs)
        .drop("_df")
    )
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"),
                 F.col(f"b.{id_col}").alias("doc_b"),
                 F.col("a.n_sh").alias("n_a"),
                 F.col("b.n_sh").alias("n_b"))
        .agg(F.count("*").alias("n_inter"))
        .select("doc_a", "doc_b", "n_inter", "n_a", "n_b")
    )


def old_containment(df, threshold=0.8):
    scored = (
        old_shingle_intersection(df, "text", "doc_id", dedup.NGRAM_SHINGLE_DF_CAP)
        .withColumn("cont_a_in_b",
                    scaled_round(F.col("n_inter").cast("double") / F.col("n_a")))
        .withColumn("cont_b_in_a",
                    scaled_round(F.col("n_inter").cast("double") / F.col("n_b")))
    )
    return scored.where(
        F.greatest(F.col("cont_a_in_b"), F.col("cont_b_in_a")) >= threshold
    ).select(
        "doc_a", "doc_b", "n_inter", "cont_a_in_b", "cont_b_in_a",
        F.when(F.col("cont_a_in_b") >= F.col("cont_b_in_a"), F.col("doc_a"))
        .otherwise(F.col("doc_b")).alias("contained_id"),
    )


def old_simhash_hamming(df, k=dedup.SIMHAM_K, text_col="text", id_col="doc_id"):
    bands = F.array(*[F.lit(i) for i in range(k + 1)])
    sigs = dedup.simhash(df, text_col=text_col, id_col=id_col)
    banded = (
        sigs.select(F.col(id_col), "simhash", F.explode(bands).alias("band"))
        .withColumn("bv", F.expr(
            f"shiftright(simhash, {dedup.SIMHAM_BAND_BITS} * band)"
            f" & {(1 << dedup.SIMHAM_BAND_BITS) - 1}"))
    )
    w = Window.partitionBy("band", "bv").orderBy(id_col)
    capped = (
        banded.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= dedup.SIMHAM_BAND_CAP)
        .drop("_rn")
    )
    a = capped.select(F.col(id_col).alias("doc_a"),
                      F.col("simhash").alias("sig_a"), "band", "bv")
    b = capped.select(F.col(id_col).alias("doc_b"),
                      F.col("simhash").alias("sig_b"), "band", "bv")
    cand = (a.join(b, ["band", "bv"]).where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "sig_a", "sig_b").distinct())
    ham = F.expr("bit_count(sig_a ^ sig_b)").cast("int")
    return cand.withColumn("hamming", ham).where(F.col("hamming") <= k).select(
        "doc_a", "doc_b", "hamming")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def rows_sorted(df):
    cols = sorted(df.columns)
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def bench_pair(spark, name, old_df, new_df, n_reps):
    ro, rn = rows_sorted(old_df), rows_sorted(new_df)
    same = ro == rn
    print(f"{name}: rows old={len(ro)} new={len(rn)} identical={same}")
    assert same, f"{name}: OUTPUT DIVERGED"
    for tag, d in (("old", old_df), ("new", new_df)):
        noop(d)  # warmup
        ts = []
        for _ in range(n_reps):
            t0 = time.monotonic()
            spark.sparkContext.setJobDescription(f"probe {name} {tag}")
            noop(d)
            ts.append(time.monotonic() - t0)
        print(f"  {name} {tag}: best={min(ts):.3f}s runs={[round(t,3) for t in ts]}")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("pair-expand-probe")
    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    from streamsurfer_spark.queries.llm_q import NEAR_DUP_THRESHOLD, CONTAIN_THRESHOLD

    bench_pair(spark, "cosine_near_dup",
               old_cosine_pairs(emb, NEAR_DUP_THRESHOLD),
               similarity.cosine_near_dup_pairs(emb, NEAR_DUP_THRESHOLD), n_reps)
    bench_pair(spark, "lsh_near_pairs",
               old_lsh_near_pairs(emb, threshold=0.8),
               similarity.lsh_near_pairs(emb, threshold=0.8), n_reps)
    bench_pair(spark, "containment",
               old_containment(docs, CONTAIN_THRESHOLD),
               dedup.ngram_containment_pairs(docs, threshold=CONTAIN_THRESHOLD), n_reps)
    bench_pair(spark, "simhash_hamming",
               old_simhash_hamming(docs),
               dedup.simhash_hamming_pairs(docs), n_reps)
    spark.stop()


if __name__ == "__main__":
    main()
