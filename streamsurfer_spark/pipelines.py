"""Composed training-data curation pipeline (the engine's flagship).

Chains the LLM-pipeline operators into the shape a pretraining data run
actually uses — language-ID → quality gate → exact dedup → near-dup
pruning → token accounting — as ONE declarative plan, so Catalyst fuses
the per-row stages (language scores, quality features, hashes are all
computed in the same codegen pass over each document) and the only
shuffles are the two dedup aggregations.

Stage order is the cheap-filter-first discipline: per-row gates (language,
quality) cut the corpus before anything that shuffles; exact dedup (one
groupBy) runs before MinHash-LSH (explode + join) so the expensive stage
sees the smallest possible input. At 100 TB each stage's selectivity
compounds — the LSH stage typically sees <half the raw bytes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from streamsurfer_spark.functions.rounding import scaled_round
from streamsurfer_spark.operators import dedup
from streamsurfer_spark.operators import text as text_ops

QUALITY_MIN_TOKENS = 20
QUALITY_MAX_PUNCT_RATIO = 0.2


def curate(docs: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """Full curation pass over a `documents`-shaped table.

    Returns the surviving corpus with provenance columns:
    (doc_id, lang_pred, n_tokens, quality_score, is_canonical), plus any
    input columns named in ``carry`` — the whole chain is per-row gates
    and windows over the full rows, so carrying a column is free, while
    re-joining the corpus afterward to recover it costs a corpus-sized
    self-join on doc_id (the qp05 r13 fix — guide §2.4).
    """
    pred = text_ops.predict_language(text_ops.language_scores("text"))
    tc = text_ops.token_count("text")
    n_chars = F.length("text")
    punct = n_chars - F.length(F.regexp_replace("text", r"[.,!?;:]", ""))
    stop_en = text_ops.stopword_hits("text", "en")
    quality = scaled_round(
        F.least(F.lit(1.0), tc.cast("double") / 100.0) * 0.5
        + F.least(F.lit(1.0), stop_en.cast("double") / tc * 5.0) * 0.5
    )

    # stage 1+2: per-row gates (one codegen pass, no shuffle)
    gated = (
        docs.withColumn("lang_pred", pred)
        .withColumn("n_tokens", tc)
        .withColumn("quality_score", quality)
        .withColumn("punct_ratio", punct.cast("double") / n_chars)
        .where(
            (F.col("n_tokens") >= QUALITY_MIN_TOKENS)
            & (F.col("punct_ratio") <= QUALITY_MAX_PUNCT_RATIO)
        )
    )

    # stage 3: exact dedup — keep the smallest doc_id per content hash
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    exact = gated.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")

    # stage 4: near-dup pruning — drop the higher doc_id of every LSH
    # candidate pair (canonical = lowest id in its near-dup cluster, per
    # the pair relation; transitive closure is a judged non-goal at this
    # stage — production runs connected components on the pair table).
    # r13 (guide §2.4): a doc is a pair's doc_b iff some bucket ranks it
    # [2, cap] under the SAME (band, band_key) window lsh_candidate_pairs
    # caps with — its partner is that bucket's rank-1 doc — so the loser
    # set falls out of the banding window directly. The old shape built
    # the full pair expansion (collect_list + explode + pair groupBy +
    # distinct) and LEFT ANTI-joined it back to `exact`, executing the
    # exact subtree (scan + gates + md5 window) a second time; now the
    # survivor columns ride the map-only band chain (lsh_bands carry) and
    # one per-doc groupBy replaces expansion + anti-join. Docs ranked past
    # the cap in EVERY bucket produce no pair under either shape — the
    # [2, cap] flag (not a bare rn >= 2) keeps that exact semantics.
    out_cols = ["doc_id", "lang_pred", "n_tokens", "quality_score", *carry]
    bands = dedup.lsh_bands(
        dedup.minhash_signature(dedup.with_shingles(exact)),
        carry=out_cols[1:],
    )
    wb = Window.partitionBy("band", "band_key").orderBy("doc_id")
    survivors = (
        bands.withColumn("_rn", F.row_number().over(wb))
        .groupBy(*out_cols)
        .agg(
            F.max(
                (
                    (F.col("_rn") >= 2)
                    & (F.col("_rn") <= dedup.LSH_BUCKET_CAP)
                ).cast("int")
            ).alias("_loser")
        )
        .where(F.col("_loser") == 0)
    )

    return survivors.select(
        "doc_id",
        "lang_pred",
        "n_tokens",
        F.col("quality_score"),
        F.lit(True).alias("is_canonical"),
        *[F.col(c) for c in carry],
    )


def curation_report(docs: DataFrame) -> DataFrame:
    """Aggregate curation outcome per predicted language: corpus size and
    token budget after all gates — the number a data-mix planner consumes."""
    return (
        curate(docs)
        .groupBy("lang_pred")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            # exact mean (r9, the qr26 Welford-drift lesson): the score
            # is a ×1e-4 grid value, so round(score·1e4) recovers its
            # exact integer; sum BIGINT, divide once — identical to the
            # qp04 q4 pattern, partition-order-independent
            scaled_round(
                F.sum(F.expr("cast(round(quality_score * 10000) as bigint)"))
                / F.count("*")
                / F.lit(10_000.0)
            ).alias("avg_quality"),
        )
        .orderBy("lang_pred")
    )
