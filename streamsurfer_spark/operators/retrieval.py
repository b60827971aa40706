"""BM25 lexical retrieval over a document corpus (SURVEY §2.3 D extension).

No counterpart in the reference (/root/reference/main.go:1-312 — SURVEY
§2.2); engine-side capability: score documents against a small fixed query
term set with Okapi BM25 (Robertson & Walker; the robust non-negative idf
variant popularized by Lucene: ln(1 + (N - df + 0.5)/(df + 0.5))) and take
the global top-k.

Scale design (100 TB): the query term set is a tiny literal, so per-term
term frequencies are computed with ``size(filter(tokens, t -> t = term))``
— pure whole-stage-codegen column expressions, NO explode and NO per-term
shuffle. Corpus statistics (N, avgdl, per-term df) collapse to ONE 1-row
aggregate that broadcasts back over the scan, and the final top-k is
``ORDER BY ... LIMIT k`` which Spark executes as TakeOrderedAndProject —
per-partition heaps of size k, never a global sort. Net: one scan, one
1-row aggregate, one top-k collect of k rows.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from streamsurfer_spark.functions.rounding import scaled_round
from streamsurfer_spark.operators.text import token_count, tokens

BM25_K1 = 1.2
BM25_B = 0.75


def _tf(term: str) -> Column:
    """Term frequency as a codegen expression over the token array."""
    return F.size(F.filter(tokens(), lambda t: t == F.lit(term))).cast("long")


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k documents by BM25 score for a fixed query term set.

    Returns (doc_id, n_tokens, per-term tf columns, score) ordered by
    score DESC with doc_id ASC as the deterministic tiebreak. Documents
    matching no query term score 0 and are filtered out before the top-k.
    """
    if not query_terms:
        raise ValueError("bm25_topk requires at least one query term")
    if len(set(query_terms)) != len(query_terms):
        # a dict keyed on the term would silently collapse repeats to one
        # contribution (BM25 qtf semantics would weight them) and emit
        # duplicate tf_{term} output columns — reject loudly (r7 review)
        raise ValueError("bm25_topk query terms must be distinct")
    tf_cols = {t: f"tf_{i}" for i, t in enumerate(query_terms)}

    scored = docs.select(
        "doc_id",
        token_count().alias("dl"),
        *[_tf(t).alias(c) for t, c in tf_cols.items()],
    )

    # ONE 1-row corpus-stats aggregate (N, avgdl, df per term), broadcast
    # back over the per-document frame — df of term t = docs with tf > 0
    stats = scored.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(c) > 0).cast("long")).alias(f"df_{c}")
            for c in tf_cols.values()
        ],
    )
    with_stats = scored.join(F.broadcast(stats))

    def idf(c: str) -> Column:
        df_ = F.col(f"df_{c}")
        return F.log(
            F.lit(1.0)
            + (F.col("n_docs") - df_ + F.lit(0.5)) / (df_ + F.lit(0.5))
        )

    def term_score(c: str) -> Column:
        tf_ = F.col(c).cast("double")
        norm = F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
        )
        return idf(c) * tf_ * F.lit(k1 + 1.0) / (tf_ + norm)

    score = sum(
        (term_score(c) for c in tf_cols.values()), start=F.lit(0.0)
    )
    return (
        with_stats.select(
            "doc_id",
            F.col("dl").alias("n_tokens"),
            *[F.col(c).alias(f"tf_{t}") for t, c in tf_cols.items()],
            # tie-proof final round (r7 conversion, ql32/ql42 twins in
            # lockstep)
            scaled_round(score).alias("score"),
        )
        # keep docs matching ≥1 term — NOT score > 0 on the ROUNDED value,
        # which silently dropped genuine matches whose score rounds below
        # 0.00005 (the common case for a term present in nearly every doc
        # of a large corpus: idf ≈ 0.5/N — r7 review); twins in lockstep
        .where(
            F.greatest(*[F.col(f"tf_{t}") for t in tf_cols]) > 0
            if len(tf_cols) > 1
            else F.col(f"tf_{next(iter(tf_cols))}") > 0
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
