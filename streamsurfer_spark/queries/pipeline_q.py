"""The composed curation-pipeline query (flagship, SURVEY §2.3 D capstone).

One oracle query exercising the full chained plan: language-ID → quality
gate → exact dedup → MinHash-LSH near-dup pruning → per-language token
accounting. The DuckDB oracle replays every stage (including the identical
LSH hash family), so a hash-match proves the *composition*, not just the
parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from streamsurfer_spark.operators import similarity as _sim
from streamsurfer_spark.operators import text as text_ops
from streamsurfer_spark.pipelines import (
    QUALITY_MAX_PUNCT_RATIO,
    QUALITY_MIN_TOKENS,
    curation_report,
)
from streamsurfer_spark.queries import QuerySpec
from streamsurfer_spark.queries.llm_q import _duck_stop_hits, duck_minhash_bands
from streamsurfer_spark.session import table


def qp01_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation_report(table(spark, sf_dir, "documents"))


def _qp01_sql() -> str:
    langs = list(text_ops.STOPWORDS)
    scores = ",\n       ".join(f"{_duck_stop_hits(lg)} AS s_{lg}" for lg in langs)
    cases = "\n            ".join(
        f"WHEN {' AND '.join(f's_{lg} >= s_{o}' for o in langs if o != lg)} THEN '{lg}'"
        for lg in langs[:-1]
    )
    return f"""
WITH s AS (
    SELECT doc_id, text,
       {scores},
       len(string_split(text, ' ')) AS n_tokens,
       (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE
           / length(text) AS punct_ratio
    FROM documents
),
g AS (
    SELECT doc_id, text, n_tokens,
           CASE {cases}
                ELSE '{langs[-1]}' END AS lang_pred,
           round(least(1.0, n_tokens / 100.0) * 0.5
               + least(1.0, s_en::DOUBLE / n_tokens * 5.0) * 0.5, 4) AS quality_score
    FROM s
    WHERE n_tokens >= {QUALITY_MIN_TOKENS} AND punct_ratio <= {QUALITY_MAX_PUNCT_RATIO}
),
e AS (
    SELECT doc_id, text, n_tokens, lang_pred, quality_score FROM (
        SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM g
    ) WHERE rn = 1
),
{duck_minhash_bands("e").lstrip()},
losers AS (
    SELECT DISTINCT b.doc_id
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
surv AS (
    SELECT e.* FROM e LEFT JOIN losers l ON l.doc_id = e.doc_id
    WHERE l.doc_id IS NULL
)
SELECT lang_pred,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(quality_score), 4) AS avg_quality
FROM surv GROUP BY 1 ORDER BY 1
"""


QP01_SQL = _qp01_sql()


def qp02_vector_index_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-side capstone: the vector-index BUILD as one composed plan.

    quantize → training-free budgeted centroid selection → IVF assignment
    (broadcast + map-side partial-agg argmin) → per-cluster occupancy report:
    vector count, label diversity, mean/max L2² distance to the centroid
    (exact integer distances — the same math ql14's search path runs). This
    is the operational health check a 100 TB vector index ships with:
    oversized or high-radius clusters are where ANN recall dies.
    """
    import pyspark.sql.functions as F

    from streamsurfer_spark.operators import similarity

    emb = table(spark, sf_dir, "embeddings")
    q = similarity.quantize(emb).select("vec_id", "label", "qv")
    # budgeted centroid sampling: mod == IVF_CENTROID_MOD until the count
    # would exceed IVF_MAX_CENTROIDS (the count() is the index-build pass)
    mod = similarity.centroid_modulus(q.count())
    cents = q.where(F.col("vec_id") % mod == 0).select("vec_id", "qv")
    assigned = similarity.ivf_assign(q, cents)
    cent_vecs = cents.select(
        F.col("vec_id").alias("cent_id"), F.col("qv").alias("cent_qv")
    )
    dist = F.expr(
        "aggregate(zip_with(qv, cent_qv, (x, y) -> (x - y) * (x - y)),"
        " cast(0 as bigint), (acc, v) -> acc + v)"
    )
    return (
        assigned.join(F.broadcast(cent_vecs), "cent_id")
        .withColumn("dist", dist)
        .groupBy("cent_id")
        .agg(
            F.count("*").alias("n_vectors"),
            F.countDistinct("label").alias("n_labels"),
            F.round(F.sum("dist") / F.count("*"), 2).alias("avg_dist"),
            F.max("dist").alias("max_dist"),
        )
        .orderBy("cent_id")
    )


QP02_SQL = f"""
WITH q AS (
    SELECT vec_id, label,
           [cast(round(x::DOUBLE * {_sim.QUANT_SCALE}) AS BIGINT) for x in embedding] AS qv
    FROM embeddings
),
qe AS (SELECT vec_id, unnest(range(len(qv))) AS pos, unnest(qv) AS v FROM q),
cents AS (SELECT vec_id AS cent_id, pos, v FROM qe
          WHERE vec_id % {_sim.IVF_CENTROID_MOD} = 0),
ad AS (
    SELECT qe.vec_id, c.cent_id, sum((qe.v - c.v) * (qe.v - c.v)) AS dist
    FROM qe JOIN cents c ON c.pos = qe.pos GROUP BY 1, 2
),
assign AS (
    SELECT vec_id, cent_id, dist FROM (
        SELECT vec_id, cent_id, dist,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, cent_id) AS rn
        FROM ad
    ) WHERE rn = 1
)
SELECT a.cent_id,
       count(*) AS n_vectors,
       CAST(count(DISTINCT q.label) AS BIGINT) AS n_labels,
       round(CAST(sum(a.dist) AS BIGINT) * 1.0 / count(*), 2) AS avg_dist,
       CAST(max(a.dist) AS BIGINT) AS max_dist
FROM assign a JOIN q ON q.vec_id = a.vec_id
GROUP BY 1 ORDER BY 1
"""


QUERIES: dict[str, QuerySpec] = {
    "qp01_curation_report": QuerySpec(
        qp01_curation_report, QP01_SQL, "composed curation pipeline (capstone)"
    ),
    "qp02_vector_index_report": QuerySpec(
        qp02_vector_index_report, QP02_SQL, "composed vector-index build report (capstone 2)"
    ),
}
