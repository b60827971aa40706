"""The composed curation-pipeline query (flagship, SURVEY §2.3 D capstone).

One oracle query exercising the full chained plan: language-ID → quality
gate → exact dedup → MinHash-LSH near-dup pruning → per-language token
accounting. The DuckDB oracle replays every stage (including the identical
LSH hash family), so a hash-match proves the *composition*, not just the
parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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

QUERIES: dict[str, QuerySpec] = {
    "qp01_curation_report": QuerySpec(
        qp01_curation_report, QP01_SQL, "composed curation pipeline (capstone)"
    ),
}
