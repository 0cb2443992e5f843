"""End-to-end corpus curation: the training-data pipeline composed.

One operator chaining the stages a 100 TB curation job runs —
exact dedup → quality gate → per-language corpus stats — to show the
stages COMPOSE as one declarative plan Catalyst optimizes jointly
(single pass over text for all per-doc expressions, one window for the
dedup pick, one final aggregation; no materialization between "steps").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kachess_spark.catalog import Tables
from kachess_spark.registry import query

_CURATION_ORACLE = """
WITH scored AS (
  SELECT doc_id, lang, text,
         md5(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))) AS fp,
         length(text) AS n_chars,
         len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens,
         CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
           / length(text) AS punct_ratio
  FROM documents
),
deduped AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
  FROM scored
),
kept AS (
  SELECT * FROM deduped
  WHERE rn = 1 AND n_chars BETWEEN 100 AND 20000 AND punct_ratio < 0.1
)
SELECT lang,
       count(*) AS n_docs,
       SUM(n_tokens)::BIGINT AS total_tokens,
       ROUND(AVG(n_tokens::DOUBLE), 4) AS avg_tokens,
       ROUND(CAST(SUM(CAST(punct_ratio AS DECIMAL(28,14))) AS DOUBLE)
             / count(*), 6) AS avg_punct_ratio
FROM kept
GROUP BY lang
ORDER BY lang
"""


@query("pipeline_curation_e2e", _CURATION_ORACLE)
def pipeline_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → exact dedup (keep lowest doc_id per canonical md5) →
    Gopher-style quality gate (length + punctuation) → per-language
    token accounting for the surviving corpus."""
    t = Tables(spark, sf_dir)
    text = F.col("text")
    scored = t.documents.select(
        "doc_id",
        "lang",
        F.md5(
            F.lower(F.regexp_replace(text, "[^a-zA-Z0-9 ]", ""))
        ).alias("fp"),
        F.length(text).alias("n_chars"),
        F.size(
            F.filter(F.split(text, " "), lambda w: w != "")
        ).alias("n_tokens"),
        (
            F.length(F.regexp_replace(text, "[^.,!?;:]", "")).cast("double")
            / F.length(text)
        ).alias("punct_ratio"),
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    kept = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(
            (F.col("rn") == 1)
            & F.col("n_chars").between(100, 20000)
            & (F.col("punct_ratio") < 0.1)
        )
    )
    # AVG over int tokens: exact (integer sum / count) in both engines
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.round(
                F.sum("n_tokens").cast("double") / F.count("*"), 4
            ).alias("avg_tokens"),
            F.round(
                F.sum(F.col("punct_ratio").cast("decimal(28,14)"))
                .cast("double")
                / F.count("*"),
                6,
            ).alias("avg_punct_ratio"),
        )
        .orderBy("lang")
    )
