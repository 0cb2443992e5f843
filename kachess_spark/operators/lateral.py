"""Lateral views / explode (SURVEY.md §2.3 LATERAL VIEW, §2.10 UDTF).

Reference constructs: LATERAL VIEW [OUTER] fn(col) alias AS c1,c2
(Bingql.g4:1001-1011; visitor visitLateral_view_clause
SqlMetaDataExtractor.java:794-846 — creates a LATERAL_VIEW dataset
whose columns share the function-argument parents).

explode/posexplode/inline are row-multiplying generators: at 100 TB the
rule is filter + project *before* the generate so the multiplication
happens on the narrowest possible rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kachess_spark.catalog import Tables, register_views
from kachess_spark.registry import query


@query(
    "lateral_posexplode",
    oracle="""
    SELECT vec_id,
           generate_subscripts(embedding, 1) - 1 AS pos,
           CAST(unnest(embedding) AS DOUBLE)     AS val
    FROM embeddings
    WHERE vec_id < 20
    """,
)
def lateral_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode over the embeddings array column (UDTF surface)."""
    t = Tables(spark, sf_dir)
    return (
        t.embeddings.where(F.col("vec_id") < 20)
        .select("vec_id", F.posexplode("embedding").alias("pos", "v"))
        .select("vec_id", "pos", F.col("v").cast("double").alias("val"))
    )


@query(
    "lateral_view_sql_words",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (
      SELECT unnest(string_split(lower(text), ' ')) AS word
      FROM documents
    )
    WHERE length(word) >= 10
    GROUP BY word
    HAVING COUNT(*) >= 3
    """,
)
def lateral_view_sql_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode(split(...)) — the Hive word-count idiom, run
    through Spark SQL's actual LATERAL VIEW syntax."""
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        SELECT word, COUNT(*) AS n
        FROM documents
        LATERAL VIEW explode(split(lower(text), ' ')) w AS word
        WHERE length(word) >= 10
        GROUP BY word
        HAVING COUNT(*) >= 3
        """
    )


@query(
    "lateral_explode_outer",
    oracle="""
    SELECT doc_id, tok
    FROM (
      SELECT doc_id,
             CASE WHEN lang <> 'en' THEN [NULL]
                  ELSE string_split(substring(text, 1, 40), ' ') END AS toks
      FROM documents
      WHERE doc_id < 40
    ), UNNEST(toks) AS u(tok)
    """,
)
def lateral_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW OUTER: rows with NULL arrays survive with NULL output
    (explode_outer).  Oracle emulates OUTER via a [NULL] sentinel list."""
    t = Tables(spark, sf_dir)
    toks = F.when(
        F.col("lang") != "en", F.lit(None).cast("array<string>")
    ).otherwise(F.split(F.substring(F.col("text"), 1, 40), " "))
    return (
        t.documents.where(F.col("doc_id") < 40)
        .select("doc_id", toks.alias("toks"))
        .select("doc_id", F.explode_outer("toks").alias("tok"))
    )


@query(
    "lateral_inline_structs",
    oracle="""
    SELECT vec_id, u.pos AS pos, u.bucket AS bucket
    FROM (
      SELECT vec_id,
             unnest(list_transform(
               range(1, len(embedding) + 1),
               i -> {'pos': i - 1,
                     'bucket': CAST(floor(embedding[i] * 4) AS INT)}
             )) AS u
      FROM embeddings
      WHERE vec_id < 10
    )
    """,
)
def lateral_inline_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inline(array<struct>) — the nested-struct explode of reference test
    case 0004 (col402x array<struct<...>>), built on the fly here."""
    t = Tables(spark, sf_dir)
    structs = F.expr(
        """
        transform(embedding, (x, i) ->
          named_struct('pos', i, 'bucket', CAST(floor(x * 4) AS INT)))
        """
    )
    return (
        t.embeddings.where(F.col("vec_id") < 10)
        .select("vec_id", F.inline(structs))
    )
