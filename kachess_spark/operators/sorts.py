"""Sorts / limits / distribution (SURVEY.md §2.6).

Reference constructs: ORDER BY / SORT BY [ASC|DESC], LIMIT n, TOP n,
DISTRIBUTE BY / CLUSTER BY (Bingql.g4:1114-1125,701-703).

Scale notes: a global ORDER BY is a range-partitioned sort (sampled
boundaries) — fine for top-k with LIMIT because Spark plans
TakeOrderedAndProject (no full sort materialization).  SORT BY /
CLUSTER BY avoid the global sort entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kachess_spark.catalog import Tables
from kachess_spark.registry import query


@query(
    "sort_limit_topn",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def sort_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ... LIMIT n (and the TOP n / LIMIT equivalence) —
    planned as TakeOrderedAndProject, never a full global sort."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@query(
    "sort_multi_key",
    oracle="""
    SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber
    FROM lineitem
    WHERE l_quantity > 49.5
    ORDER BY l_returnflag ASC, l_linestatus DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY with mixed ASC/DESC."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.where(F.col("l_quantity") > 49.5)
        .select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber")
        .orderBy(
            F.col("l_returnflag").asc(),
            F.col("l_linestatus").desc(),
            "l_orderkey",
            "l_linenumber",
        )
        .limit(100)
    )


@query(
    "sort_cluster_by",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
    """,
)
def sort_cluster_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTE BY + SORT BY (= CLUSTER BY): repartition on the key,
    sort only within partitions — no global merge.  Result *content*
    equals the plain scan (oracle compares order-insensitively); the
    point is the partitioning primitive used by bucketed writes."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.where(F.col("l_shipdate") >= "1998-01-01")
        .select("l_suppkey", "l_orderkey", "l_linenumber")
        .repartition("l_suppkey")
        .sortWithinPartitions("l_suppkey", "l_orderkey", "l_linenumber")
    )


_NULLS_ORDER_ORACLE = """
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN NULL ELSE n_chars END AS k
      FROM documents WHERE doc_id < 60
    )
    SELECT doc_id, k,
           ROW_NUMBER() OVER (ORDER BY k ASC NULLS FIRST, doc_id) AS rn_nf,
           ROW_NUMBER() OVER (ORDER BY k DESC NULLS LAST, doc_id) AS rn_nl
    FROM d
    ORDER BY doc_id
"""


@query("sort_nulls_ordering", _NULLS_ORDER_ORACLE)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST/LAST: engines disagree on the default (Spark
    sorts nulls first ascending, DuckDB last) — portable queries always
    pin it.  Row numbers encode the ordering into checkable values."""
    t = Tables(spark, sf_dir)
    d = t.documents.where(F.col("doc_id") < 60).select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, None)
        .otherwise(F.col("n_chars"))
        .alias("k"),
    )
    w_nf = Window.orderBy(F.col("k").asc_nulls_first(), F.col("doc_id"))
    w_nl = Window.orderBy(F.col("k").desc_nulls_last(), F.col("doc_id"))
    return d.select(
        "doc_id",
        "k",
        F.row_number().over(w_nf).alias("rn_nf"),
        F.row_number().over(w_nl).alias("rn_nl"),
    ).orderBy("doc_id")
