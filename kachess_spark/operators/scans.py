"""Scans / sources (SURVEY.md §2.1).

Reference constructs: FROM table [AS alias], FROM (subquery) a,
FROM (VALUES ...) t, TABLESAMPLE  (Bingql.g4:1019-1064,1023-1027;
visitor SqlMetaDataExtractor.java:493-529).

Spark-first notes: the parquet scan must show PushedFilters + a pruned
ReadSchema in `.explain("formatted")` — every query here filters and
projects *before* anything else so Catalyst pushes both into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kachess_spark.catalog import Tables
from kachess_spark.registry import query


@query(
    "scan_project_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1995-04-01'
      AND l_quantity > 45
    """,
)
def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table scan + projection + filter; pushdown-friendly.

    Per-row double arithmetic only (IEEE-identical to the oracle).
    """
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-04-01").cast("timestamp"))
            & (F.col("l_quantity") > 45)
        ).select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@query(
    "scan_subquery_alias",
    oracle="""
    SELECT big.o_orderpriority, COUNT(*) AS n_orders
    FROM (SELECT o_orderpriority, o_totalprice
          FROM orders WHERE o_totalprice > 200000) AS big
    GROUP BY big.o_orderpriority
    """,
)
def scan_subquery_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FROM (subquery) alias — nested DataFrame expression + .alias."""
    t = Tables(spark, sf_dir)
    big = (
        t.orders.where(F.col("o_totalprice") > 200000)
        .select("o_orderpriority", "o_totalprice")
        .alias("big")
    )
    return big.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


@query(
    "scan_values_inline",
    oracle="""
    SELECT v.region_code, v.region_desc
    FROM (VALUES (0, 'AFRICA-Z'), (1, 'AMERICA-Z'), (2, 'ASIA-Z'))
         AS v(region_code, region_desc)
    """,
)
def scan_values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FROM (VALUES ...) t — inline relation (spark.createDataFrame)."""
    return spark.createDataFrame(
        [(0, "AFRICA-Z"), (1, "AMERICA-Z"), (2, "ASIA-Z")],
        "region_code int, region_desc string",
    )


@query(
    "scan_bucket_sample",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderkey % 16 = 3
    """,
)
def scan_bucket_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE(BUCKET 1 OUT OF 16) semantics, made deterministic.

    Hive bucket-sampling hashes the bucket column and keeps one residue
    class; keying on the integer column itself gives the same semantics
    with a portable 'hash'.  (True df.sample lives in scan_tablesample.)
    """
    t = Tables(spark, sf_dir)
    return t.orders.where(F.col("o_orderkey") % 16 == 3).select(
        "o_orderkey", "o_totalprice"
    )


@query("scan_tablesample")  # rows-only: engine-native sampling is seeded per-engine
def scan_tablesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True TABLESAMPLE (n PERCENT): df.sample with a fixed seed.

    Deterministic within Spark, but no cross-engine oracle exists
    (DuckDB's sampler draws differently), so this is a rows-only check.
    """
    t = Tables(spark, sf_dir)
    return t.orders.sample(fraction=0.1, seed=42).select("o_orderkey", "o_custkey")


_VIEW_ORACLE = """
    SELECT r.r_name, count(*) AS n_nations
    FROM region r JOIN nation n ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name ORDER BY r.r_name
"""


@query("scan_view_sql", _VIEW_ORACLE)
def scan_view_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE VIEW surface executed: register temp views, query them with
    SQL text (`spark.sql`) — the §2.1 create_view_stmt path."""
    t = Tables(spark, sf_dir)
    t.region.createOrReplaceTempView("kch_v_region")
    t.nation.createOrReplaceTempView("kch_v_nation")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW kch_v_region_nations AS
        SELECT r.r_name, n.n_nationkey
        FROM kch_v_region r JOIN kch_v_nation n
          ON r.r_regionkey = n.n_regionkey
        """
    )
    return spark.sql(
        """
        SELECT r_name, count(*) AS n_nations
        FROM kch_v_region_nations GROUP BY r_name ORDER BY r_name
        """
    )


_STRAT_SAMPLE_ORACLE = """
    WITH ranked AS (
      SELECT o_orderkey, o_orderpriority,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority
               ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
             ) AS rn
      FROM orders
    )
    SELECT o_orderkey, o_orderpriority, rn
    FROM ranked WHERE rn <= 5
    ORDER BY o_orderpriority, rn
"""


@query("scan_stratified_sample", _STRAT_SAMPLE_ORACLE)
def scan_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: fixed N per stratum, ordered
    by a content hash (md5 of the key) — a seedless, engine-portable
    'random' draw that is reproducible across runs and engines, unlike
    TABLESAMPLE/sampleBy RNG.  One shuffle on the stratum key; per-
    stratum heaps would replace row_number at extreme stratum sizes."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.md5(F.col("o_orderkey").cast("string")), "o_orderkey"
    )
    return (
        t.orders.select(
            "o_orderkey",
            "o_orderpriority",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 5)
        .orderBy("o_orderpriority", "rn")
    )
