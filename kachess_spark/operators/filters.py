"""Filters / predicates (SURVEY.md §2.2).

Reference constructs: WHERE bool_expr; =,<>,<,<=,>,>=,<=> (null-safe);
[NOT] LIKE/RLIKE; IS [NOT] NULL; [NOT] BETWEEN; [NOT] EXISTS(subq);
[NOT] IN (list|subq); multi-col (a,b) IN (subq); AND/OR/NOT
(Bingql.g4:1076-1229; visitor visitWhere_clause
SqlMetaDataExtractor.java:302-327).

All predicates stay as Column expressions → Catalyst pushes them into
the parquet scan (verify: PushedFilters in explain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kachess_spark.catalog import Tables, register_views
from kachess_spark.registry import query


@query(
    "filter_between_in",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 12
      AND l_returnflag IN ('A', 'R')
      AND l_linenumber NOT IN (5, 6, 7)
    """,
)
def filter_between_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.lineitem.where(
        F.col("l_quantity").between(10, 12)
        & F.col("l_returnflag").isin("A", "R")
        & ~F.col("l_linenumber").isin(5, 6, 7)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


@query(
    "filter_like_rlike",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_name LIKE '%green%'
      AND p_type NOT LIKE 'SMALL%'
      AND regexp_matches(p_brand, '^Brand#[0-4][0-9]$')
    """,
)
def filter_like_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.part.where(
        F.col("p_name").like("%green%")
        & ~F.col("p_type").like("SMALL%")
        & F.col("p_brand").rlike("^Brand#[0-4][0-9]$")
    ).select("p_partkey", "p_name", "p_type")


@query(
    "filter_null_safe",
    oracle="""
    SELECT o_orderkey, o_orderstatus, flag
    FROM (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderstatus = 'F' THEN NULL ELSE o_orderstatus END AS flag
      FROM orders
    )
    WHERE flag IS NOT DISTINCT FROM NULL OR flag IS NOT DISTINCT FROM 'O'
    """,
)
def filter_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality <=> (Spark eqNullSafe ↔ IS NOT DISTINCT FROM)."""
    t = Tables(spark, sf_dir)
    flagged = t.orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderstatus") == "F", F.lit(None).cast("string"))
        .otherwise(F.col("o_orderstatus"))
        .alias("flag"),
    )
    return flagged.where(
        F.col("flag").eqNullSafe(F.lit(None).cast("string"))
        | F.col("flag").eqNullSafe("O")
    )


@query(
    "filter_exists_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49.5)
    """,
)
def filter_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS (correlated subquery) — planned as a left-semi join.

    At scale this is the shape you want: the subquery side is reduced
    before the shuffle, no row multiplication.
    """
    t = Tables(spark, sf_dir)
    big = t.lineitem.where(F.col("l_quantity") >= 49.5).select("l_orderkey")
    return t.orders.join(
        big, t.orders.o_orderkey == big.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")


@query(
    "filter_not_exists_subquery",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 450000)
    """,
)
def filter_not_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS — left-anti join."""
    t = Tables(spark, sf_dir)
    big = t.orders.where(F.col("o_totalprice") > 450000)
    return t.customer.join(
        big, t.customer.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "filter_in_subquery",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_regionkey IN (SELECT r_regionkey FROM region
                                                WHERE r_name = 'ASIA'))
    """,
)
def filter_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery), nested two deep — expressed in Spark SQL so the
    decorrelation is Catalyst's (RewritePredicateSubquery → semi join)."""
    register_views(spark, sf_dir, ("supplier", "nation", "region"))
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                              WHERE n_regionkey IN (SELECT r_regionkey FROM region
                                                    WHERE r_name = 'ASIA'))
        """
    )


@query(
    "filter_multi_col_in",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem l
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_orderkey = l.l_orderkey AND l.l_partkey = 1
                    AND o.o_totalprice > 400000)
    """,
)
def filter_multi_col_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column (a,b) IN (subquery) — Bingql bool_expr_multi_in."""
    register_views(spark, sf_dir, ("lineitem", "orders"))
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        WHERE (l_orderkey, l_partkey) IN
              (SELECT o_orderkey, 1 FROM orders WHERE o_totalprice > 400000)
        """
    )


@query(
    "filter_boolean_combo",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE (o_orderstatus = 'F' OR o_orderstatus = 'P')
      AND NOT (o_totalprice < 50000)
      AND o_orderdate IS NOT NULL
    """,
)
def filter_boolean_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.orders.where(
        ((F.col("o_orderstatus") == "F") | (F.col("o_orderstatus") == "P"))
        & ~(F.col("o_totalprice") < 50000)
        & F.col("o_orderdate").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


_CORR_SCALAR_ORACLE = """
    SELECT l.l_orderkey, l.l_linenumber,
           CAST(round(l.l_extendedprice::DECIMAL(18,2), 2) AS DOUBLE)
               AS min_price
    FROM lineitem l
    WHERE l.l_orderkey < 2000
      AND l.l_extendedprice = (
        SELECT min(l2.l_extendedprice) FROM lineitem l2
        WHERE l2.l_orderkey = l.l_orderkey
      )
    ORDER BY l.l_orderkey, l.l_linenumber
"""


@query("filter_correlated_scalar_subquery", _CORR_SCALAR_ORACLE)
def filter_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q2's shape): cheapest line item
    per order.  Catalyst decorrelates this into an aggregate + join —
    one pass, no per-row subquery execution (assert via .explain: no
    repeated subquery node in the physical plan)."""
    t = Tables(spark, sf_dir)
    t.lineitem.createOrReplaceTempView("kch_corr_lineitem")
    return spark.sql(
        """
        SELECT l.l_orderkey, l_linenumber,
               CAST(round(CAST(l.l_extendedprice AS DECIMAL(18,2)), 2)
                    AS DOUBLE) AS min_price
        FROM kch_corr_lineitem l
        WHERE l.l_orderkey < 2000
          AND l.l_extendedprice = (
            SELECT min(l2.l_extendedprice) FROM kch_corr_lineitem l2
            WHERE l2.l_orderkey = l.l_orderkey
          )
        ORDER BY l.l_orderkey, l_linenumber
        """
    )


_Q20_ORACLE = """
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_11'
      AND s_suppkey IN (
        SELECT l1.l_suppkey
        FROM lineitem l1
        WHERE l1.l_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
          AND l1.l_shipdate >= DATE '1996-01-01'
          AND l1.l_shipdate <  DATE '1997-01-01'
        GROUP BY l1.l_suppkey, l1.l_partkey
        HAVING 8 * SUM(CAST(l1.l_quantity AS BIGINT)) > (
          SELECT SUM(CAST(l2.l_quantity AS BIGINT))
          FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
      )
    ORDER BY s_name, s_acctbal
"""


@query("filter_q20_nested_in", _Q20_ORACLE)
def filter_q20_nested_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: lineitem stands in for partsupp):
    IN-subquery containing another IN plus a correlated aggregate
    threshold — suppliers who shipped >12.5% of a part's all-time volume
    in one year.

    DataFrame side decorrelates by hand into the plan Catalyst should
    reach: semi-join part keys into the fact (broadcast — part-side is
    small after the LIKE), aggregate once per (supplier, part), join the
    per-part totals, integer-exact threshold compare, then semi-join
    into supplier.  No correlated re-scan of lineitem per group.
    """
    t = Tables(spark, sf_dir)
    bolt_parts = t.part.where(F.col("p_name").like("%bolt%")).select("p_partkey")
    li = t.lineitem
    li_bolt = li.join(
        F.broadcast(bolt_parts), li["l_partkey"] == bolt_parts["p_partkey"], "left_semi"
    )
    per_part_total = li_bolt.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("qty_total")
    )
    y96 = li_bolt.where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    per_supp_part = y96.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("qty_96")
    )
    qualified = (
        per_supp_part.join(per_part_total, on="l_partkey")
        .where(8 * F.col("qty_96") > F.col("qty_total"))
        .select("l_suppkey")
        .distinct()
    )
    nat = t.nation.where(F.col("n_name") == "NATION_11").select("n_nationkey")
    return (
        t.supplier.join(
            F.broadcast(nat),
            t.supplier["s_nationkey"] == nat["n_nationkey"],
            "left_semi",
        )
        .join(
            qualified,
            t.supplier["s_suppkey"] == qualified["l_suppkey"],
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name", "s_acctbal")
    )


_NOT_IN_NULL_ORACLE = """
    WITH keys AS (
      SELECT CASE WHEN n_nationkey = 0 THEN NULL
                  ELSE n_nationkey END AS k
      FROM nation
    )
    SELECT
      (SELECT count(*) FROM customer
       WHERE c_nationkey NOT IN (SELECT k FROM keys)) AS n_not_in,
      (SELECT count(*) FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM keys
                         WHERE keys.k = c.c_nationkey)) AS n_not_exists
"""


@query("filter_not_in_null_trap", _NOT_IN_NULL_ORACLE)
def filter_not_in_null_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic parity: ``NOT IN`` against a subquery that
    yields a NULL returns ZERO rows (every comparison is UNKNOWN),
    while ``NOT EXISTS`` with the same data returns the real
    complement.  The reference grammar accepts both forms
    (bool_expr_single_in Bingql.g4:1201-1203, bool_expr_unary
    :1193-1199) without modeling the difference; an execution engine
    must.

    Scale plan: Catalyst plans the NOT IN as a null-aware anti join
    (BroadcastNestedLoop for the null check) — correct but far more
    expensive than NOT EXISTS's plain left-anti; this query is also the
    documentation for why pipelines should prefer NOT EXISTS on
    nullable keys.
    """
    register_views(spark, sf_dir, ("nation", "customer"))
    return spark.sql(_NOT_IN_NULL_ORACLE)
