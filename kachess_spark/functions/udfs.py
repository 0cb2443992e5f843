"""User-defined function surface (SURVEY.md §2.10).

The reference recognizes `CREATE TEMPORARY FUNCTION name AS 'class'`
(Bingql.g4:116-118) and treats any unknown ``ident(args)`` as an opaque
function whose column arguments become lineage parents
(SqlMetaDataExtractor.visitColNameInExpr:366-407).  Executed Spark-first,
that surface is:

* ``spark.udf.register`` → the function is callable from SQL text, the
  exact `CREATE TEMPORARY FUNCTION` use case;
* ``@pandas_udf`` → Arrow-batched vectorized evaluation (the only
  acceptable Python hot path at scale: one Python roundtrip per batch,
  not per row);
* ``applyInPandas`` grouped-map → the UDAF/aggregation escape hatch.

Every operator here intentionally computes something SQL-expressible so
the DuckDB oracle can check the full Python↔JVM↔Arrow path for value
fidelity — the point is exercising the machinery, not the math.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from kachess_spark.catalog import Tables
from kachess_spark.registry import query


def _discounted_price_udf():
    # defined lazily: pandas_udf parses its DDL return type against the
    # ACTIVE session, so decorating at import time breaks session-less
    # imports (registry.load_all before SparkSession exists)
    @pandas_udf("double")
    def discounted_price(extended: pd.Series, discount: pd.Series) -> pd.Series:
        """Vectorized scalar Pandas UDF: one Arrow batch in, one out."""
        return extended * (1.0 - discount)

    return discounted_price


_PANDAS_UDF_ORACLE = """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1.0 - l_discount), 4) AS disc_price
    FROM lineitem
    WHERE l_quantity >= 49
    ORDER BY l_orderkey, l_linenumber
"""


@query("udf_pandas_scalar", _PANDAS_UDF_ORACLE)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar UDF over lineitem; per-row double arithmetic
    is IEEE-identical across engines, so the oracle checks the Arrow
    transfer exactly."""
    t = Tables(spark, sf_dir)
    discounted_price = _discounted_price_udf()
    return (
        t.lineitem.where(F.col("l_quantity") >= 49)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(
                discounted_price("l_extendedprice", "l_discount"), 4
            ).alias("disc_price"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


_SQL_UDF_ORACLE = """
    SELECT n_name,
           upper(substr(n_name, 1, 3)) || '-' || CAST(n_nationkey AS VARCHAR)
             AS nation_code
    FROM nation ORDER BY n_name
"""


@query("udf_register_sql", _SQL_UDF_ORACLE)
def udf_register_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``spark.udf.register`` + use from SQL text — the executed
    equivalent of the reference's CREATE TEMPORARY FUNCTION surface."""
    spark.udf.register(
        "kch_nation_code",
        lambda name, key: f"{name[:3].upper()}-{key}",
        "string",
    )
    t = Tables(spark, sf_dir)
    t.nation.createOrReplaceTempView("kch_udf_nation")
    return spark.sql(
        """
        SELECT n_name, kch_nation_code(n_name, n_nationkey) AS nation_code
        FROM kch_udf_nation ORDER BY n_name
        """
    )


_GROUPED_ORACLE = """
    SELECT o_custkey,
           count(*) AS n_orders,
           ROUND(CAST(SUM(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
                      AS DOUBLE) / 10000
                 / count(*), 4) AS avg_price,
           ROUND(MAX(o_totalprice) - MIN(o_totalprice), 4) AS price_spread
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 10
    ORDER BY o_custkey
"""


@query("udf_grouped_map", _GROUPED_ORACLE)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregation via ``applyInPandas`` grouped-map — the UDAF
    escape hatch for aggregations built-ins can't express.  One shuffle
    on the group key, one pandas frame per group (bounded: a customer's
    orders fit in memory at any scale; for unbounded groups you'd
    pre-aggregate or window instead)."""

    import math

    def half_up4(x: float) -> float:
        # DuckDB/Spark ROUND is half-away-from-zero; Python round() is
        # banker's — match the SQL engines explicitly
        return math.floor(x * 10000 + 0.5) / 10000

    def per_customer(pdf: pd.DataFrame) -> pd.DataFrame:
        prices = pdf["o_totalprice"]
        # fixed-point sum → deterministic cross-engine average
        total = (prices * 10000 + 0.5).floordiv(1).astype("int64").sum()
        n = len(pdf)
        return pd.DataFrame(
            {
                "o_custkey": [pdf["o_custkey"].iloc[0]],
                "n_orders": [n],
                "avg_price": [half_up4(total / 10000 / n)],
                "price_spread": [half_up4(prices.max() - prices.min())],
            }
        )

    t = Tables(spark, sf_dir)
    out = (
        t.orders.select("o_custkey", "o_totalprice")
        .groupBy("o_custkey")
        .applyInPandas(
            per_customer,
            "o_custkey BIGINT, n_orders BIGINT, avg_price DOUBLE, "
            "price_spread DOUBLE",
        )
    )
    return out.where(F.col("n_orders") >= 10).orderBy("o_custkey")


def _batch_token_count_udf():
    @pandas_udf("long")
    def batch_token_count(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        """Iterator-of-series Pandas UDF: amortizes per-batch setup (the
        pattern for loading a tokenizer/model once per executor, not
        once per batch)."""
        splitter = None  # stand-in for expensive one-time init
        for batch in texts:
            if splitter is None:
                splitter = True
            yield batch.fillna("").str.split().map(len)

    return batch_token_count


_ITER_UDF_ORACLE = """
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens
    FROM documents
    ORDER BY doc_id
"""


@query("udf_pandas_iterator", _ITER_UDF_ORACLE)
def udf_pandas_iterator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator Pandas UDF (per-executor init amortization) counting
    whitespace tokens; oracle = DuckDB list arithmetic."""
    t = Tables(spark, sf_dir)
    batch_token_count = _batch_token_count_udf()
    return (
        t.documents.select(
            "doc_id", batch_token_count("text").alias("n_tokens")
        )
        .orderBy("doc_id")
    )


_STOPWORDS = ("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")

_UDTF_ORACLE = f"""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split(lower(
               regexp_replace(text, '[^a-zA-Z ]', '', 'g')), ' '),
               x -> x <> '') AS ws
      FROM documents WHERE doc_id <= 2
    )
    SELECT doc_id,
           CAST(generate_subscripts(ws, 1) - 1 AS INT) AS pos,
           unnest(ws) AS word,
           unnest(ws) IN {_STOPWORDS} AS is_stop
    FROM d
    ORDER BY doc_id, pos
"""


@query("udf_python_udtf", _UDTF_ORACLE)
def udf_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function, SURVEY.md §2.10 `LATERAL VIEW fn`):
    one input row → many output rows, declared as a class with eval()
    yielding tuples.  Invoked via SQL LATERAL so the call sits in the
    FROM clause exactly like the reference's UDTF surface.

    UDTFs are the slow-path escape hatch (row-at-a-time Python); the
    twin query lateral_view_sql_words computes the same expansion with
    the built-in explode for the fast path — keep UDTFs for logic that
    genuinely can't be an array expression."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, word string, is_stop boolean")
    class SplitWords:
        def eval(self, text: str):
            if text is None:
                return
            import re

            clean = re.sub(r"[^a-zA-Z ]", "", text).lower()
            for pos, word in enumerate(clean.split()):
                yield pos, word, word in _STOPWORDS

    spark.udtf.register("kch_split_words", SplitWords)
    from kachess_spark.catalog import register_views

    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        SELECT d.doc_id, w.pos, w.word, w.is_stop
        FROM documents d, LATERAL kch_split_words(d.text) w
        WHERE d.doc_id <= 2
        ORDER BY d.doc_id, w.pos
        """
    )


_GROUPED_AGG_ORACLE = """
    SELECT l_returnflag,
           CAST(SUM(CAST(floor((l_extendedprice) * 10000 + 0.5) AS BIGINT))
                AS DOUBLE) / 10000 AS total_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""


@query("udf_pandas_grouped_agg", _GROUPED_AGG_ORACLE)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF — the vectorized UDAF form usable inside
    ``groupBy().agg`` and window frames (vs applyInPandas, which
    replaces the whole group with an arbitrary frame).  The kernel
    mirrors operators/_util.dsum's fixed-point contract in NumPy so the
    result is run-order deterministic and engine-exact.

    Scale plan: Arrow-batched per group; partial aggregation does NOT
    apply to Python UDAFs (the whole group's column ships to Python),
    so this path is for semantics Spark lacks — for a plain sum the
    built-in wins (see test_no_python_udf_in_sql_operators).
    """
    import numpy as np
    import pandas as pd

    @pandas_udf("long")
    def fixed_point_sum(prices: pd.Series) -> int:
        return int(np.floor(prices.to_numpy() * 10000 + 0.5).astype(np.int64).sum())

    t = Tables(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(fixed_point_sum("l_extendedprice").alias("scaled"))
        .select(
            "l_returnflag",
            (F.col("scaled").cast("double") / 10000).alias("total_price"),
        )
        .orderBy("l_returnflag")
    )


_SQL_FN_DDL_ORACLE = """
    SELECT l_returnflag,
           CAST(SUM(CAST(floor((l_extendedprice * (1 + l_tax)) * 10000 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 10000 AS taxed_total
    FROM lineitem
    WHERE l_orderkey < 1000
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""


@query("udf_sql_function_ddl", _SQL_FN_DDL_ORACLE)
def udf_sql_function_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`CREATE TEMPORARY FUNCTION … RETURNS … RETURN expr` — the SQL
    macro form of the reference's create_tmp_extnlfunc_stmt
    (Bingql.g4:116-118) with a body Spark can INLINE: unlike a Python
    UDF, the planner substitutes the expression, so the call stays
    inside whole-stage codegen (no serialization boundary at any
    scale).  The fixed-point sum proves value parity.
    """
    from kachess_spark.catalog import register_views

    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION kch_taxed(price DOUBLE, tax DOUBLE)"
        " RETURNS DOUBLE RETURN price * (1 + tax)"
    )
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(SUM(CAST(floor(kch_taxed(l_extendedprice, l_tax) * 10000
                                   + 0.5) AS BIGINT)) AS DOUBLE) / 10000
                 AS taxed_total
        FROM lineitem
        WHERE l_orderkey < 1000
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


_SCRIPTING_ORACLE = "SELECT count(*) AS n_orders FROM orders"


@query("scripting_procedural_block", _SCRIPTING_ORACLE)
def scripting_procedural_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 BEGIN/DECLARE/WHILE/SET) — the executable
    analog of the HPL/SQL procedural surface the reference's grammar
    inherits but only parses (Bingql.g4:547-609 procedure/loop rules).
    The loop partitions orders by key residue and accumulates per-slice
    counts — the total must equal the plain COUNT(*), proving each
    iteration ran a real query.

    Scale note: scripting is DRIVER-side control flow; each statement
    inside is a full distributed query.  Use it for orchestration
    (loops over partitions, retry blocks), never per-row logic.
    """
    from kachess_spark.catalog import register_views

    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        BEGIN
          DECLARE total BIGINT DEFAULT 0;
          DECLARE i INT DEFAULT 1;
          WHILE i <= 3 DO
            SET total = total + (SELECT count(*) FROM orders
                                 WHERE o_orderkey % 3 = i - 1);
            SET i = i + 1;
          END WHILE;
          SELECT total AS n_orders;
        END
        """
    )
