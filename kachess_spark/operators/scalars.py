"""Scalar expression surface (SURVEY.md §2.8).

Reference constructs: arithmetic/bitwise ops, || concat, CASE (simple +
searched), CAST/TRY_CAST, array/map subscript, ARRAY/MAP constructors,
struct field access, lambdas (higher-order fns), POSITION/EXTRACT,
TRIM/SUBSTRING(FROM FOR), date/interval arithmetic
(Bingql.g4:1243-1355,1416-1442; visitor treats every function
generically, visitColNameInExpr:366-407).

Everything stays in built-in pyspark.sql.functions — JVM-side,
whole-stage-codegen'd; no Python UDFs anywhere on this surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kachess_spark.catalog import Tables, load_table, register_views
from kachess_spark.registry import query


@query(
    "scalar_arith_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_quantity + l_tax        AS add_v,
           l_quantity - l_discount   AS sub_v,
           l_extendedprice * 2       AS mul_v,
           l_extendedprice / 4       AS div_v,
           l_orderkey % 97           AS mod_v,
           l_orderkey // 1000        AS intdiv_v,
           l_partkey & 255           AS band_v,
           l_partkey | 16            AS bor_v,
           xor(l_partkey, l_suppkey) AS bxor_v,
           -l_quantity               AS neg_v,
           ABS(l_discount - 0.05)    AS abs_v
    FROM lineitem
    WHERE l_orderkey < 200
    """,
)
def scalar_arith_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """+ - * / % DIV and bitwise & | ^ (binary_operator, Bingql.g4:1295-1307)."""
    t = Tables(spark, sf_dir)
    return t.lineitem.where(F.col("l_orderkey") < 200).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity") + F.col("l_tax")).alias("add_v"),
        (F.col("l_quantity") - F.col("l_discount")).alias("sub_v"),
        (F.col("l_extendedprice") * 2).alias("mul_v"),
        (F.col("l_extendedprice") / 4).alias("div_v"),
        (F.col("l_orderkey") % 97).alias("mod_v"),
        F.expr("l_orderkey div 1000").alias("intdiv_v"),
        F.col("l_partkey").bitwiseAND(F.lit(255)).alias("band_v"),
        F.col("l_partkey").bitwiseOR(F.lit(16)).alias("bor_v"),
        F.col("l_partkey").bitwiseXOR(F.col("l_suppkey")).alias("bxor_v"),
        (-F.col("l_quantity")).alias("neg_v"),
        F.abs(F.col("l_discount") - 0.05).alias("abs_v"),
    )


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand)                    AS up_brand,
           LOWER(p_type)                     AS lo_type,
           p_brand || '/' || p_type          AS cat_pipe,
           CONCAT(p_brand, '-', CAST(p_size AS VARCHAR)) AS cat_fn,
           SUBSTRING(p_name, 1, 8)           AS name8,
           SUBSTRING(p_name FROM 3 FOR 4)    AS name_from_for,
           TRIM('  ' || p_brand || ' ')      AS trimmed,
           LENGTH(p_name)                    AS name_len,
           POSITION('o' IN p_name)           AS o_pos,
           REPLACE(p_type, ' ', '_')         AS type_us,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           REVERSE(p_brand)                  AS rev_brand
    FROM part
    WHERE p_partkey <= 100
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface: ||, CONCAT, SUBSTRING(FROM FOR), TRIM, POSITION,
    LENGTH, REPLACE, LPAD, REVERSE (expr_concat / expr_spec_func)."""
    t = Tables(spark, sf_dir)
    return t.part.where(F.col("p_partkey") <= 100).select(
        "p_partkey",
        F.upper("p_brand").alias("up_brand"),
        F.lower("p_type").alias("lo_type"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("cat_pipe"),
        F.concat(F.col("p_brand"), F.lit("-"), F.col("p_size").cast("string")).alias(
            "cat_fn"
        ),
        F.substring("p_name", 1, 8).alias("name8"),
        F.substring("p_name", 3, 4).alias("name_from_for"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("trimmed"),
        F.length("p_name").alias("name_len"),
        F.instr(F.col("p_name"), "o").alias("o_pos"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.reverse(F.col("p_brand")).alias("rev_brand"),
    )


@query(
    "scalar_case_expr",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open'
                              ELSE 'partial' END AS status_word,
           CASE WHEN o_totalprice >= 300000 THEN 'XL'
                WHEN o_totalprice >= 150000 THEN 'L'
                WHEN o_totalprice >= 50000  THEN 'M'
                ELSE 'S' END AS size_class
    FROM orders
    WHERE o_orderkey < 2000
    """,
)
def scalar_case_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple CASE (expr_case_simple) + searched CASE (expr_case_searched)."""
    t = Tables(spark, sf_dir)
    return t.orders.where(F.col("o_orderkey") < 2000).select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
        .alias("status_word"),
        F.when(F.col("o_totalprice") >= 300000, "XL")
        .when(F.col("o_totalprice") >= 150000, "L")
        .when(F.col("o_totalprice") >= 50000, "M")
        .otherwise("S")
        .alias("size_class"),
    )


@query(
    "scalar_cast_try",
    oracle="""
    SELECT p_partkey,
           CAST(p_size AS VARCHAR)                 AS size_str,
           CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR)
                                                   AS price_dec,
           CAST(CAST(p_size AS DOUBLE) AS INT)     AS size_rt,
           TRY_CAST(p_type AS INT)                 AS bad_int,
           TRY_CAST('2024-0' || CAST((p_partkey % 8) + 1 AS VARCHAR) || '-15' AS DATE)
                                                   AS mid_month
    FROM part
    WHERE p_partkey <= 50
    """,
)
def scalar_cast_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST / TRY_CAST incl. failure→NULL (expr_cast, Bingql.g4:1353-1355)."""
    t = Tables(spark, sf_dir)
    return t.part.where(F.col("p_partkey") <= 50).select(
        "p_partkey",
        F.col("p_size").cast("string").alias("size_str"),
        # decimal CAST showcased, then stringified: scale-2 formatting
        # stays visible while the output schema avoids DECIMAL (engines
        # stringify decimals differently in hash comparison).
        F.col("p_retailprice")
        .cast("decimal(12,2)")
        .cast("string")
        .alias("price_dec"),
        F.col("p_size").cast("double").cast("int").alias("size_rt"),
        F.col("p_type").try_cast("int").alias("bad_int"),
        F.concat(
            F.lit("2024-0"),
            ((F.col("p_partkey") % 8) + 1).cast("string"),
            F.lit("-15"),
        )
        .try_cast("date")
        .alias("mid_month"),
    )


@query(
    "scalar_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(year  FROM o_orderdate) AS INT)  AS yr,
           CAST(EXTRACT(month FROM o_orderdate) AS INT)  AS mo,
           CAST(EXTRACT(day   FROM o_orderdate) AS INT)  AS dy,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS qtr,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE)    AS plus_30d,
           last_day(CAST(o_orderdate AS DATE))            AS month_end,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95
    FROM orders
    WHERE o_orderkey < 1000
    """,
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXTRACT, date_trunc, INTERVAL arithmetic, last_day, datediff
    (expr_presto_induced / interval literals, Bingql.g4:1265-1325)."""
    t = Tables(spark, sf_dir)
    od = F.col("o_orderdate")
    return t.orders.where(F.col("o_orderkey") < 1000).select(
        "o_orderkey",
        F.year(od).alias("yr"),
        F.month(od).alias("mo"),
        F.dayofmonth(od).alias("dy"),
        F.quarter(od).alias("qtr"),
        F.date_trunc("month", od).cast("date").alias("month_start"),
        (od + F.expr("INTERVAL 30 DAY")).cast("date").alias("plus_30d"),
        F.last_day(od.cast("date")).alias("month_end"),
        F.datediff(od.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
    )


@query(
    "scalar_array_ops",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           array_to_string(range(1, l_linenumber + 1), ',')             AS seq_arr,
           l_linenumber                                                 AS arr_len,
           array_to_string(
             list_transform(range(1, l_linenumber + 1), x -> x * 10), ','
           )                                                            AS tens,
           COALESCE(array_to_string(
             list_filter(range(1, l_linenumber + 1), x -> x % 2 = 0), ','
           ), '')                                                       AS evens,
           l_linenumber * (l_linenumber + 1) // 2                       AS arr_sum,
           range(1, l_linenumber + 1)[l_linenumber]                     AS last_elem,
           list_contains(range(1, l_linenumber + 1), 4)                 AS has_4
    FROM lineitem
    WHERE l_orderkey < 300
    """,
)
def scalar_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY construction, subscript, size, higher-order lambdas
    (transform/filter/aggregate — expr_lambda, Bingql.g4:1261-1263).

    The array-valued showcase columns are emitted joined-as-string: the
    lambdas still run on real arrays, but the final output schema stays
    driver-hashable (array cells are unhashable in its canonicalizer)."""
    t = Tables(spark, sf_dir)
    seq = F.sequence(F.lit(1), F.col("l_linenumber"))

    def as_str(arr):
        return F.array_join(F.transform(arr, lambda x: x.cast("string")), ",")

    return t.lineitem.where(F.col("l_orderkey") < 300).select(
        "l_orderkey",
        "l_linenumber",
        as_str(seq).alias("seq_arr"),
        F.size(seq).alias("arr_len"),
        as_str(F.transform(seq, lambda x: x * 10)).alias("tens"),
        as_str(F.filter(seq, lambda x: x % 2 == 0)).alias("evens"),
        F.aggregate(seq, F.lit(0), lambda acc, x: acc + x).alias("arr_sum"),
        F.element_at(seq, F.col("l_linenumber")).alias("last_elem"),
        F.array_contains(seq, 4).alias("has_4"),
    )


@query(
    "scalar_struct_field",
    oracle="""
    SELECT o_orderkey,
           {'key': o_orderkey, 'state': o_orderstatus,
            'price': o_totalprice}.state  AS st_state,
           {'key': o_orderkey, 'state': o_orderstatus,
            'price': o_totalprice}.price  AS st_price
    FROM orders
    WHERE o_orderkey < 500
    """,
)
def scalar_struct_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT construction + field access expr.field (Bingql.g4:1243;
    visitor strips field names, visitExpr:464-487)."""
    t = Tables(spark, sf_dir)
    st = F.struct(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderstatus").alias("state"),
        F.col("o_totalprice").alias("price"),
    )
    return t.orders.where(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        st.getField("state").alias("st_state"),
        st.getField("price").alias("st_price"),
    )


@query(
    "scalar_map_ops",
    oracle="""
    SELECT o_orderkey,
           map(['status','priority'],
               [o_orderstatus, o_orderpriority])['status'][1] AS m_status,
           cardinality(map(['status','priority'],
               [o_orderstatus, o_orderpriority]))          AS m_size
    FROM orders
    WHERE o_orderkey < 300
    """,
)
def scalar_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP constructor + subscript access (expr_map_array, Bingql.g4:1254-1259)."""
    t = Tables(spark, sf_dir)
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    return t.orders.where(F.col("o_orderkey") < 300).select(
        "o_orderkey",
        m.getItem("status").alias("m_status"),
        F.size(m).alias("m_size"),
    )


@query(
    "scalar_json_extract",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.device')  AS device,
           TRY_CAST(json_extract_string(props, '$.dur_ms') AS BIGINT) AS dur_ms
    FROM events
    WHERE event_id < 200
    """,
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction over the events.props string column."""
    t = Tables(spark, sf_dir)
    return t.events.where(F.col("event_id") < 200).select(
        "event_id",
        F.get_json_object("props", "$.device").alias("device"),
        F.get_json_object("props", "$.dur_ms").try_cast("bigint").alias("dur_ms"),
    )


@query(
    "scalar_null_funcs",
    oracle="""
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'is-open')   AS status_or,
           NULLIF(o_orderpriority, '1-URGENT')               AS prio_nulled,
           CASE WHEN o_orderstatus = 'P' THEN NULL
                ELSE o_totalprice END                        AS price_maybe,
           COALESCE(CASE WHEN o_orderstatus = 'P' THEN NULL
                         ELSE o_totalprice END, -1)          AS price_or_neg1
    FROM orders
    WHERE o_orderkey < 800
    """,
)
def scalar_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COALESCE / NULLIF / NULL propagation."""
    t = Tables(spark, sf_dir)
    price_maybe = F.when(F.col("o_orderstatus") == "P", F.lit(None)).otherwise(
        F.col("o_totalprice")
    )
    return t.orders.where(F.col("o_orderkey") < 800).select(
        "o_orderkey",
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("is-open")
        ).alias("status_or"),
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("prio_nulled"),
        price_maybe.alias("price_maybe"),
        F.coalesce(price_maybe, F.lit(-1.0)).alias("price_or_neg1"),
    )


_TZ_ORACLE = """
    SELECT event_id,
           strftime(ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York',
                    '%Y-%m-%d %H:%M:%S') AS ny_time,
           strftime(ts AT TIME ZONE 'UTC' AT TIME ZONE 'Asia/Tokyo',
                    '%Y-%m-%d %H:%M:%S') AS tokyo_time
    FROM events
    WHERE event_id % 97 = 0
    ORDER BY event_id
"""


@query("scalar_timezone", _TZ_ORACLE)
def scalar_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`AT TIME ZONE` surface (Bingql.g4:980-982): storage timestamps are
    UTC; `from_utc_timestamp` renders wall-clock time in a zone.  Emitted
    as formatted strings — tz-aware native columns hash differently
    across engines (see operators/_util.py rules)."""
    ev = load_table(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return (
        ev.where(F.col("event_id") % 97 == 0)
        .select(
            "event_id",
            F.date_format(
                F.from_utc_timestamp("ts", "America/New_York"), fmt
            ).alias("ny_time"),
            F.date_format(
                F.from_utc_timestamp("ts", "Asia/Tokyo"), fmt
            ).alias("tokyo_time"),
        )
        .orderBy("event_id")
    )


_SURROGATE_ORACLE = """
    SELECT o_orderkey,
           md5(o_orderkey::VARCHAR || '|' || o_custkey::VARCHAR) AS sk_md5,
           (strpos('0123456789abcdef',
                   substr(md5(o_orderkey::VARCHAR || '|' || o_custkey::VARCHAR), 1, 1)) - 1)::BIGINT * 16
           + (strpos('0123456789abcdef',
                     substr(md5(o_orderkey::VARCHAR || '|' || o_custkey::VARCHAR), 2, 1)) - 1)
             AS sk_bucket
    FROM orders
    WHERE o_orderkey < 500
    ORDER BY o_orderkey
"""


@query("scalar_surrogate_keys", _SURROGATE_ORACLE)
def scalar_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic surrogate keys from business keys: content-hash ids
    (stable across reruns and clusters — what monotonically_increasing_id
    is NOT) plus a 256-way hash bucket for distribution-friendly keys."""
    t = Tables(spark, sf_dir)
    key = F.concat_ws(
        "|", F.col("o_orderkey").cast("string"), F.col("o_custkey").cast("string")
    )
    sk = F.md5(key)
    bucket = (
        F.conv(F.substring(sk, 1, 2), 16, 10).cast("bigint").alias("sk_bucket")
    )
    return (
        t.orders.where(F.col("o_orderkey") < 500)
        .select("o_orderkey", sk.alias("sk_md5"), bucket)
        .orderBy("o_orderkey")
    )


_REGEX_GROUPS_ORACLE = """
    SELECT doc_id,
           regexp_extract(text, '([0-9]+)', 1) AS first_number,
           regexp_extract(text, '\\b([A-Z][a-z]+)\\b', 1) AS first_capitalized,
           CASE WHEN regexp_matches(text, '[0-9]{{4}}') THEN 1 ELSE 0 END
             AS has_4digits
    FROM documents
    WHERE doc_id % 31 = 0
    ORDER BY doc_id
"""


@query("scalar_regexp_groups", _REGEX_GROUPS_ORACLE.replace("{{", "{").replace("}}", "}"))
def scalar_regexp_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract with capture groups + boolean regexp match —
    patterns restricted to the Java-regex ∩ RE2 common subset."""
    t = Tables(spark, sf_dir)
    return (
        t.documents.where(F.col("doc_id") % 31 == 0)
        .select(
            "doc_id",
            F.regexp_extract("text", r"([0-9]+)", 1).alias("first_number"),
            F.regexp_extract("text", r"\b([A-Z][a-z]+)\b", 1).alias(
                "first_capitalized"
            ),
            F.when(F.col("text").rlike(r"[0-9]{4}"), 1).otherwise(0).alias(
                "has_4digits"
            ),
        )
        .orderBy("doc_id")
    )


_ARRAY_SETOPS_ORACLE = """
    WITH w AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split(lower(
               regexp_replace(text, '[^a-zA-Z ]', '', 'g')), ' '),
               x -> x <> '')) AS ws
      FROM documents WHERE doc_id IN (0, 1)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           len(list_intersect(a.ws, b.ws)) AS n_common,
           len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws)) AS n_union,
           len(list_filter(a.ws, x -> NOT list_contains(b.ws, x)))
             AS n_only_a
    FROM w a JOIN w b ON a.doc_id < b.doc_id
"""


@query("scalar_array_setops", _ARRAY_SETOPS_ORACLE)
def scalar_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (array_intersect/union/except) emitted as sizes
    — element ORDER of array results is engine-specific, cardinalities
    are not."""
    t = Tables(spark, sf_dir)
    w = t.documents.where(F.col("doc_id").isin(0, 1)).select(
        "doc_id",
        F.expr(
            "array_distinct(filter(split(lower("
            "regexp_replace(text, '[^a-zA-Z ]', '')), ' '), x -> x <> ''))"
        ).alias("ws"),
    )
    a, b = w.alias("a"), w.alias("b")
    inter = F.array_intersect(F.col("a.ws"), F.col("b.ws"))
    return a.join(b, F.col("a.doc_id") < F.col("b.doc_id")).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.size(inter).alias("n_common"),
        (F.size("a.ws") + F.size("b.ws") - F.size(inter)).alias("n_union"),
        F.size(F.array_except(F.col("a.ws"), F.col("b.ws"))).alias("n_only_a"),
    )


_LEVENSHTEIN_ORACLE = """
    WITH names AS (
      SELECT DISTINCT p_partkey, p_name FROM part WHERE p_partkey <= 200
    )
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM names a JOIN names b ON a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY key_a, key_b
"""


@query("scalar_levenshtein", _LEVENSHTEIN_ORACLE)
def scalar_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (levenshtein) on a blocked candidate
    set — the verification step of fuzzy entity resolution.  The
    self-join is bounded (key< key dedup + key cap); at 100 TB the
    blocking key would come from phonetic/q-gram LSH, the verify math is
    this."""
    t = Tables(spark, sf_dir)
    names = (
        t.part.where(F.col("p_partkey") <= 200)
        .select("p_partkey", "p_name")
        .distinct()
    )
    a, b = names.alias("a"), names.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(b, F.col("a.p_partkey") < F.col("b.p_partkey"))
        .where(dist <= 3)
        .select(
            F.col("a.p_partkey").alias("key_a"),
            F.col("b.p_partkey").alias("key_b"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.alias("dist"),
        )
        .orderBy("key_a", "key_b")
    )


_LATERAL_ALIAS_ORACLE = """
    SELECT o_orderkey,
           o_totalprice * 0.9 AS discounted,
           o_totalprice * 0.9 * 1.08 AS with_tax
    FROM orders
    WHERE o_orderkey < 200
    ORDER BY o_orderkey
"""


@query("scalar_lateral_alias", _LATERAL_ALIAS_ORACLE)
def scalar_lateral_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column alias: a select-list expression referencing an
    alias defined EARLIER IN THE SAME SELECT (`discounted` feeding
    `with_tax`) — Spark 3.4+ resolves it without a subquery wrapper,
    exactly the layered-derivation style ETL SQL is full of.  Per-row
    double arithmetic → IEEE-exact parity.
    """
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey,
               o_totalprice * 0.9 AS discounted,
               discounted * 1.08 AS with_tax
        FROM orders
        WHERE o_orderkey < 200
        ORDER BY o_orderkey
        """
    )


_TRY_ARITH_ORACLE = """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount = 0.0 THEN NULL
                ELSE l_extendedprice / l_discount END AS price_per_disc,
           CASE WHEN l_quantity = 0.0 THEN NULL
                ELSE l_extendedprice / l_quantity END AS unit_price
    FROM lineitem
    WHERE l_orderkey < 300
    ORDER BY l_orderkey, l_linenumber
"""


@query("scalar_try_arith", _TRY_ARITH_ORACLE)
def scalar_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``try_divide`` — NULL-on-error arithmetic (zero discounts are
    ~10% of lineitem): the pipeline-safe alternative to ANSI-mode
    exceptions killing a 10-hour job on one bad row, and to silently
    wrong Inf values in permissive mode.  Oracle expresses the same
    contract with explicit CASE guards.
    """
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.where(F.col("l_orderkey") < 300)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.try_divide("l_extendedprice", "l_discount").alias("price_per_disc"),
            F.try_divide("l_extendedprice", "l_quantity").alias("unit_price"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "scalar_variant_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def scalar_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON via Spark 4's VARIANT type: parse_json once,
    typed variant_get extraction, then aggregate — the open-schema
    ingestion path (vs get_json_object's per-path string re-parse in
    scalar_json_extract).

    Scale: VARIANT stores a parsed binary encoding, so N extractions
    cost one parse (get_json_object re-parses the string per path);
    for wide telemetry blobs that's the difference between one decode
    and a decode per column.  The aggregation is an ordinary map-side
    combined groupBy.
    """
    t = Tables(spark, sf_dir)
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        t.events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
        .orderBy("event_type")
    )


@query(
    "scalar_url_parse",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' ||
             CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&v=2' AS url
      FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           regexp_extract(url, '^https?://([^/]+)', 1) AS host,
           regexp_extract(url, '^https?://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
    FROM u
    ORDER BY doc_id
    """,
)
def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with Spark's ``parse_url`` (JVM java.net URI
    machinery) cross-checked against a pure-regexp DuckDB oracle — two
    INDEPENDENT parsers agreeing on host/path/query-param extraction,
    the crawl-pipeline canonicalization primitive (per-domain caps,
    robots lookups, dedup keys all start here)."""
    t = Tables(spark, sf_dir)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=2"),
    )
    return (
        t.documents.where(F.col("doc_id") < 300)
        .select("doc_id", url.alias("url"))
        .select(
            "doc_id",
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.parse_url("url", F.lit("PATH")).alias("path"),
            F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias(
                "lang_param"
            ),
        )
        .orderBy("doc_id")
    )
