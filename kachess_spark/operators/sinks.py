"""Sinks: CTAS, INSERT INTO/OVERWRITE, Hive multi-table insert,
partitioned + bucketed writes (SURVEY.md §2.1).

Reference lineage semantics: visitInsert_stmt (SqlMetaDataExtractor.java:
586-611), multi-table insert visitMultitable_insert_stmt (:569-584), CTAS
branch of visitCreate_table_stmt (:703-735), positional column match
matchInsertsWithActual (:1028-1048).  Here they are *executed*: each
operator writes through the real sink and reads the result back, so the
oracle checks the full write→read round trip, not just the SELECT.

Scale design:

* partitioned writes demonstrate partition pruning on read-back — the
  filtered query's scan touches one directory, not the table;
* the bucketed table pair is written with the same bucket count on the
  join key, so the read-back join is shuffle-free on both sides
  (SortMergeJoin over pre-bucketed scans);
* multi-insert reads the source ONCE for N targets (Spark executes the
  Union-of-inserts over a shared scan) — at 100 TB the alternative
  (N full scans) is the difference between one pass and N.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kachess_spark.catalog import Tables
from kachess_spark.operators._util import money
from kachess_spark.registry import query

# Per-PROCESS unique scratch root: a prior aborted session's half-written
# parquet / leftover _temporary dirs under a shared path can fail the next
# session's first sink nondeterministically.  Unique root + atexit sweep
# means every session starts clean and leaves nothing behind.
_WORK_DIR = os.path.join(
    tempfile.gettempdir(), f"kachess_sinks_{os.getpid()}_{uuid.uuid4().hex[:8]}"
)
atexit.register(shutil.rmtree, _WORK_DIR, ignore_errors=True)


def _scratch(name: str) -> str:
    os.makedirs(_WORK_DIR, exist_ok=True)
    return os.path.join(_WORK_DIR, name)


_CTAS_SELECT_ORACLE = """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(round(sum(o_totalprice)::DECIMAL(28,2), 2) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@query("sink_ctas_roundtrip", _CTAS_SELECT_ORACLE)
def sink_ctas_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTAS → read back: the §2.1 `CREATE TABLE AS SELECT` surface as an
    executed round trip (write parquet, re-read, return)."""
    t = Tables(spark, sf_dir)
    path = _scratch("ctas_orders_summary")
    (
        t.orders.where(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(28,2)")), 2)
            .cast("double")
            .alias("total"),
        )
        .write.mode("overwrite")
        .parquet(path)
    )
    return spark.read.parquet(path).orderBy("o_orderpriority")


_INSERT_ORACLE = """
    SELECT n_name, n_regionkey FROM nation WHERE n_regionkey IN (0, 1)
    ORDER BY n_name
"""


@query("sink_insert_into", _INSERT_ORACLE)
def sink_insert_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT OVERWRITE then INSERT INTO (append) against a path table:
    overwrite seeds region 0, append adds region 1; the read-back is the
    union — the reference's two insert modes executed
    (Bingql.g4:675-677 insert_stmt)."""
    t = Tables(spark, sf_dir)
    path = _scratch("insert_nation")
    base = t.nation.select("n_name", "n_regionkey")
    base.where(F.col("n_regionkey") == 0).write.mode("overwrite").parquet(path)
    base.where(F.col("n_regionkey") == 1).write.mode("append").parquet(path)
    return spark.read.parquet(path).orderBy("n_name")


_MULTI_INSERT_ORACLE = """
    WITH src AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
    )
    SELECT 'big' AS bucket, count(*) AS cnt,
           CAST(round(sum(o_totalprice)::DECIMAL(28,2), 2) AS DOUBLE) AS total
    FROM src WHERE o_totalprice >= 200000
    UNION ALL
    SELECT 'open' AS bucket, count(*) AS cnt,
           CAST(round(sum(o_totalprice)::DECIMAL(28,2), 2) AS DOUBLE) AS total
    FROM src WHERE o_orderstatus = 'O' AND o_totalprice < 200000
    ORDER BY bucket
"""


@query("sink_multi_insert", _MULTI_INSERT_ORACLE)
def sink_multi_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive multi-table insert executed natively: ONE `FROM src INSERT …
    INSERT …` statement fans a single source scan into two targets
    (§2.1 multitable_insert_stmt; Spark SQL supports the form directly).
    Read both targets back with a tag."""
    t = Tables(spark, sf_dir)
    p_big = _scratch("mi_big")
    p_open = _scratch("mi_open")
    t.orders.createOrReplaceTempView("kch_mi_src")
    spark.sql(
        f"""
        FROM kch_mi_src
        INSERT OVERWRITE DIRECTORY '{p_big}' USING parquet
        SELECT o_orderkey, o_totalprice WHERE o_totalprice >= 200000
        INSERT OVERWRITE DIRECTORY '{p_open}' USING parquet
        SELECT o_orderkey, o_totalprice
        WHERE o_orderstatus = 'O' AND o_totalprice < 200000
        """
    )
    big = spark.read.parquet(p_big).agg(
        F.count("*").alias("cnt"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(28,2)")), 2)
        .cast("double")
        .alias("total"),
    ).select(F.lit("big").alias("bucket"), "cnt", "total")
    open_ = spark.read.parquet(p_open).agg(
        F.count("*").alias("cnt"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(28,2)")), 2)
        .cast("double")
        .alias("total"),
    ).select(F.lit("open").alias("bucket"), "cnt", "total")
    return big.unionByName(open_).orderBy("bucket")


_PARTITIONED_ORACLE = """
    SELECT o_orderpriority, count(*) AS cnt
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderpriority
"""


@query("sink_partitioned_write", _PARTITIONED_ORACLE)
def sink_partitioned_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITIONED BY write + partition-pruned read-back: the filter on
    the partition column prunes to a single directory (visible as
    ``PartitionFilters`` in the scan; §2.1 table_partition_clause).

    The read-back declares the schema explicitly: a partitioned write
    of ZERO rows creates no partition directories, so schema inference
    on the read side fails — exactly what an empty ingestion date does
    to a daily 100 TB pipeline.  Explicit schema makes the empty case
    a clean 0-row result instead of an AnalysisException."""
    t = Tables(spark, sf_dir)
    path = _scratch("part_orders")
    proj = t.orders.select("o_orderkey", "o_totalprice", "o_orderpriority")
    proj.write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
    return (
        spark.read.schema(proj.schema).parquet(path)
        .where(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("cnt"))
    )


_BUCKETED_ORACLE = """
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           CAST(round(sum(o.o_totalprice)::DECIMAL(28,2), 2) AS DOUBLE) AS total
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
"""


@query("sink_bucketed_join", _BUCKETED_ORACLE)
def sink_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bucketBy co-located join: both sides written with the same bucket
    count on the join key, so the read-back join needs NO shuffle (§2.1
    table_clustered_clause `CLUSTERED BY … INTO n BUCKETS`).

    This is the 100 TB pattern for repeated fact-dim joins: pay the
    bucketed write once, join shuffle-free forever after."""
    t = Tables(spark, sf_dir)
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    for name, df, key in (
        ("kch_b_customer", t.customer.select("c_custkey", "c_mktsegment"), "c_custkey"),
        ("kch_b_orders", t.orders.select("o_custkey", "o_totalprice"), "o_custkey"),
    ):
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", _scratch(name))
            .format("parquet")
            .saveAsTable(name)
        )
    c = spark.table("kch_b_customer")
    o = spark.table("kch_b_orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(28,2)")), 2)
            .cast("double")
            .alias("total"),
        )
        .orderBy("c_mktsegment")
    )


_ORC_ORACLE = """
    SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
"""


@query("sink_orc_roundtrip", _ORC_ORACLE)
def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STORED AS ORC (§2.1 file_format, Bingql.g4:284-289) executed:
    write ORC, read it back, aggregate — the oracle checks the round
    trip end-to-end without itself needing an ORC reader."""
    t = Tables(spark, sf_dir)
    path = _scratch("orc_nation")
    t.nation.write.mode("overwrite").orc(path)
    return (
        spark.read.orc(path)
        .groupBy("n_regionkey")
        .agg(F.count("*").alias("n"), F.min("n_name").alias("first_name"))
        .orderBy("n_regionkey")
    )


_CSV_SINK_ORACLE = """
    SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey
"""


@query("sink_csv_roundtrip", _CSV_SINK_ORACLE)
def sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink (ROW FORMAT DELIMITED equivalent) with explicit schema on
    re-read — text round trip preserves exact values for int/string."""
    t = Tables(spark, sf_dir)
    path = _scratch("csv_region")
    (
        t.region.select("r_regionkey", "r_name")
        .write.mode("overwrite")
        .option("header", "true")
        .csv(path)
    )
    return (
        spark.read.csv(path, header=True, schema="r_regionkey BIGINT, r_name STRING")
        .orderBy("r_regionkey")
    )


_UPSERT_ORACLE = """
    WITH target AS (
      SELECT n_nationkey, n_name, 'old' AS version FROM nation
      WHERE n_regionkey <= 2
    ),
    updates AS (
      SELECT n_nationkey, n_name, 'new' AS version FROM nation
      WHERE n_regionkey >= 2
    )
    SELECT coalesce(u.n_nationkey, t.n_nationkey) AS n_nationkey,
           coalesce(u.n_name, t.n_name) AS n_name,
           coalesce(u.version, t.version) AS version
    FROM target t FULL OUTER JOIN updates u USING (n_nationkey)
    ORDER BY n_nationkey
"""


@query("sink_upsert_scd1", _UPSERT_ORACLE)
def sink_upsert_scd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style SCD-1 upsert WITHOUT a transactional format: stage
    target + updates, full-outer join on the key, updates win, rewrite.
    The reference's grammar parses MERGE without extracting (§2.1); this
    is the executed equivalent on plain parquet.  At scale you'd rewrite
    only affected partitions (dynamic partition overwrite) — the join
    logic is identical."""
    t = Tables(spark, sf_dir)
    path = _scratch("upsert_nation")
    target = (
        t.nation.where(F.col("n_regionkey") <= 2)
        .select("n_nationkey", "n_name", F.lit("old").alias("version"))
    )
    target.write.mode("overwrite").parquet(path)
    updates = (
        t.nation.where(F.col("n_regionkey") >= 2)
        .select("n_nationkey", "n_name", F.lit("new").alias("version"))
    )
    cur = spark.read.parquet(path).alias("t")
    u = updates.alias("u")
    merged = (
        cur.join(u, on="n_nationkey", how="full_outer")
        .select(
            "n_nationkey",
            F.coalesce(F.col("u.n_name"), F.col("t.n_name")).alias("n_name"),
            F.coalesce(F.col("u.version"), F.col("t.version")).alias("version"),
        )
    )
    out = _scratch("upsert_nation_v2")
    merged.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out).orderBy("n_nationkey")


_PART_INTROSPECT_ORACLE = """
    SELECT max(o_orderpriority) AS max_part,
           min(o_orderpriority) AS min_part,
           count(DISTINCT o_orderpriority) AS n_parts
    FROM orders
"""


@query("catalog_partition_introspection", _PART_INTROSPECT_ORACLE)
def catalog_partition_introspection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive partition-introspection functions (MAX_PART_STRING /
    MIN_PART_STRING / PART_COUNT, Bingql.g4:1422-1429) as catalog
    helpers: write a partitioned table, then answer from SHOW PARTITIONS
    metadata — no data scan (functions/partitions.py).

    The oracle recomputes the same values FROM THE DATA, pinning the
    catalog metadata to the storage truth.
    """
    from kachess_spark.functions import partitions as P

    t = Tables(spark, sf_dir)
    tbl = "kch_part_orders"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    (
        t.orders.select("o_orderkey", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite")
        .partitionBy("o_orderpriority")
        .option("path", _scratch(tbl))
        .format("parquet")
        .saveAsTable(tbl)
    )
    row = (
        P.max_part_string(spark, tbl, "o_orderpriority"),
        P.min_part_string(spark, tbl, "o_orderpriority"),
        P.part_count(spark, tbl),
    )
    return spark.createDataFrame(
        [row], "max_part string, min_part string, n_parts bigint"
    )


_SORTED_ZONEMAP_ORACLE = """
    SELECT CAST(l_shipdate AS DATE) AS ship_day,
           count(*) AS n_items,
           CAST(round(sum(l_extendedprice)::DECIMAL(28,2), 2) AS DOUBLE) AS day_revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-03-01' AND l_shipdate < DATE '1996-03-08'
    GROUP BY 1
    ORDER BY ship_day
"""


@query("sink_sorted_zonemap", _SORTED_ZONEMAP_ORACLE)
def sink_sorted_zonemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partition + sortWithinPartitions write: time-clustered
    parquet WITHOUT directory-per-day partitioning.

    At 100 TB, `PARTITIONED BY (day)` over years of data explodes into
    ~10⁵ directories of small files; repartitionByRange(ship_date) +
    sort clusters each file's row groups into narrow min/max ranges
    instead, so a date-range scan skips almost every row group via
    parquet zone maps — same pruning effect, constant file count.  The
    read-back filter must still reach the scan (plan-asserted in
    tests/test_plans.py).
    """
    t = Tables(spark, sf_dir)
    path = _scratch("sorted_lineitem")
    (
        t.lineitem.select("l_shipdate", "l_extendedprice")
        .repartitionByRange(8, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    return (
        spark.read.parquet(path)
        .where(
            (F.col("l_shipdate") >= "1996-03-01")
            & (F.col("l_shipdate") < "1996-03-08")
        )
        .groupBy(F.col("l_shipdate").cast("date").alias("ship_day"))
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(28,2)")), 2)
            .cast("double")
            .alias("day_revenue"),
        )
        .orderBy("ship_day")
    )


_DPP_ORACLE = """
    WITH dim(prio, tier) AS (
      VALUES ('1-URGENT', 'hot'), ('2-HIGH', 'hot'), ('3-MEDIUM', 'warm'),
             ('4-NOT SPECIFIED', 'cold'), ('5-LOW', 'cold')
    )
    SELECT d.tier, count(*) AS n_orders,
           CAST(round(sum(o.o_totalprice)::DECIMAL(28,2), 2) AS DOUBLE) AS total
    FROM orders o JOIN dim d ON o.o_orderpriority = d.prio
    WHERE d.tier = 'hot'
    GROUP BY d.tier
"""

_DPP_DIM = [
    ("1-URGENT", "hot"), ("2-HIGH", "hot"), ("3-MEDIUM", "warm"),
    ("4-NOT SPECIFIED", "cold"), ("5-LOW", "cold"),
]


def dpp_join_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned-fact ⋈ filtered-dim plan eligible for dynamic
    partition pruning (build side; writes the partitioned fact once)."""
    t = Tables(spark, sf_dir)
    path = _scratch("dpp_orders")
    proj = t.orders.select("o_orderkey", "o_totalprice", "o_orderpriority")
    proj.write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
    # explicit schema: an empty partitioned write creates no directories,
    # so inference would fail on the empty-ingestion case
    fact = spark.read.schema(proj.schema).parquet(path)
    dim = spark.createDataFrame(_DPP_DIM, "prio string, tier string")
    return (
        fact.join(dim, fact["o_orderpriority"] == dim["prio"])
        .where(F.col("tier") == "hot")
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(28,2)")), 2)
            .cast("double")
            .alias("total"),
        )
    )


@query("filter_dynamic_partition_pruning", _DPP_ORACLE)
def filter_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the filter sits on a DIM attribute
    (`tier`), not the partition column — static pruning is impossible.
    At runtime Catalyst evaluates the dim side first and injects
    `dynamicpruningexpression(o_orderpriority IN <subquery>)` into the
    fact scan's PartitionFilters, so only the matching directories are
    read (plan-asserted in tests/test_plans.py).

    This is THE optimization for star-schema scans at 100 TB: a
    date-dim filter ("fiscal Q3") prunes a years-partitioned fact to
    weeks without the query naming a single partition value.
    """
    return dpp_join_build(spark, sf_dir)


_COMPACTION_ORACLE = """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@query("sink_compaction", _COMPACTION_ORACLE)
def sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: rewrite a fragmented dataset (200 files
    here — the steady-state of frequent small appends) into a few
    right-sized files, preserving content exactly.

    The compaction uses AQE coalescing — `.repartition()` on read-back
    with `coalescePartitions` sizes output splits by bytes, not by the
    input's accidental file count.  At 100 TB this is the maintenance
    job that keeps scan task counts sane (a 10⁶-file table spends more
    time in scheduler+footer overhead than IO).  Data equality is the
    oracle; the file-count drop is pytest-asserted.
    """
    import glob

    t = Tables(spark, sf_dir)
    frag = _scratch("frag_orders")
    compact = _scratch("compact_orders")
    (
        t.orders.select("o_orderkey", "o_orderpriority")
        .repartition(200)
        .write.mode("overwrite")
        .parquet(frag)
    )
    (
        spark.read.parquet(frag)
        .repartition(4)
        .write.mode("overwrite")
        .parquet(compact)
    )
    n_frag = len(glob.glob(f"{frag}/part-*"))
    n_compact = len(glob.glob(f"{compact}/part-*"))
    # empty input degenerates to one empty part file on both sides —
    # nothing to compact, nothing to assert
    if n_frag > 10:
        assert n_compact < n_frag / 10, (n_frag, n_compact)
    return (
        spark.read.parquet(compact)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


_SCD2_ORACLE = """
    WITH target AS (
      SELECT c_custkey, c_mktsegment AS segment FROM customer
    ),
    updates AS (
      SELECT c_custkey, 'PREMIUM' AS segment FROM customer
      WHERE c_acctbal > 9000
    ),
    changed AS (
      SELECT t.c_custkey, t.segment AS old_segment, u.segment AS new_segment
      FROM target t JOIN updates u USING (c_custkey)
      WHERE t.segment <> u.segment
    )
    SELECT c_custkey, segment, valid_from, valid_to, is_current FROM (
      SELECT c_custkey, old_segment AS segment,
             DATE '2020-01-01' AS valid_from, DATE '2024-06-01' AS valid_to,
             false AS is_current
      FROM changed
      UNION ALL
      SELECT c_custkey, new_segment, DATE '2024-06-01', DATE '9999-12-31',
             true
      FROM changed
      UNION ALL
      SELECT t.c_custkey, t.segment, DATE '2020-01-01', DATE '9999-12-31',
             true
      FROM target t
      WHERE NOT EXISTS (SELECT 1 FROM changed c
                        WHERE c.c_custkey = t.c_custkey)
    )
    ORDER BY c_custkey, valid_from
"""


@query("sink_upsert_scd2", _SCD2_ORACLE)
def sink_upsert_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 upsert on plain parquet: changed keys close their
    current version (valid_to = effective date) AND insert a new current
    one; unchanged keys pass through.  The reference grammar parses
    MERGE without executing (Bingql.g4:1143-1160) — this is the
    history-preserving executed equivalent of the WHEN MATCHED /
    NOT MATCHED branches.

    Scale plan: ONE join and ONE pass — the per-key branch (1 row
    unchanged / 2 rows changed) is an explode over a conditionally-built
    array of version structs, not the textbook 3-branch UNION that scans
    the target twice and the join once more.  At 100 TB the dimension
    rewrite would further restrict to affected partitions; the version
    arithmetic is identical.
    """
    t = Tables(spark, sf_dir)
    eff, lo, hi = "2024-06-01", "2020-01-01", "9999-12-31"
    target = t.customer.select("c_custkey", F.col("c_mktsegment").alias("segment"))
    updates = t.customer.where(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("u_custkey"), F.lit("PREMIUM").alias("u_segment")
    )
    ver = "segment string, valid_from date, valid_to date, is_current boolean"
    joined = target.join(
        updates, F.col("c_custkey") == F.col("u_custkey"), "left"
    )
    changed = F.col("u_segment").isNotNull() & (F.col("u_segment") != F.col("segment"))
    versions = F.when(
        changed,
        F.array(
            F.struct(
                F.col("segment"),
                F.lit(lo).cast("date").alias("valid_from"),
                F.lit(eff).cast("date").alias("valid_to"),
                F.lit(False).alias("is_current"),
            ),
            F.struct(
                F.col("u_segment").alias("segment"),
                F.lit(eff).cast("date").alias("valid_from"),
                F.lit(hi).cast("date").alias("valid_to"),
                F.lit(True).alias("is_current"),
            ),
        ),
    ).otherwise(
        F.array(
            F.struct(
                F.col("segment"),
                F.lit(lo).cast("date").alias("valid_from"),
                F.lit(hi).cast("date").alias("valid_to"),
                F.lit(True).alias("is_current"),
            )
        )
    )
    out = _scratch("scd2_customer")
    (
        joined.select("c_custkey", F.explode(versions).alias("v"))
        .select("c_custkey", "v.segment", "v.valid_from", "v.valid_to", "v.is_current")
        .write.mode("overwrite")
        .parquet(out)
    )
    return spark.read.parquet(out).orderBy("c_custkey", "valid_from")


def _spread16(x):
    """Interleave-ready bit spread: 16 data bits → even bit positions
    (classic Morton magic numbers, all JVM-side integer ops)."""
    x = x.bitwiseAND(F.lit(0xFFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
    return x


def zorder_write(spark: SparkSession, sf_dir: str, n_files: int = 8) -> str:
    """Write lineitem clustered by the Morton interleave of (ship-day,
    partkey): range-partition + sort on the z-value so BOTH dimensions
    get file-level locality.

    A date-sorted layout answers date filters from few files but
    spreads every partkey across ALL files; the z-order layout trades
    a little date locality for partkey locality (tests pin the file
    counts).  At 100 TB with column-stat-based file skipping this is
    the difference between scanning 0.5% and 100% of a table for the
    secondary dimension.  16 bits per dimension here; wider domains
    quantize first (bucket ids), same interleave.
    """
    t = Tables(spark, sf_dir)
    li = t.lineitem.select("l_partkey", "l_shipdate", "l_extendedprice")
    day = F.datediff("l_shipdate", F.lit("1995-01-01").cast("date")).cast("long")
    pk = F.col("l_partkey").cast("long")
    z = _spread16(day).bitwiseOR(F.shiftleft(_spread16(pk), 1))
    path = _scratch("zorder_lineitem")
    (
        li.withColumn("z", z)
        .repartitionByRange(n_files, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


_ZORDER_ORACLE = """
    SELECT l_partkey, count(*) AS n_items,
           CAST(SUM(CAST(floor((l_extendedprice) * 10000 + 0.5) AS BIGINT))
                AS DOUBLE) / 10000 AS total_price
    FROM lineitem
    WHERE l_partkey BETWEEN 100 AND 140
    GROUP BY l_partkey
    ORDER BY l_partkey
"""


@query("sink_zorder_clustering", _ZORDER_ORACLE)
def sink_zorder_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered rewrite + secondary-dimension read-back: the
    partkey-range query that a date-sorted layout cannot skip files
    for.  Content preservation is the oracle; the file-skipping
    advantage is pinned in tests/test_plans.py."""
    path = zorder_write(spark, sf_dir)
    return (
        spark.read.parquet(path)
        .where(F.col("l_partkey").between(100, 140))
        .groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_items"),
            (F.sum(money("l_extendedprice").cast("decimal(38,0)")).cast("double") / 10000).alias(
                "total_price"
            ),
        )
        .orderBy("l_partkey")
    )


_ANALYZE_ORACLE = """
    SELECT count(*) AS n_rows,
           count(DISTINCT o_orderpriority) AS ndv_priority
    FROM orders
"""


@query("catalog_analyze_stats", _ANALYZE_ORACLE)
def catalog_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE … COMPUTE STATISTICS (+ FOR COLUMNS): the CBO
    inputs.  Writes the table, analyzes it, then answers row count and
    column NDV FROM CATALOG STATISTICS — no data scan at query time.
    The oracle recomputes both from the data, pinning catalog metadata
    to storage truth (NDV is HLL-based in ANALYZE, exact at this
    cardinality — 5 priorities).

    At 100 TB these stats are what let Catalyst pick broadcast vs
    shuffle joins and order multi-way joins; a stale/absent stats
    catalog silently degrades every plan downstream.
    """
    tbl = "kch_stats_orders"
    t = Tables(spark, sf_dir)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    (
        t.orders.write.mode("overwrite")
        .option("path", _scratch(tbl))
        .format("parquet")
        .saveAsTable(tbl)
    )
    spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS")
    spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS FOR COLUMNS o_orderpriority")
    n_rows = None
    for row in spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").collect():
        if row["col_name"] == "Statistics":
            # "N bytes, M rows"
            n_rows = int(row["data_type"].split(",")[1].strip().split(" ")[0])
    ndv = None
    for row in spark.sql(
        f"DESCRIBE TABLE EXTENDED {tbl} o_orderpriority"
    ).collect():
        if row["info_name"] == "distinct_count":
            ndv = int(row["info_value"])
    return spark.createDataFrame(
        [(n_rows, ndv)], "n_rows bigint, ndv_priority bigint"
    )


_ROLLUP_REUSE_ORACLE = """
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           count(*) AS n_orders,
           CAST(SUM(CAST(floor((o_totalprice) * 10000 + 0.5) AS BIGINT))
                AS DOUBLE) / 10000 AS revenue
    FROM orders
    GROUP BY month
    ORDER BY month
"""


@query("sink_rollup_reuse", _ROLLUP_REUSE_ORACLE)
def sink_rollup_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-rollup reuse (the manual materialized view): a DAY
    level rollup is persisted once; the MONTH query re-aggregates the
    rollup, never the base table.  Counts and fixed-point sums
    re-aggregate losslessly (distributive aggregates) — the oracle
    recomputes from base data to prove the ladder is exact.

    Scale plan: the day rollup is ~5 orders of magnitude smaller than a
    100 TB fact table; every coarser period (week/month/quarter) reads
    it instead.  Non-distributive stats ride along as sketches
    (agg_hll_sketch_union) — same ladder.
    """
    t = Tables(spark, sf_dir)
    day_path = _scratch("rollup_orders_daily")
    (
        t.orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(money("o_totalprice").cast("decimal(38,0)")).alias("rev_scaled"),
        )
        .write.mode("overwrite")
        .parquet(day_path)
    )
    daily = spark.read.parquet(day_path)
    return (
        daily.groupBy(F.trunc("day", "month").alias("month"))
        .agg(
            F.sum("n_orders").alias("n_orders"),
            (F.sum("rev_scaled").cast("double") / 10000).alias("revenue"),
        )
        .orderBy("month")
    )


_INSERT_VALUES_ORACLE = """
    SELECT id, label, CAST(score AS DOUBLE) AS score FROM (VALUES
      (1, 'alpha', 10.5), (2, 'beta', 20.25), (3, 'gamma', 30.0),
      (4, 'delta', 4.75)
    ) AS t(id, label, score)
    ORDER BY id
"""


@query("sink_insert_values", _INSERT_VALUES_ORACLE)
def sink_insert_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`INSERT INTO … VALUES` executed (the reference parses but skips
    it — insert_stmt_rows Bingql.g4:687-693, skip at
    SqlMetaDataExtractor.java:590-593): literal-row seed + append into
    a real table, read back.  The metadata-table pattern (dim seeds,
    config rows) — never the bulk path.
    """
    tbl = "kch_values_seed"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(
        f"CREATE TABLE {tbl} (id INT, label STRING, score DOUBLE)"
        f" USING parquet LOCATION '{_scratch(tbl)}'"
    )
    spark.sql(
        f"INSERT OVERWRITE {tbl} VALUES"
        " (1, 'alpha', 10.5), (2, 'beta', 20.25), (3, 'gamma', 30.0)"
    )
    spark.sql(f"INSERT INTO {tbl} VALUES (4, 'delta', 4.75)")
    return spark.table(tbl).orderBy("id")


_CREATE_LIKE_ORACLE = """
    SELECT n_name, n_regionkey FROM nation
    WHERE n_regionkey = 3 ORDER BY n_name
"""


@query("sink_create_table_like", _CREATE_LIKE_ORACLE)
def sink_create_table_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`CREATE TABLE … LIKE` executed (the reference extracts the clone's
    schema lineage, visitCreate_table_stmt LIKE branch
    SqlMetaDataExtractor.java:680-699): clone an existing table's
    schema WITHOUT data, then populate the clone and read it back —
    the staging-table idiom (same shape as production, isolated data).
    """
    import shutil

    t = Tables(spark, sf_dir)
    src, clone = "kch_like_src", "kch_like_clone"
    for tbl in (src, clone):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        # DROP on an external-LOCATION table leaves files behind; a
        # previous run's data would make the "empty clone" assert lie
        shutil.rmtree(_scratch(tbl), ignore_errors=True)
    (
        t.nation.select("n_name", "n_regionkey")
        .where(F.col("n_regionkey") == 0)
        .write.mode("overwrite")
        .option("path", _scratch(src))
        .format("parquet")
        .saveAsTable(src)
    )
    spark.sql(f"CREATE TABLE {clone} LIKE {src} LOCATION '{_scratch(clone)}'")
    assert spark.table(clone).count() == 0  # schema clone, no data
    t.nation.select("n_name", "n_regionkey").where(
        F.col("n_regionkey") == 3
    ).write.insertInto(clone)
    return spark.table(clone).orderBy("n_name")


# ---------------------------------------------- write-audit-publish gate

_WAP_ORACLE = """
    WITH kept AS (
      SELECT doc_id, lang, text,
             ROW_NUMBER() OVER (
               PARTITION BY md5(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
               ORDER BY doc_id) AS rn
      FROM documents
      WHERE length(text) BETWEEN 100 AND 20000
    ),
    staged AS (SELECT * FROM kept WHERE rn = 1)
    SELECT * FROM (
      SELECT 'row_count' AS check_name,
             count(*)::BIGINT AS value,
             1::BIGINT AS threshold,
             CASE WHEN count(*) >= 1 THEN 1 ELSE 0 END AS passed
      FROM staged
      UNION ALL
      SELECT 'null_text', count(*) FILTER (WHERE text IS NULL)::BIGINT,
             0::BIGINT,
             CASE WHEN count(*) FILTER (WHERE text IS NULL) <= 0
                  THEN 1 ELSE 0 END
      FROM staged
      UNION ALL
      SELECT 'distinct_langs', count(DISTINCT lang)::BIGINT, 2::BIGINT,
             CASE WHEN count(DISTINCT lang) >= 2 THEN 1 ELSE 0 END
      FROM staged
      UNION ALL
      SELECT 'dup_rate_pct', 0::BIGINT, 0::BIGINT, 1
    ) ORDER BY check_name
"""


@query("sink_write_audit_publish", _WAP_ORACLE)
def sink_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish: the curated corpus lands in a STAGING
    location, audit checks run against the staged files (row count,
    null keys, language coverage, residual duplicate rate), and only a
    fully-green audit promotes staging to published via an atomic
    pointer swap — readers never observe a partially-written or
    failed-quality corpus.  This is the quality gate pattern every
    production 100 TB pipeline runs between compute and consumption.

    Returns the audit report; the publish happens as a side effect when
    every check passes (asserted in tests).  Scale: audits are
    aggregations over the staged data (one scan) and the swap is a
    metadata operation.
    """
    import shutil

    from pyspark.sql import Window

    from kachess_spark.catalog import load_table

    root = _scratch("wap")
    shutil.rmtree(root, ignore_errors=True)
    staging = os.path.join(root, "staging")
    published = os.path.join(root, "published")

    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.regexp_replace(F.col("text"), "[^a-zA-Z0-9 ]", "")))
    w = Window.partitionBy(fp).orderBy("doc_id")
    curated = (
        docs.where(F.length("text").between(100, 20000))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    curated.write.mode("overwrite").parquet(staging)

    staged = spark.read.parquet(staging)
    fp2 = F.md5(F.lower(F.regexp_replace(F.col("text"), "[^a-zA-Z0-9 ]", "")))
    m = staged.agg(
        F.count("*").alias("row_count"),
        F.count(F.when(F.col("text").isNull(), 1)).alias("null_text"),
        F.countDistinct("lang").alias("distinct_langs"),
        (F.count("*") - F.countDistinct(fp2)).alias("residual_dups"),
    ).collect()[0]
    checks = [
        ("row_count", int(m["row_count"]), 1, int(m["row_count"]) >= 1),
        ("null_text", int(m["null_text"]), 0, int(m["null_text"]) <= 0),
        (
            "distinct_langs",
            int(m["distinct_langs"]),
            2,
            int(m["distinct_langs"]) >= 2,
        ),
        ("dup_rate_pct", int(m["residual_dups"]), 0, m["residual_dups"] == 0),
    ]
    if all(ok for *_, ok in checks):
        # atomic-ish publish: pointer swap, same pattern as the
        # foreachBatch upsert's versioned serving table
        tmp = published + ".tmp"
        if os.path.islink(tmp) or os.path.exists(tmp):
            os.remove(tmp)
        os.symlink(staging, tmp)
        os.replace(tmp, published)
    return spark.createDataFrame(
        [(n, v, t, 1 if ok else 0) for n, v, t, ok in checks],
        "check_name string, value bigint, threshold bigint, passed int",
    ).orderBy("check_name")


# ------------------------------------------------ snapshot time travel

_SNAPSHOT_ORACLE = """
    SELECT 1 AS version, count(*) AS n_rows,
           CAST(SUM(CAST(floor((o_totalprice) * 10000 + 0.5) AS BIGINT))
                AS DOUBLE) / 10000 AS total
    FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
    UNION ALL
    SELECT 2 AS version, count(*) AS n_rows,
           CAST(SUM(CAST(floor((o_totalprice) * 10000 + 0.5) AS BIGINT))
                AS DOUBLE) / 10000 AS total
    FROM orders
    ORDER BY version
"""


@query("sink_snapshot_time_travel", _SNAPSHOT_ORACLE)
def sink_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot isolation + time travel on plain parquet via versioned
    file manifests (the mechanism under Iceberg/Delta, minus the spec):
    every commit writes NEW data files plus an immutable manifest
    listing the snapshot's complete file set; readers resolve a version
    to its manifest and read exactly those files — an in-flight commit
    is invisible until its manifest lands, and history stays queryable.

    Commit 1 = orders before 1996; commit 2 appends the rest.  The
    result reads BOTH snapshots back through their manifests (v1 must
    still see only pre-1996 data after v2 commits) and aggregates each
    — pinned exactly by the oracle.

    Scale: manifests are file lists (metadata); a reader never lists
    the data directory (object-store listing is the scale killer —
    manifests make planning O(files in snapshot), and at real scale
    they'd carry per-file column min/max for pruning)."""
    import json as _json
    import shutil

    from kachess_spark.operators._util import dsum

    root = _scratch("snapshots")
    shutil.rmtree(root, ignore_errors=True)
    data, meta = os.path.join(root, "data"), os.path.join(root, "meta")
    os.makedirs(data, exist_ok=True)
    os.makedirs(meta, exist_ok=True)

    t = Tables(spark, sf_dir)

    def commit(version: int, df: DataFrame, prev: list[str]) -> list[str]:
        out = os.path.join(data, f"c{version}")
        df.write.mode("overwrite").parquet(out)
        files = prev + [
            os.path.join(out, f)
            for f in sorted(os.listdir(out))
            if f.endswith(".parquet")
        ]
        tmp = os.path.join(meta, f"v{version}.json.tmp")
        with open(tmp, "w") as fh:
            _json.dump(files, fh)
        os.replace(tmp, os.path.join(meta, f"v{version}.json"))
        return files

    def read_snapshot(version: int) -> DataFrame:
        with open(os.path.join(meta, f"v{version}.json")) as fh:
            return spark.read.parquet(*_json.load(fh))

    early = t.orders.where(F.col("o_orderdate") < "1996-01-01")
    late = t.orders.where(F.col("o_orderdate") >= "1996-01-01")
    v1_files = commit(1, early, [])
    commit(2, late, v1_files)

    parts = [
        read_snapshot(v).agg(
            F.lit(v).alias("version"),
            F.count("*").alias("n_rows"),
            dsum("o_totalprice", "total"),
        )
        for v in (1, 2)
    ]
    return parts[0].unionByName(parts[1]).orderBy("version")
