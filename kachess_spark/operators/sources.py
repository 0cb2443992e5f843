"""Additional source formats (SURVEY.md §2.1 "sources" beyond parquet):
CSV, JSON-lines, and parquet schema evolution.

Fixtures are committed under tests/fixtures/ so both engines read the
same static bytes in any order.  Schema declarations are explicit on the
Spark side — at 100 TB, schema inference means a full extra pass over
the data (never ship an inferred-schema job).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kachess_spark.catalog import Tables
from kachess_spark.registry import query

# Per-micro-run ceiling on the driver-collected new-file list: bounds
# driver memory on multi-million-file deltas; the manifest checkpoint
# makes the overflow remain "new" for the next run.
MAX_NEW_FILES_PER_RUN = 100_000


def capped_delta(listed_df, seen_df, cap: int = MAX_NEW_FILES_PER_RUN):
    """Oldest-first prefix (≤ cap paths) of listed minus seen — the only
    part of incremental ingestion that ever reaches the driver."""
    new = (
        listed_df.join(seen_df, "path", "left_anti")
        if seen_df is not None
        else listed_df
    )
    return [r["path"] for r in new.orderBy("path").limit(cap).collect()]

_FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "fixtures",
)


def _fx(name: str) -> str:
    return os.path.join(_FIXTURES, name)


_CSV_ORACLE = f"""
    SELECT item_id,
           count(*) AS n_ratings,
           ROUND(SUM(rating)::DOUBLE / count(*), 4) AS avg_rating
    FROM read_csv('{_fx("ratings.csv")}', header=true,
                  columns={{'user_id': 'BIGINT', 'item_id': 'BIGINT',
                            'rating': 'BIGINT'}})
    GROUP BY item_id
    HAVING count(*) >= 3
    ORDER BY item_id
"""


@query("source_csv_ratings", _CSV_ORACLE)
def source_csv_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source with an explicit schema (no inference pass), aggregated.
    Integer sums → exact cross-engine average."""
    df = spark.read.csv(
        _fx("ratings.csv"),
        header=True,
        schema="user_id BIGINT, item_id BIGINT, rating BIGINT",
    )
    return (
        df.groupBy("item_id")
        .agg(
            F.count("*").alias("n_ratings"),
            F.round(F.sum("rating").cast("double") / F.count("*"), 4).alias(
                "avg_rating"
            ),
        )
        .where(F.col("n_ratings") >= 3)
        .orderBy("item_id")
    )


_JSON_ORACLE = f"""
    SELECT page,
           count(DISTINCT session) AS n_sessions,
           SUM(ms)::BIGINT AS total_ms
    FROM read_json('{_fx("clicks.jsonl")}',
                   columns={{'session': 'VARCHAR', 'page': 'VARCHAR',
                             'ms': 'BIGINT'}})
    GROUP BY page
    ORDER BY page
"""


@query("source_jsonl_clicks", _JSON_ORACLE)
def source_jsonl_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source with explicit schema; per-page session stats."""
    df = spark.read.json(
        _fx("clicks.jsonl"), schema="session STRING, page STRING, ms BIGINT"
    )
    return (
        df.groupBy("page")
        .agg(
            F.countDistinct("session").alias("n_sessions"),
            F.sum("ms").cast("bigint").alias("total_ms"),
        )
        .orderBy("page")
    )


_EVO_ORACLE = f"""
    SELECT id, name, score
    FROM read_parquet(['{_fx("evo_v1.parquet")}', '{_fx("evo_v2.parquet")}'],
                      union_by_name=true)
    ORDER BY id
"""


@query("source_schema_evolution", _EVO_ORACLE)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema evolution: v2 files added a column; mergeSchema
    unions the schemas and older files read NULL for it — how long-lived
    100 TB tables absorb schema change without rewrites."""
    df = spark.read.option("mergeSchema", "true").parquet(
        _fx("evo_v1.parquet"), _fx("evo_v2.parquet")
    )
    return df.select("id", "name", "score").orderBy("id")


_SPINE_ORACLE = """
    SELECT d::DATE AS day,
           (dayofweek(d) IN (0, 6)) AS is_weekend,
           CAST(EXTRACT(month FROM d) AS INT) AS month,
           CAST(EXTRACT(week FROM d) AS INT) AS iso_week
    FROM generate_series(DATE '2024-01-01', DATE '2024-12-31',
                         INTERVAL 1 DAY) AS t(d)
    ORDER BY day
"""


@query("source_date_spine", _SPINE_ORACLE)
def source_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar dimension generated in-engine (sequence + explode) — the
    standard date-spine pattern; no input files, fully deterministic.
    DuckDB dayofweek is 0=Sunday; Spark weekday() is 0=Monday, so the
    weekend test maps weekday>=5."""
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-12-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    return days.select(
        "day",
        (F.weekday("day") >= 5).alias("is_weekend"),
        F.month("day").cast("int").alias("month"),
        F.weekofyear("day").cast("int").alias("iso_week"),
    ).orderBy("day")


_PERMISSIVE_ORACLE = f"""
    WITH raw AS (
      SELECT * FROM read_csv('{_fx("messy.csv")}', header=true,
                    columns={{'order_id': 'BIGINT', 'amount': 'VARCHAR',
                              'status': 'VARCHAR'}})
    )
    SELECT
      count(*) FILTER (WHERE TRY_CAST(amount AS BIGINT) IS NOT NULL
                       OR amount IS NULL)                        AS n_good,
      count(*) FILTER (WHERE amount IS NOT NULL
                       AND TRY_CAST(amount AS BIGINT) IS NULL)   AS n_corrupt,
      CAST(SUM(TRY_CAST(amount AS BIGINT)) AS BIGINT)            AS good_total
    FROM raw
"""


@query("source_csv_permissive", _PERMISSIVE_ORACLE)
def source_csv_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant CSV ingestion: PERMISSIVE mode with a
    ``_corrupt_record`` capture column — malformed rows (non-numeric
    amounts here) land in the capture column instead of failing the
    job, and are counted/quarantined in the same pass.

    The 100 TB reality: a trillion-row feed WILL contain garbage;
    FAILFAST kills the job at hour 9, DROPMALFORMED silently loses
    data — PERMISSIVE + quarantine accounting is the only auditable
    mode.  The oracle reproduces good/corrupt classification with
    TRY_CAST.
    """
    df = spark.read.csv(
        _fx("messy.csv"),
        header=True,
        schema="order_id BIGINT, amount BIGINT, status STRING, _corrupt_record STRING",
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    )
    # caching required to observe _corrupt_record alongside parsed
    # columns (Spark's documented contract for the capture column)
    df = df.cache()
    return df.agg(
        F.count(F.when(F.col("_corrupt_record").isNull(), 1)).alias("n_good"),
        F.count(F.when(F.col("_corrupt_record").isNotNull(), 1)).alias("n_corrupt"),
        F.sum(F.when(F.col("_corrupt_record").isNull(), F.col("amount"))).alias(
            "good_total"
        ),
    )


_FILE_METADATA_ORACLE = """
    SELECT o_orderpriority, count(*) AS n_rows
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@query("source_file_metadata", _FILE_METADATA_ORACLE)
def source_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden ``_metadata`` columns on file sources: per-row provenance
    (file path, size, modification time) without any data column — the
    ingestion-audit primitive (which file contributed which rows,
    quarantine by file, late-file detection).

    Here: a partitioned rewrite is read back and every row's priority
    is recovered FROM ITS FILE PATH alone (regexp over
    ``_metadata.file_path``), proving the per-file row accounting
    matches the data's own group counts.
    """
    import os

    from kachess_spark.catalog import Tables

    t = Tables(spark, sf_dir)
    path = os.path.join("/tmp/kachess_sinks", "meta_orders")
    proj = t.orders.select("o_orderkey", "o_orderpriority")
    proj.write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
    # explicit schema: an empty partitioned write creates no directories
    return (
        spark.read.schema(proj.schema).parquet(path)
        .select(
            F.regexp_extract(
                F.col("_metadata.file_path"), r"o_orderpriority=([^/]+)/", 1
            ).alias("encoded")
        )
        .select(F.url_decode("encoded").alias("o_orderpriority"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_rows"))
        .orderBy("o_orderpriority")
    )


# ------------------------------------------------- incremental ingestion

_INCR_ORACLE = """
    SELECT 1 AS run, 4 AS n_new_files, count(*) AS n_docs
    FROM documents WHERE doc_id % 6 < 4
    UNION ALL
    SELECT 2 AS run, 2 AS n_new_files, count(*) AS n_docs
    FROM documents WHERE doc_id % 6 >= 4
    ORDER BY run
"""


@query("source_incremental_files", _INCR_ORACLE)
def source_incremental_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental batch ingestion with a file manifest: each run lists
    the landing directory, anti-joins against the manifest of
    already-processed files, processes ONLY the new ones, and appends
    them to the manifest — the batch Auto-Loader pattern that makes
    re-running an ingestion job idempotent and O(new data), never
    O(corpus).

    Exercised end-to-end: documents are landed as 6 chunk files in two
    drops (4, then 2); run 1 must ingest exactly the first four chunks
    and run 2 exactly the two late ones.  The oracle pins both runs'
    file and row counts via the chunks' doc_id%6 derivation.

    Scale: the directory listing and manifest are metadata-sized (file
    paths, not data); the data read is pruned to the new files before
    any scan, so a 100 TB corpus with 1 TB of new files reads 1 TB.
    The driver-collected new-path list is CAPPED at
    MAX_NEW_FILES_PER_RUN per micro-run — a multi-million-file delta is
    drained over successive runs (the manifest checkpoint keeps the
    overflow "new"), so driver memory stays bounded no matter how far
    behind the ingestion is.
    """
    import shutil

    from kachess_spark.catalog import load_table
    from kachess_spark.operators.sinks import _scratch

    root = _scratch("incr_ingest")
    shutil.rmtree(root, ignore_errors=True)
    land = os.path.join(root, "landing")
    manifest = os.path.join(root, "manifest")
    os.makedirs(land, exist_ok=True)

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "chunk", F.col("doc_id") % 6
    )

    def drop_chunks(chunks):
        for b in chunks:
            docs.where(F.col("chunk") == b).drop("chunk").coalesce(
                1
            ).write.mode("overwrite").parquet(os.path.join(land, f"chunk_{b}"))

    def ingest(run: int):
        listed = sorted(
            os.path.join(land, d)
            for d in os.listdir(land)
            if d.startswith("chunk_")
        )
        listed_df = spark.createDataFrame(
            [(p,) for p in listed], "path string"
        )
        seen = (
            spark.read.parquet(manifest).select("path")
            if os.path.exists(manifest)
            else None
        )
        # capped + deterministic: oldest-first prefix of the delta; the
        # un-taken remainder stays absent from the manifest, so the next
        # run picks it up
        new_paths = capped_delta(listed_df, seen, MAX_NEW_FILES_PER_RUN)
        if not new_paths:
            return None
        batch = spark.read.parquet(*new_paths)
        n_docs = batch.count()
        spark.createDataFrame(
            [(p, run) for p in new_paths], "path string, run int"
        ).write.mode("append").parquet(manifest)
        return (run, len(new_paths), n_docs)

    drop_chunks(range(4))
    r1 = ingest(1)
    drop_chunks(range(4, 6))
    r2 = ingest(2)
    return spark.createDataFrame(
        [r for r in (r1, r2) if r],
        "run int, n_new_files int, n_docs bigint",
    ).orderBy("run")


# ----------------------------------------------- binary-file ingestion

N_BINARY_IMGS = 12


def _binary_oracle() -> str:
    """Construction-pinned VALUES oracle: expected (img_id, n_bytes,
    width, height) computed at import time from the SAME tiny_png
    construction the operator writes — a PASS proves the binaryFile
    source read the real bytes and the JVM header parse extracted the
    true dimensions (zlib output is deterministic for fixed input)."""
    from kachess_spark.pipeline.multimodal import tiny_png

    rows = ", ".join(
        f"({i}, {len(tiny_png(i % 16 + 1, i % 12 + 1))},"
        f" {i % 16 + 1}, {i % 12 + 1})"
        for i in range(N_BINARY_IMGS)
    )
    return f"""
    SELECT img_id, n_bytes, width, height
    FROM (VALUES {rows}) t(img_id, n_bytes, width, height)
    ORDER BY img_id
    """


@query("source_binary_files", _binary_oracle())
def source_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`binaryFile` ingestion — the multimodal landing pattern: a
    directory of opaque payload files becomes (path, length, content)
    rows, and cheap metadata (PNG IHDR width/height here) is extracted
    JVM-side from the first bytes with substring/hex/conv — no Python,
    no full decode.

    Scale: binaryFile lists and reads files in parallel across
    executors (one task per file group); the header parse touches 8
    bytes of each content column, so a metadata pass over a 100 TB
    image corpus reads headers, not pixels.  Writing the fixture files
    is driver-side here only because they are the fixture.
    """
    import atexit
    import shutil
    import tempfile
    import uuid

    from kachess_spark.pipeline.multimodal import tiny_png

    d = os.path.join(
        tempfile.gettempdir(),
        f"kachess_binsrc_{os.getpid()}_{uuid.uuid4().hex[:8]}",
    )
    os.makedirs(d, exist_ok=True)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    for i in range(N_BINARY_IMGS):
        with open(os.path.join(d, f"img_{i:03d}.png"), "wb") as fh:
            fh.write(tiny_png(i % 16 + 1, i % 12 + 1))
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(d)
    )
    be_int = lambda pos: F.conv(  # noqa: E731 — big-endian u32 at pos
        F.hex(F.expr(f"substring(content, {pos}, 4)")), 16, 10
    ).cast("int")
    return (
        df.select(
            F.regexp_extract(F.col("path"), r"img_(\d+)\.png", 1)
            .cast("int")
            .alias("img_id"),
            F.col("length").cast("int").alias("n_bytes"),
            be_int(17).alias("width"),
            be_int(21).alias("height"),
        )
        .orderBy("img_id")
    )


# -------------------------------------------- tar-shard (WebDataset) source

N_TAR_SHARDS = 3
N_TAR_MEMBERS = 4


def _tar_expected() -> list[tuple[int, str, int, int]]:
    """(shard, member, width, height) the construction writes."""
    return [
        (s, f"sample_{s}_{m}.png", (s * N_TAR_MEMBERS + m) % 16 + 1,
         (s * N_TAR_MEMBERS + m) % 12 + 1)
        for s in range(N_TAR_SHARDS)
        for m in range(N_TAR_MEMBERS)
    ]


def _tar_oracle() -> str:
    rows = ", ".join(
        f"({s}, '{name}', {w}, {h})" for s, name, w, h in _tar_expected()
    )
    return f"""
    SELECT shard, member, width, height
    FROM (VALUES {rows}) t(shard, member, width, height)
    ORDER BY shard, member
    """


def _tar_member_batches(batches):
    """Arrow-batched shard expansion: one input row per tar shard, one
    output row per member — tarfile + the stdlib header sniffer, no
    image library, no driver involvement."""
    import io
    import re
    import tarfile

    import pandas as pd

    from kachess_spark.pipeline.multimodal import sniff_image_dims

    for pdf in batches:
        out = []
        for path, payload in zip(pdf["path"], pdf["content"]):
            shard = int(re.search(r"shard_(\d+)\.tar", path).group(1))
            with tarfile.open(fileobj=io.BytesIO(bytes(payload))) as tf:
                for mem in tf.getmembers():
                    data = tf.extractfile(mem).read()
                    dims = sniff_image_dims(data) or (-1, -1)
                    out.append((shard, mem.name, dims[0], dims[1]))
        yield pd.DataFrame(out, columns=["shard", "member", "width", "height"])


@query("source_tar_shards", _tar_oracle())
def source_tar_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style tar-shard ingestion: multimodal training corpora
    ship as tar shards of samples (the WebDataset layout); each shard is
    one `binaryFile` row, and an Arrow-batched kernel expands it to
    per-member rows with header-sniffed image dimensions — shard
    expansion happens ON the executor that read the shard, so a 100 TB
    corpus streams shard-parallel with zero driver involvement and no
    small-file problem (the whole point of sharding).

    Oracle pins member names and true PNG dimensions to the writer's
    construction, proving the tar walk and the header parse on real
    bytes.
    """
    import atexit
    import shutil
    import tarfile
    import tempfile
    import uuid

    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from kachess_spark.pipeline.multimodal import tiny_png

    d = os.path.join(
        tempfile.gettempdir(),
        f"kachess_tarsrc_{os.getpid()}_{uuid.uuid4().hex[:8]}",
    )
    os.makedirs(d, exist_ok=True)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    for s in range(N_TAR_SHARDS):
        with tarfile.open(os.path.join(d, f"shard_{s}.tar"), "w") as tf:
            for m in range(N_TAR_MEMBERS):
                i = s * N_TAR_MEMBERS + m
                payload = tiny_png(i % 16 + 1, i % 12 + 1)
                info = tarfile.TarInfo(name=f"sample_{s}_{m}.png")
                info.size = len(payload)
                import io as _io

                tf.addfile(info, _io.BytesIO(payload))
    shards = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(d)
        .select("path", "content")
    )
    schema = StructType(
        [
            StructField("shard", IntegerType()),
            StructField("member", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )
    return shards.mapInPandas(_tar_member_batches, schema=schema).orderBy(
        "shard", "member"
    )


# ------------------------------------------------ fixed-width source

_FW_WIDTHS = (4, 20, 4)  # nationkey, name, regionkey


@query(
    "source_fixed_width",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    ORDER BY n_nationkey
    """,
)
def source_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width text ingestion (the mainframe/COBOL copybook format
    ETL still meets): write nation as right-padded fixed columns, read
    the lines back with ``spark.read.text`` and slice fields by
    substring offsets — the round trip must reproduce the table
    exactly.

    Scale: a text scan is splittable by line, so the substring slicing
    is one narrow codegen projection over arbitrarily many partitions —
    fixed-width at 100 TB reads exactly like CSV minus the quoting
    hazard; the offsets come from the copybook (here ``_FW_WIDTHS``),
    never from data inspection.

    The round-trip staging dir is deterministic per process (overwrite
    mode — repeat invocations reuse it, nothing accumulates) and is
    removed at interpreter exit.  Writing to the driver's local temp
    dir and reading it back assumes driver-and-executor-shared storage,
    which holds in local mode only; on a real cluster the staging path
    must be shared storage (HDFS/object store) — in this harness the
    local temp dir IS that shared filesystem.
    """
    import atexit as _atexit
    import os as _os
    import shutil as _shutil
    import tempfile

    t = Tables(spark, sf_dir)
    w1, w2, w3 = _FW_WIDTHS
    line = F.concat(
        F.rpad(F.col("n_nationkey").cast("string"), w1, " "),
        F.rpad(F.col("n_name"), w2, " "),
        F.rpad(F.col("n_regionkey").cast("string"), w3, " "),
    )
    path = _os.path.join(
        tempfile.gettempdir(), f"kachess_fw_{_os.getpid()}"
    )
    _atexit.register(_shutil.rmtree, path, ignore_errors=True)
    t.nation.select(line.alias("value")).write.mode("overwrite").text(path)
    raw = spark.read.text(path)
    return (
        raw.select(
            F.trim(F.substring("value", 1, w1)).cast("bigint").alias(
                "n_nationkey"
            ),
            F.trim(F.substring("value", w1 + 1, w2)).alias("n_name"),
            F.trim(F.substring("value", w1 + w2 + 1, w3))
            .cast("bigint")
            .alias("n_regionkey"),
        )
        .orderBy("n_nationkey")
    )


# ---------------------------------- Spark 4 Python custom DataSource

SPINE_END = 10_000  # rows generated by the demo spine source
SPINE_PARTS = 8


def _register_spine_source(spark: SparkSession) -> None:
    """Register the `kachess_spine` Python DataSource (Spark 4 custom
    data source API).  Defined inside the function so the class ships
    to executors by value (cloudpickle), not by module import."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )
    from pyspark.sql.types import StructType

    class SpineReader(DataSourceReader):
        def __init__(self, options):
            self.end = int(options.get("end", SPINE_END))
            self.parts = int(options.get("parts", SPINE_PARTS))

        def partitions(self):
            # contiguous ranges, one InputPartition each — the planner
            # schedules them as independent tasks.  end<=0 or parts<=0
            # is an empty spine, not a range() crash (step 0).
            if self.end <= 0 or self.parts <= 0:
                return []
            step = -(-self.end // self.parts)
            return [
                InputPartition((lo, min(lo + step, self.end)))
                for lo in range(0, self.end, step)
            ]

        def read(self, partition):
            import hashlib

            lo, hi = partition.value
            for n in range(lo, hi):
                yield (
                    n,
                    n * n,
                    hashlib.md5(str(n).encode()).hexdigest()[:2],
                )

    class SpineDataSource(DataSource):
        @classmethod
        def name(cls):
            return "kachess_spine"

        def schema(self):
            return "n BIGINT, n_sq BIGINT, bucket STRING"

        def reader(self, schema: StructType):
            return SpineReader(self.options)

    try:
        spark.dataSource.register(SpineDataSource)
    except Exception as exc:
        # Swallow ONLY the re-registration case; a real failure
        # (unsupported Spark version, pickling error) must surface here,
        # not later as a confusing DATA_SOURCE_NOT_FOUND at load time.
        # Match the error CLASS first (stable across Spark versions and
        # locales); the message substring is only a fallback for
        # exceptions outside the PySpark error framework.
        try:
            err_cls = exc.getErrorClass()
        except Exception:
            err_cls = None
        if err_cls is not None:
            # definite error class: trust it outright — the substring
            # fallback must not swallow a DIFFERENT framework error whose
            # message merely mentions an existing path/object
            if err_cls != "DATA_SOURCE_ALREADY_EXISTS":
                raise
        elif (
            "already" not in str(exc).lower()
            and "exists" not in str(exc).lower()
        ):
            raise


@query(
    "source_python_datasource",
    oracle=f"""
    SELECT bucket,
           count(*) AS n_rows,
           CAST(SUM(n) AS BIGINT) AS sum_n,
           CAST(SUM(n_sq) AS BIGINT) AS sum_sq
    FROM (
      SELECT n, n * n AS n_sq,
             substr(md5(CAST(n AS VARCHAR)), 1, 2) AS bucket
      FROM range({SPINE_END}) t(n)
    )
    GROUP BY bucket ORDER BY bucket
    """,
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python custom DataSource API (pyspark.sql.datasource):
    a from-scratch source with EXPLICIT partition planning — the
    registered `kachess_spine` source splits its integer spine into
    {SPINE_PARTS} InputPartitions, each read independently on an
    executor, then aggregates per md5 bucket.  This is the extension
    point for ingesting formats Spark has no reader for (proprietary
    blobs, REST-paginated APIs, queue snapshots) while keeping
    partition-parallel scheduling, predicate-agnostic schema
    declaration, and Arrow-batched rows.

    Scale: a custom source's parallelism is its partitions() plan —
    here contiguous ranges (for an API it would be page tokens, for a
    blob store a file manifest); everything downstream is ordinary
    codegen relational work.  The md5 derivation happens in the
    reader itself to prove arbitrary Python runs per-partition, not
    on the driver.
    """
    _register_spine_source(spark)
    df = spark.read.format("kachess_spine").option("end", SPINE_END).load()
    return (
        df.groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("n").cast("bigint").alias("sum_n"),
            F.sum("n_sq").cast("bigint").alias("sum_sq"),
        )
        .orderBy("bucket")
    )
