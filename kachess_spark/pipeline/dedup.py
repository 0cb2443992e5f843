"""Deduplication operators over the documents table.

Exact (hash-groupBy), MinHash+LSH (shingle → minhash → band →
bucket-join), and n-gram Jaccard verification.  SimHash lives here too.

Scale design: nothing here is all-pairs.  Exact dedup shuffles on a
16-byte digest; MinHash candidates come from band-bucket joins (only
docs sharing a band collide); Jaccard runs only on candidate pairs.
MinHash uses md5(salt || shingle) with the *lexicographic* min — a
portable permutation-free MinHash whose oracle twin is plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kachess_spark.catalog import Tables
from kachess_spark.registry import query

N_HASHES = 6  # minhash signature length
BAND_SIZE = 2  # rows per LSH band → 3 bands; bands match at J≳0.5


def _canon(col):
    """Canonical token stream: lowercase, alnum+space only."""
    return F.lower(F.regexp_replace(col, "[^a-zA-Z0-9 ]", ""))


_CANON_SQL = "lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))"


# NOTE: shingle + minhash expressions use F.expr with explicit SQL
# lambda variables.  Nesting PySpark python-lambda higher-order
# functions (transform inside transform) mis-binds the lambda variables
# — explicit SQL text has no such ambiguity.
_WORDS_EXPR = "split(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '')), ' ')"
_SHINGLES_EXPR = """
    array_distinct(transform(
      sequence(0, size(words) - 3),
      i -> concat_ws(' ', words[i], words[i + 1], words[i + 2])))
"""


def _with_shingles(docs: DataFrame) -> DataFrame:
    """doc_id + distinct word-3-gram shingle array (≥3-word docs only)."""
    return (
        docs.select("doc_id", F.expr(_WORDS_EXPR).alias("words"))
        .where(F.size("words") >= 3)
        .select("doc_id", F.expr(_SHINGLES_EXPR).alias("shingles"))
    )


_SHINGLES_SQL = f"""
    list_distinct(list_transform(
      range(1, len(string_split({_CANON_SQL}, ' ')) - 1),
      i -> string_split({_CANON_SQL}, ' ')[i] || ' ' ||
           string_split({_CANON_SQL}, ' ')[i+1] || ' ' ||
           string_split({_CANON_SQL}, ' ')[i+2]))
"""


def minhash_signature(doc: DataFrame) -> DataFrame:
    """doc_id + mh_0..mh_{N-1} minhash columns (library entry point).

    MinHash via min(md5(salt_i || shingle)) — a permutation-free,
    engine-portable MinHash (lexicographic min over salted digests).
    """
    cols = [
        F.expr(
            f"array_min(transform(shingles, s -> md5(concat('s{i}|', s))))"
        ).alias(f"mh_{i}")
        for i in range(N_HASHES)
    ]
    return _with_shingles(doc).select("doc_id", *cols)


def _oracle_minhash(i: int) -> str:
    return (
        f"list_aggregate(list_transform({_SHINGLES_SQL},"
        f" s -> md5('s{i}|' || s)), 'min') AS mh_{i}"
    )


@query(
    "dedup_exact",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))) AS fp
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, fp,
             ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn,
             COUNT(*)     OVER (PARTITION BY fp) AS group_size
      FROM fp
    )
    SELECT doc_id, fp, group_size, CASE WHEN rn = 1 THEN 1 ELSE 0 END AS keep
    FROM ranked
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: canonical-md5 groupBy, keep lowest doc_id per group.

    One shuffle on the digest; the window is per-digest (tiny groups).
    Deterministic keep-first (vs dropDuplicates' arbitrary pick).
    """
    t = Tables(spark, sf_dir)
    fp = t.documents.select("doc_id", F.md5(_canon(F.col("text"))).alias("fp"))
    w = Window.partitionBy("fp").orderBy("doc_id")
    return fp.select(
        "doc_id",
        "fp",
        F.count("*").over(Window.partitionBy("fp")).alias("group_size"),
        F.when(F.row_number().over(w) == 1, 1).otherwise(0).alias("keep"),
    )


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH sigs AS (
      SELECT doc_id, {", ".join(_oracle_minhash(i) for i in range(N_HASHES))}
      FROM documents
      WHERE len(string_split({_CANON_SQL}, ' ')) >= 3
    ),
    bands AS (
      SELECT doc_id, 0 AS band, mh_0 || '|' || mh_1 AS band_key FROM sigs
      UNION ALL
      SELECT doc_id, 1 AS band, mh_2 || '|' || mh_3 AS band_key FROM sigs
      UNION ALL
      SELECT doc_id, 2 AS band, mh_4 || '|' || mh_5 AS band_key FROM sigs
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup candidates: shingle → 6 minhashes → 3
    bands of 2 → same-band bucket join → distinct (a<b) pairs.

    Scale: the join key is (band, band_key); only colliding docs meet.
    At 100 TB you'd also groupBy band_key and skip singleton buckets
    before the self-join — same plan shape.
    """
    t = Tables(spark, sf_dir)
    sigs = minhash_signature(t.documents)
    bands = None
    for b in range(N_HASHES // BAND_SIZE):
        key = F.concat_ws(
            "|", *[F.col(f"mh_{b * BAND_SIZE + j}") for j in range(BAND_SIZE)]
        )
        part = sigs.select(
            "doc_id", F.lit(b).alias("band"), key.alias("band_key")
        )
        bands = part if bands is None else bands.union(part)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, lang, len(string_split({_CANON_SQL}, ' ')) // 50 AS len_bucket,
             {_SHINGLES_SQL} AS shingles
      FROM documents
      WHERE len(string_split({_CANON_SQL}, ' ')) >= 3
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / (len(a.shingles) + len(b.shingles)
                    - len(list_intersect(a.shingles, b.shingles))), 6) AS jaccard
    FROM sh a JOIN sh b
      ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / (len(a.shingles) + len(b.shingles)
             - len(list_intersect(a.shingles, b.shingles))) >= 0.2
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard similarity on blocked candidate pairs.

    Blocking key = (lang, token-count bucket) — a stand-in for the LSH
    candidates at this scale; the verification math (|∩|/|∪| over
    distinct shingle sets) is what a 100 TB pipeline runs after LSH.
    """
    t = Tables(spark, sf_dir)
    sh = (
        t.documents.select("doc_id", "lang", F.expr(_WORDS_EXPR).alias("words"))
        .where(F.size("words") >= 3)
        .select(
            "doc_id",
            "lang",
            (F.size("words") / 50).cast("int").alias("len_bucket"),
            F.expr(_SHINGLES_EXPR).alias("shingles"),
        )
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    union = F.size(F.col("a.shingles")) + F.size(F.col("b.shingles")) - inter
    jac = inter.cast("double") / union
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.len_bucket") == F.col("b.len_bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(jac >= 0.2)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
    )
