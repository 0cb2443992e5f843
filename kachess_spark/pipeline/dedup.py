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


# --------------------------------------------------------------- SimHash

SIMHASH_BITS = 32  # 8 hex chars of md5 → engine-portable bit extraction
SIMHASH_BANDS = 4  # 8-bit bands; near-dups collide in ≥1 band
SIMHASH_MAX_HAMMING = 3

# per-token ±1 bit vector: bit j of the token's 32-bit md5 prefix,
# extracted hex-char-wise (instr/strpos over '0123456789abcdef' is
# identical in both engines; no conv()/from_hex divergence)
_TOKEN_PM1 = """
    transform(sequence(0, 31), j ->
      2 * ((shiftright(
            instr('0123456789abcdef',
                  substr(md5(t), cast(floor(j / 4) as int) + 1, 1)) - 1,
            j % 4)) & 1) - 1)
"""

_SIMHASH_EXPR = f"""
    aggregate(
      zip_with(
        aggregate(tokens,
                  transform(sequence(0, 31), j -> 0),
                  (acc, t) -> zip_with(acc, {_TOKEN_PM1}, (a, b) -> a + b)),
        sequence(0, 31),
        (s, j) -> if(s > 0, shiftleft(cast(1 as bigint), j), cast(0 as bigint))),
      cast(0 as bigint), (acc, x) -> acc + x)
"""


def simhash(docs: DataFrame) -> DataFrame:
    """doc_id + 32-bit SimHash over distinct 3-gram shingles (library
    entry point; one narrow projection, no shuffle).  Shingles, not
    single tokens: corpora share vocabulary, so token-level SimHash
    saturates (every doc within a few bits of every other); word
    3-grams keep the signature discriminative."""
    return (
        _with_shingles(docs)
        .withColumnRenamed("shingles", "tokens")
        .where(F.size("tokens") >= 1)
        .select("doc_id", F.expr(_SIMHASH_EXPR).alias("simhash"))
    )


_SIMHASH_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {_SHINGLES_SQL} AS tokens FROM documents
  WHERE len(string_split({_CANON_SQL}, ' ')) >= 3
),
tok AS (
  SELECT doc_id, unnest(tokens) AS t FROM docs WHERE len(tokens) >= 1
),
bits AS (
  SELECT doc_id, j,
         2 * (((strpos('0123456789abcdef',
                       substr(md5(t), (j // 4) + 1, 1)) - 1) >> (j % 4)) & 1)
           - 1 AS pm1
  FROM tok, (SELECT unnest(range(0, 32)) AS j)
),
sh AS (
  SELECT doc_id,
         SUM(CASE WHEN bitsum > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT
           AS simhash
  FROM (SELECT doc_id, j, SUM(pm1) AS bitsum FROM bits GROUP BY 1, 2)
  GROUP BY doc_id
),
bands AS (
  SELECT doc_id, simhash, k, (simhash >> (8 * k)) & 255 AS band_val
  FROM sh, (SELECT unnest(range(0, {SIMHASH_BANDS})) AS k)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM bands a JOIN bands b
  ON a.k = b.k AND a.band_val = b.band_val AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
ORDER BY doc_a, doc_b
"""


@query("dedup_simhash", _SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 32-bit shingle signature → 4 byte-bands →
    same-band bucket join → Hamming ≤ 3 verify.

    Scale: the signature is one narrow map-side projection (no explode
    shuffle — the token loop runs inside `aggregate`); candidate
    generation joins on (band_idx, band_val) so only docs agreeing on a
    full byte of the signature ever meet; bit_count(xor) verification is
    O(1) per candidate pair.
    """
    t = Tables(spark, sf_dir)
    sh = simhash(t.documents)
    bands = (
        sh.select(
            "doc_id",
            "simhash",
            F.explode(F.expr(f"sequence(0, {SIMHASH_BANDS - 1})")).alias("k"),
        )
        .withColumn(
            "band_val",
            F.expr("(simhash >> (8 * k)) & 255"),
        )
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


# ------------------------------------------- embedding-cosine near-dup

COS_THRESHOLD = 0.35
_SIGN_BITS = 8  # bucket = sign pattern of the first 8 components
PDEC = "decimal(28,14)"  # exact deterministic dot-product sums


_EMB_BUCKET_SQL = " + ".join(
    f"(CASE WHEN embedding[{j + 1}] > 0 THEN {1 << j} ELSE 0 END)"
    for j in range(_SIGN_BITS)
)
# Spark's arr[i] is 0-based while DuckDB lists are 1-based; element_at is
# 1-based in both engines, so the Spark twin uses it instead
_EMB_BUCKET_SPARK = " + ".join(
    f"(CASE WHEN element_at(embedding, {j + 1}) > 0 THEN {1 << j} ELSE 0 END)"
    for j in range(_SIGN_BITS)
)

_EMB_COS_ORACLE = f"""
WITH b AS (
  SELECT vec_id, embedding, {_EMB_BUCKET_SQL} AS bucket FROM embeddings
),
cand AS (
  SELECT a.vec_id AS va, b2.vec_id AS vb,
         a.embedding AS ea, b2.embedding AS eb
  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
),
expl AS (
  SELECT va, vb, generate_subscripts(ea, 1) AS pos,
         CAST(unnest(ea) AS DOUBLE) AS av, CAST(unnest(eb) AS DOUBLE) AS bv
  FROM cand
),
dots AS (
  SELECT va, vb,
         SUM(CAST(av * bv AS DECIMAL(28,14))) AS dot,
         SUM(CAST(av * av AS DECIMAL(28,14))) AS na,
         SUM(CAST(bv * bv AS DECIMAL(28,14))) AS nb
  FROM expl GROUP BY va, vb
)
SELECT va AS vec_a, vb AS vec_b,
       ROUND(CAST(dot AS DOUBLE)
             / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) AS cosine
FROM dots
WHERE CAST(dot AS DOUBLE)
      / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) >= {COS_THRESHOLD}
ORDER BY vec_a, vec_b
"""


@query("dedup_embedding_cosine", _EMB_COS_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs: sign-pattern LSH bucket (first 8
    component signs) → in-bucket candidate join → exact cosine ≥ 0.85.

    Scale: sign-bucketing cuts the quadratic candidate space by ~2^8
    before any pairwise math (same-cluster vectors agree on most signs);
    the exact cosine runs only on candidates, with the dot/norm sums in
    DECIMAL so the verify is deterministic under any combine order.
    A production ANN path swaps the bucket for IVF/random hyperplanes;
    the plan shape (bucket → join → verify) is identical.
    """
    t = Tables(spark, sf_dir)
    b = t.embeddings.select(
        "vec_id", "embedding", F.expr(_EMB_BUCKET_SPARK).alias("bucket")
    )
    cand = (
        b.alias("a")
        .join(
            b.alias("b2"),
            (F.col("a.bucket") == F.col("b2.bucket"))
            & (F.col("a.vec_id") < F.col("b2.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("va"),
            F.col("b2.vec_id").alias("vb"),
            F.col("a.embedding").alias("ea"),
            F.col("b2.embedding").alias("eb"),
        )
    )
    expl = cand.select(
        "va", "vb", F.posexplode("ea").alias("pos", "_av"), "eb"
    ).select(
        "va",
        "vb",
        F.col("_av").cast("double").alias("av"),
        F.element_at("eb", F.col("pos") + 1).cast("double").alias("bv"),
    )
    dots = expl.groupBy("va", "vb").agg(
        F.sum((F.col("av") * F.col("bv")).cast(PDEC)).alias("dot"),
        F.sum((F.col("av") * F.col("av")).cast(PDEC)).alias("na"),
        F.sum((F.col("bv") * F.col("bv")).cast(PDEC)).alias("nb"),
    )
    cos = F.round(
        F.col("dot").cast("double")
        / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double")),
        6,
    )
    return (
        dots.select(
            F.col("va").alias("vec_a"),
            F.col("vb").alias("vec_b"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= COS_THRESHOLD)
        .orderBy("vec_a", "vec_b")
    )
