"""Hive partition-introspection functions.

The reference grammar recognizes Teradata/Hive-era partition metadata
functions — ``MAX_PART_STRING/INT/DATE``, ``MIN_PART_*``, ``PART_COUNT``,
``PART_LOC`` (Bingql.g4:1422-1429) — with no executable semantics (the
visitor treats them as opaque calls).  Spark has no direct analog
(SURVEY.md §2.8), so the execution layer provides them as catalog
helpers over ``SHOW PARTITIONS`` / ``DESCRIBE ... PARTITION``.

These are METADATA queries: they read the catalog's partition list
(thousands of entries), never the data files — the 100 TB-safe way to
answer "latest partition?" that the reference's users encode as
``MAX_PART_STRING(db.tab)``.
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import DataFrame, SparkSession


def show_partitions(spark: SparkSession, table: str) -> DataFrame:
    """Raw ``SHOW PARTITIONS`` frame (one ``partition`` string per row,
    e.g. ``dt=2024-01-01/hr=3``)."""
    return spark.sql(f"SHOW PARTITIONS {table}")


def _part_values(spark: SparkSession, table: str, col: str) -> list[str]:
    vals = []
    for row in show_partitions(spark, table).collect():
        for kv in row[0].split("/"):
            k, _, v = kv.partition("=")
            if k == col:
                vals.append(v)
    return vals


def max_part_string(spark: SparkSession, table: str, col: str) -> str | None:
    """MAX_PART_STRING: lexicographic max partition value (Bingql.g4:1422)."""
    vals = _part_values(spark, table, col)
    return max(vals) if vals else None


def min_part_string(spark: SparkSession, table: str, col: str) -> str | None:
    vals = _part_values(spark, table, col)
    return min(vals) if vals else None


def max_part_int(spark: SparkSession, table: str, col: str) -> int | None:
    vals = [int(v) for v in _part_values(spark, table, col)]
    return max(vals) if vals else None


def min_part_int(spark: SparkSession, table: str, col: str) -> int | None:
    vals = [int(v) for v in _part_values(spark, table, col)]
    return min(vals) if vals else None


def max_part_date(spark: SparkSession, table: str, col: str) -> date | None:
    vals = [date.fromisoformat(v) for v in _part_values(spark, table, col)]
    return max(vals) if vals else None


def min_part_date(spark: SparkSession, table: str, col: str) -> date | None:
    vals = [date.fromisoformat(v) for v in _part_values(spark, table, col)]
    return min(vals) if vals else None


def part_count(spark: SparkSession, table: str) -> int:
    """PART_COUNT: number of partitions (catalog metadata, no data scan)."""
    return show_partitions(spark, table).count()


def part_loc(spark: SparkSession, table: str, spec: dict[str, str]) -> str | None:
    """PART_LOC: storage location of one partition (Bingql.g4:1429)."""
    spec_sql = ", ".join(f"{k}='{v}'" for k, v in spec.items())
    rows = spark.sql(
        f"DESCRIBE FORMATTED {table} PARTITION ({spec_sql})"
    ).collect()
    for r in rows:
        if (r[0] or "").strip() == "Location":
            return r[1]
    return None
