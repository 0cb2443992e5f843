"""Schema source for lineage resolution (the reference's "metastore").

The reference lazily fetches table schemas from a Hive metastore over JDBC
(ExternalHiveMetaStore.java:30-42,88-92) or a local mirror
(LocalHiveMetaStore.java:25-40); lookups are case-insensitive
(DatasetPool.java:197-204).  Spark-first equivalents: a plain dict shim for
tests, or ``spark.catalog`` for live sessions — both behind one interface.

Types are carried as upper-cased Hive-style strings, never interpreted
(SURVEY.md §1.2; LineageDbService.java:136-138).  ``DataType.simpleString``
reproduces the Hive spelling from ``pyspark.sql.types``.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class MetaDataNotFound(Exception):
    """Raised when a FROM-clause table resolves nowhere
    (reference: sharable/MetaDataNotFound semantics,
    SqlMetaDataExtractor.java:507-515 — lenient mode warns instead)."""


def normalize_type(t: str) -> str:
    return " ".join(t.split()).upper()


@dataclass
class Metastore:
    """``{"schema.table": [(column, HIVE_TYPE), ...]}`` with
    case-insensitive lookup."""

    tables: dict[str, list[tuple[str, str]]] = field(default_factory=dict)

    def register(self, schema: str, table: str, cols: list[tuple[str, str]]) -> None:
        key = f"{schema}.{table}".lower()
        self.tables[key] = [(c, normalize_type(t)) for c, t in cols]

    def lookup(self, schema: str | None, table: str) -> list[tuple[str, str]] | None:
        if schema:
            return self.tables.get(f"{schema}.{table}".lower())
        # unqualified: unique match across schemas, else None
        hits = [v for k, v in self.tables.items() if k.split(".", 1)[1] == table.lower()]
        return hits[0] if len(hits) == 1 else None

    @classmethod
    def from_spark_catalog(cls, spark, databases: list[str] | None = None) -> "Metastore":
        """Build from a live session — replaces the reference's JDBC scrape
        of TBLS/DBS/COLUMNS_V2 (ExternalHiveMetaStore.java:88-92)."""
        ms = cls()
        for db in databases or [d.name for d in spark.catalog.listDatabases()]:
            for t in spark.catalog.listTables(db):
                cols = [
                    (c.name, normalize_type(c.dataType))
                    for c in spark.catalog.listColumns(t.name, db)
                ]
                ms.register(db, t.name, cols)
        return ms


_NESTED = "array<struct<user:struct<id:bigint>,group:struct<id:bigint>,is_bot:boolean>>"


def fixture_metastore() -> Metastore:
    """The 4-table golden-test fixture (FIXTURES.md §A; reference seeds the
    same schemas in test_cases/setup.sh)."""
    ms = Metastore()
    ms.register(
        "dw", "tab10",
        [("col100l", "bigint"), ("col101s", "string"),
         ("col102b", "boolean"), ("col103i", "int")],
    )
    ms.register(
        "dw", "tab20",
        [("col200l", "bigint"), ("col201s", "string"),
         ("col202b", "boolean"), ("col203i", "int")],
    )
    ms.register(
        "stage", "tab30",
        [("col300l", "bigint"), ("col301s", "string"),
         ("col302b", "boolean"), ("col303i", "int")],
    )
    ms.register(
        "adhoc", "tab40",
        [("col400l", "bigint"), ("col401s", "string"),
         ("col402x", _NESTED), ("col403i", "int")],
    )
    return ms
