"""Query registry: every implemented operator from SURVEY.md §2 registers
itself here with (optionally) a DuckDB oracle-SQL twin.

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle.

    Queries without an oracle get the driver's weaker rows-only check
    (reserved for genuinely non-SQL-expressible operators).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def add_oracle(name: str, oracle: str) -> None:
    """Attach an oracle to an already-registered query — for oracles
    whose SQL builders are defined later in the module than the
    decorated operator (e.g. the ANN serving twins, which reuse the
    training-chain SQL helpers)."""
    if name not in QUERIES:
        raise ValueError(f"add_oracle: unknown query {name!r}")
    if name in ORACLES:
        raise ValueError(f"add_oracle: {name!r} already has an oracle")
    ORACLES[name] = oracle


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from kachess_spark.operators import (  # noqa: F401
        aggregates,
        asof,
        filters,
        joins,
        lateral,
        pagerank,
        scalars,
        scans,
        setops,
        sinks,
        sorts,
        sources,
        tpch,
        windows,
    )
    from kachess_spark.functions import udfs  # noqa: F401
    from kachess_spark.lineage import queries as lineage_queries  # noqa: F401
    from kachess_spark.streaming import windows as streaming_windows  # noqa: F401
    from kachess_spark.pipeline import (  # noqa: F401
        curation,
        dedup,
        multimodal,
        retrieval,
        similarity,
        text,
    )
