"""Pin the frozen edge lists in lineage/queries.py to live extraction, and
check the distributed closure against DuckDB's WITH RECURSIVE — the same
comparison the driver runs."""

from __future__ import annotations

import duckdb

from kachess_spark.lineage import LineageSession, fixture_metastore
from kachess_spark.lineage.queries import (
    _CORPUS,
    DS_EDGES,
    ITEM_EDGES,
    lineage_column_closure,
    lineage_table_closure,
)
from kachess_spark.registry import ORACLES


def test_frozen_edges_match_live_extraction(spark):
    s = LineageSession(spark, fixture_metastore(), seed=1000)
    s.extract_script(_CORPUS)
    f = s.frames()
    rel = sorted(tuple(r) for r in f["select_item_rel"].collect())
    assert rel == sorted(ITEM_EDGES)
    dsr = sorted(tuple(r) for r in f["dataset_rel"].collect())
    assert dsr == sorted(DS_EDGES)


def _check(spark, fn, oracle_key):
    got = sorted(tuple(r) for r in fn(spark, "").collect())
    want = sorted(tuple(r) for r in duckdb.sql(ORACLES[oracle_key]).fetchall())
    assert got == want


def test_column_closure_vs_duckdb(spark):
    _check(spark, lineage_column_closure, "lineage_column_closure")


def test_table_closure_vs_duckdb(spark):
    _check(spark, lineage_table_closure, "lineage_table_closure")
