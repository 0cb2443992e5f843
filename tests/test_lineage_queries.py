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


def test_dashboard_columns_golden(spark):
    """ts_dboard_lineage over _CORPUS as a DASHBOARD source: the full
    physical column set the top-level SELECT transitively reads."""
    from kachess_spark.lineage.queries import lineage_dashboard_columns

    got = sorted(tuple(r) for r in lineage_dashboard_columns(spark, "").collect())
    assert got == [
        (1, "adhoc", "tab40", "col400l"),
        (1, "adhoc", "tab40", "col401s"),
        (1, "adhoc", "tab40", "col403i"),
        (1, "dw", "tab10", "col100l"),
        (1, "dw", "tab10", "col101s"),
        (1, "dw", "tab10", "col102b"),
        (1, "dw", "tab10", "col103i"),
        (1, "dw", "tab20", "col200l"),
        (1, "dw", "tab20", "col202b"),
        (1, "stage", "tab30", "col300l"),
        (1, "stage", "tab30", "col303i"),
    ]


def test_lineage_script_diff_shape(spark, sf_dir):
    """v1→v2 edit drops yn_flag (and its col102b source), adds
    shipment_key from tab30.col300l, keeps the rest."""
    from kachess_spark.lineage.queries import lineage_script_diff

    rows = {
        (r["source_column"], r["output_column"]): r["change"]
        for r in lineage_script_diff(spark, sf_dir).collect()
    }
    assert rows[("dw.tab10.col102b", "yn_flag")] == "removed"
    assert rows[("stage.tab30.col300l", "shipment_key")] == "added"
    assert rows[("adhoc.tab40.col401s", "tab40_str")] == "kept"
    assert rows[("dw.tab10.col103i", "max_int")] == "kept"
