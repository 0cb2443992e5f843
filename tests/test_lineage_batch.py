"""Batch directory runner: parsed/skipped routing + session temp-table
rename at close (BatchProcessor.run / ParsingTask.run semantics)."""

from __future__ import annotations

from kachess_spark.lineage.batch import infer_source_tag, run_batch
from kachess_spark.lineage.metastore import fixture_metastore


def test_batch_routing(spark, tmp_path):
    good = tmp_path / "etl_dag.load_task.sql"
    good.write_text(
        "set hivevar_ds=2020-01-01;\n"
        "SELECT col101s, col103i FROM dw.tab10 "
        "WHERE col101s = '${hiveconf:hivevar_ds}';\n"
    )
    bad = tmp_path / "broken.sql"
    bad.write_text("SELEC oops FRM nowhere;\n")
    qualify = tmp_path / "teradata.sql"
    qualify.write_text(
        "SEL col101s FROM dw.tab10 "
        "QUALIFY row_number() OVER (ORDER BY col101s) = 1;\n"
    )
    hplsql = tmp_path / "proc.sql"
    hplsql.write_text("CREATE PROCEDURE p() BEGIN SELECT 1; END;\n")

    result = run_batch(spark, str(tmp_path), fixture_metastore(), lenient=True)
    # teradata.sql now parses via the dialect shims (SEL/QUALIFY rewrite)
    assert sorted(p.rsplit("/", 1)[-1] for p in result.parsed) == [
        "etl_dag.load_task.sql",
        "teradata.sql",
    ]
    assert len(result.skipped) == 2
    reasons = " | ".join(result.skipped.values())
    assert "parse error" in reasons and "unsupported dialect" in reasons

    f = result.frames()
    ds = f["datasets"].toPandas()
    assert (ds.type == "SUBQUERY").sum() >= 2
    si = f["select_items"].toPandas()
    # hivevar substituted into the WHERE predicate
    where_items = si[si.usage_context == "WHERE"]
    assert where_items.definition.str.contains("2020-01-01").any()


def test_infer_source_tag():
    assert infer_source_tag("/x/etl_dag.load_task.sql") == "etl_dag.load_task"
