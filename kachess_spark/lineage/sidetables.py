"""Externally-fed lineage side tables: symlinks, storage links, sqoop.

The reference's lineage store carries three side tables populated OUTSIDE
SQL parsing (db_setup_ddl.sql):

* ``table_symlinked`` :148-162 — alias edges ("LT is akin to symlink
  files"): the src table is always the one found during parsing; dst
  names are discovered externally (LatestOperator, Storage-Linked).
* ``table_add_partition`` :134-146 — ADD PARTITION locations whose
  shared paths "may tie tables together" (the Storage-Linked source of
  symlink rows).
* ``sqoop_table`` :192-200 — which ETL ingest task materializes a root
  table.

Scale shape: all three side tables are metadata-sized dimensions, while
``table_lineage`` edges are the data-sized fact (10⁶–10⁸ rows at
enterprise scale).  Every fold below therefore broadcasts the side table
and never reshuffles the edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def storage_links(partitions: DataFrame) -> DataFrame:
    """Derive symlink rows from shared ADD PARTITION locations.

    Any two distinct tables registered at the same storage location are
    Storage-Linked (table_add_partition.location comment,
    db_setup_ddl.sql:139; linkage_src_key comment :152).  Emits both
    directions — linkage is symmetric when discovered from storage.

    The self-join key is ``location``; partition metadata is
    metadata-sized, so the build side broadcasts.
    """
    a, b = partitions.alias("a"), partitions.alias("b")
    return (
        a.join(F.broadcast(b), on=F.col("a.location") == F.col("b.location"))
        .where(
            (F.col("a.db_schema") != F.col("b.db_schema"))
            | (F.col("a.db_table") != F.col("b.db_table"))
        )
        .select(
            F.col("a.db_schema").alias("src_schema"),
            F.col("a.db_table").alias("src_table"),
            F.col("b.db_schema").alias("dst_schema"),
            F.col("b.db_table").alias("dst_table"),
            F.lit("storage_linked").alias("linkage_src_key"),
            F.col("a.location").alias("linkage_src_value"),
        )
        .distinct()
    )


def expand_symlinks(table_edges: DataFrame, symlinks: DataFrame) -> DataFrame:
    """Expand table-lineage edges through symlink aliases.

    For every edge whose endpoint is a symlink *src*, ALSO emit the edge
    under each *dst* alias, so a consumer who only knows the external
    name (e.g. the LatestOperator view) resolves the same lineage.  Two
    sequential rewrites (parent side, then child side over the already-
    expanded set) cover edges where BOTH endpoints are aliased.

    ``table_edges`` columns: parent_schema, parent_table, child_schema,
    child_table.  ``symlinks``: table_symlinked (db_setup_ddl.sql:148-162).
    """
    sl = F.broadcast(
        symlinks.select(
            "src_schema", "src_table", "dst_schema", "dst_table"
        ).distinct()
    )

    def _rewrite(edges: DataFrame, side: str) -> DataFrame:
        cond = (F.col(f"{side}_schema") == F.col("src_schema")) & (
            F.col(f"{side}_table") == F.col("src_table")
        )
        out = {c: F.col(c) for c in edges.columns}
        out[f"{side}_schema"] = F.col("dst_schema")
        out[f"{side}_table"] = F.col("dst_table")
        return edges.join(sl, cond).select(
            *(expr.alias(c) for c, expr in out.items())
        )

    parents_done = table_edges.unionByName(_rewrite(table_edges, "parent"))
    return parents_done.unionByName(
        _rewrite(parents_done, "child")
    ).distinct()


def sqoop_root_provenance(table_edges: DataFrame, sqoop: DataFrame) -> DataFrame:
    """Lineage roots annotated with the ETL task that ingests them.

    A root is a table that appears as a parent but never as a child —
    nothing inside the warehouse produces it.  Joining roots to
    ``sqoop_table`` (db_setup_ddl.sql:192-200) names the external ingest
    task; a NULL task marks an unmanaged external source.
    """
    parents = table_edges.select(
        F.col("parent_schema").alias("db_schema"),
        F.col("parent_table").alias("db_table"),
    ).distinct()
    children = table_edges.select(
        F.col("child_schema").alias("db_schema"),
        F.col("child_table").alias("db_table"),
    ).distinct()
    roots = parents.join(
        children, on=["db_schema", "db_table"], how="left_anti"
    )
    return roots.join(
        F.broadcast(sqoop), on=["db_schema", "db_table"], how="left"
    ).select("db_schema", "db_table", "etl_task_name")
