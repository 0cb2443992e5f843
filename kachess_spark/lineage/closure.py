"""Transitive lineage closure + impact analysis — distributed.

Fills the reference's summary tables (db_setup_ddl.sql: ``table_lineage``
:164-176, ``column_lineage`` with hop-count ``distance`` :178-190 — the
schema notes they "may be populated later", i.e. computed downstream of the
parser; validate_0010.sql builds the same closure ad hoc with scratch
tables).

At enterprise scale the edge set is the one lineage artifact that is
data-sized (10⁶–10⁸ edges), so closure runs as an iterative DataFrame
self-join (BFS over the DAG), not a driver-side walk:

* each round joins the frontier to the edge table on the shuffle key
  ``parent_*_id`` — one hash partitioning, reused every iteration;
* ``storageLevel``/localCheckpoint truncates the logical plan per round so
  the lineage of a 20-hop graph doesn't build a 20-deep plan;
* convergence by empty-frontier count (an AQE-sized count, cheap);
* ``max_hops`` caps pathological cycles (self-referencing scripts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    src_col: str = "parent_select_item_id",
    dst_col: str = "child_select_item_id",
    max_hops: int = 20,
) -> DataFrame:
    """All (ancestor, descendant, distance) pairs reachable in the edge DAG.

    Returns columns ``(ancestor_id, descendant_id, distance)`` with the
    minimum hop count per pair (column_lineage.distance,
    db_setup_ddl.sql:187).
    """
    base = (
        edges.select(
            F.col(src_col).alias("ancestor_id"),
            F.col(dst_col).alias("descendant_id"),
        )
        .where(F.col("ancestor_id") != F.col("descendant_id"))
        .distinct()
    )
    closure = base.withColumn("distance", F.lit(1))
    frontier = closure
    # pre-shuffle once on the join key; every iteration reuses this layout
    step_edges = base.select(
        F.col("ancestor_id").alias("_src"), F.col("descendant_id").alias("_dst")
    ).repartition("_src")

    for hop in range(2, max_hops + 1):
        grown = (
            frontier.join(
                step_edges, frontier["descendant_id"] == step_edges["_src"]
            )
            .select(
                frontier["ancestor_id"],
                step_edges["_dst"].alias("descendant_id"),
                (frontier["distance"] + 1).alias("distance"),
            )
            .where(F.col("ancestor_id") != F.col("descendant_id"))
        )
        # keep only pairs not already reached at a shorter distance
        new_pairs = grown.join(
            closure.select("ancestor_id", "descendant_id"),
            on=["ancestor_id", "descendant_id"],
            how="left_anti",
        ).dropDuplicates(["ancestor_id", "descendant_id"])
        new_pairs = new_pairs.localCheckpoint(eager=True)  # truncate plan
        if new_pairs.isEmpty():
            break
        closure = closure.unionByName(new_pairs).localCheckpoint(eager=True)
        frontier = new_pairs
    return closure


def column_lineage(select_item_rel: DataFrame, max_hops: int = 20) -> DataFrame:
    """column_lineage(ancestor, descendant, distance)
    (db_setup_ddl.sql:178-190)."""
    return transitive_closure(
        select_item_rel, "parent_select_item_id", "child_select_item_id", max_hops
    ).select(
        F.col("ancestor_id").alias("parent_select_item_id"),
        F.col("descendant_id").alias("child_select_item_id"),
        "distance",
    )


def table_lineage(dataset_rel: DataFrame, max_hops: int = 20) -> DataFrame:
    """table_lineage closure over dataset edges (db_setup_ddl.sql:164-176)."""
    return transitive_closure(
        dataset_rel, "parent_dataset_id", "child_dataset_id", max_hops
    ).select(
        F.col("ancestor_id").alias("parent_dataset_id"),
        F.col("descendant_id").alias("child_dataset_id"),
        "distance",
    )


def impacted_by(
    select_item_rel: DataFrame, item_ids: list[int], max_hops: int = 20
) -> DataFrame:
    """Downstream impact set of the given columns (validate_0010's
    "user/team discovery" pattern as a library call)."""
    cl = column_lineage(select_item_rel, max_hops)
    return cl.where(F.col("parent_select_item_id").isin(item_ids)).select(
        F.col("child_select_item_id").alias("impacted_item_id"), "distance"
    )


def feeds_into(
    select_item_rel: DataFrame, item_ids: list[int], max_hops: int = 20
) -> DataFrame:
    """Upstream provenance set of the given columns."""
    cl = column_lineage(select_item_rel, max_hops)
    return cl.where(F.col("child_select_item_id").isin(item_ids)).select(
        F.col("parent_select_item_id").alias("source_item_id"), "distance"
    )
