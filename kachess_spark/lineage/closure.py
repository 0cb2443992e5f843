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


# below this many edges the graph is metadata-sized: a driver-side BFS
# beats paying per-iteration job/checkpoint overhead (the distributed
# loop only wins when the edge set itself needs a cluster)
SMALL_GRAPH_EDGES = 50_000


def _closure_bfs_local(
    spark, rows: list[tuple[int, int]], max_hops: int
) -> DataFrame:
    from collections import deque

    adj: dict[int, list[int]] = {}
    for a, b in rows:
        if a != b:
            adj.setdefault(a, []).append(b)
    out: list[tuple[int, int, int]] = []
    for src in adj:
        dist = {src: 0}
        q = deque([src])
        while q:
            u = q.popleft()
            if dist[u] >= max_hops:
                continue
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        out.extend((src, v, d) for v, d in dist.items() if v != src)
    return spark.createDataFrame(
        out, "ancestor_id BIGINT, descendant_id BIGINT, distance INT"
    )


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

    Hybrid execution: metadata-sized graphs (≤ SMALL_GRAPH_EDGES) run a
    driver BFS — per-iteration Spark job overhead would dominate;
    enterprise-scale edge sets run the distributed iterative self-join.
    """
    base = (
        edges.select(
            F.col(src_col).alias("ancestor_id"),
            F.col(dst_col).alias("descendant_id"),
        )
        .where(F.col("ancestor_id") != F.col("descendant_id"))
        .distinct()
    )
    sample = base.limit(SMALL_GRAPH_EDGES + 1).collect()
    if len(sample) <= SMALL_GRAPH_EDGES:
        return _closure_bfs_local(
            edges.sparkSession, [(r[0], r[1]) for r in sample], max_hops
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
