"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": <dir>}
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Headline set: one per operator family + the pipeline heavies.
HEADLINE = [
    "agg_q1_pricing_summary",
    "join_inner_q3",
    "join_q5_multiway",
    "win_rank_topk",
    "agg_count_distinct",
    "setop_union_all",
    "filter_exists_subquery",
    "lateral_view_sql_words",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "sim_cosine_topk",
    "text_quality_score",
    "stream_tumbling_counts",
    "stream_session_stats",
    "lineage_column_closure",
    "sink_bucketed_join",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from kachess_spark import registry
    from kachess_spark.session import get_spark

    registry.load_all()
    spark = get_spark("kachess-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once with a trivial action
    from kachess_spark.catalog import Tables

    Tables(spark, sf_dir).lineitem.limit(1).collect()

    per_query: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        t0 = time.perf_counter()
        # count() forces full execution without driver-side materialization
        fn(spark, sf_dir).count()
        per_query[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(per_query.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
