"""kachess_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference lineage tool
(yibingbingwu/kachess), rebuilt Spark-first.

Layers
------
* ``kachess_spark.operators``  — the executable SQL surface (SURVEY.md §2):
  scans, filters, joins, aggregations, windows, sorts, set-ops, scalar
  expressions, lateral views.  Each operator is a named query
  ``(spark, sf_dir) -> DataFrame`` registered with a DuckDB oracle twin.
* ``kachess_spark.pipeline``   — large-scale training-data operators:
  dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
  search over embeddings, text analysis, multimodal column plumbing.
* ``kachess_spark.lineage``    — the reference's actual computed artifact:
  column-level SQL lineage, rebuilt as Catalyst logical-plan traversal
  emitting lineage DataFrames (cf. /root/reference/sql_lineage).
* ``kachess_spark.streaming``  — Structured Streaming windows/watermark
  operators over the events table.
"""

__version__ = "0.1.0"
