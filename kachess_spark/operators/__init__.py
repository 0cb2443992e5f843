"""Execution layer — SURVEY.md §2's SQL surface as a PySpark query library.

Every public query here is declarative DataFrame/SQL code: Catalyst does
pushdown, pruning, join planning and codegen; we only add hints
(broadcast) and structure (decimal-cast aggregation for cross-engine
determinism, unique sort keys for stable top-k).
"""
