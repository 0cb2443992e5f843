"""Catalyst parse + plan-JSON decoding.

The reference builds its own ANTLR grammar (antlr_sql_bnf/src/main/bnf/
Bingql.g4) and walks the parse tree with a Java visitor.  Spark-first
equivalent: ``sessionState().sqlParser().parsePlan(sql)`` yields the
*unresolved* Catalyst logical plan — star expansion, attribute and ordinal
resolution are then OUR job (mirroring the reference's DatasetPool), which
is exactly what lineage needs, because Catalyst's analyzer would require
every table to exist in a live catalog.

``TreeNode.toJSON`` serializes a plan as a flat preorder list of nodes
(``num-children`` subtrees follow each node); TreeNode-valued *fields*
(projectList, condition, cteRelations…) embed their own flat lists.  We
decode that into plain Python dicts with a ``_children`` list so the
extractor never touches py4j objects in its hot path.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import SparkSession

Node = dict[str, Any]


def short_class(node: Node) -> str:
    return node["class"].rsplit(".", 1)[-1]


def parts(s: str | None) -> list[str]:
    """Decode a stringified Scala Seq like ``"[dw, tab10]"``."""
    if not s:
        return []
    s = s.strip()
    if s.startswith("[") and s.endswith("]"):
        s = s[1:-1]
    return [p for p in (x.strip() for x in s.split(",")) if p]


def _decode_flat(flat: list[dict], i: int = 0) -> tuple[Node, int]:
    node = dict(flat[i])
    n = node.get("num-children", 0)
    kids: list[Node] = []
    j = i + 1
    for _ in range(n):
        k, j = _decode_flat(flat, j)
        kids.append(k)
    node["_children"] = kids
    for key, val in list(node.items()):
        if key != "_children":
            node[key] = _decode_field(val)
    return node, j


def decode_tree_list(flat: list[dict]) -> list[Node]:
    """Decode a flat preorder list into its (usually single) root trees."""
    out: list[Node] = []
    i = 0
    while i < len(flat):
        node, i = _decode_flat(flat, i)
        out.append(node)
    return out


def _decode_field(val: Any) -> Any:
    if isinstance(val, list) and val:
        first = val[0]
        if isinstance(first, dict) and "class" in first:
            # one embedded tree list (e.g. Join.condition, Insert.table)
            return decode_tree_list(val)
        if isinstance(first, list):
            # list of tree lists (e.g. projectList, groupingExpressions)
            return [_decode_field(v) for v in val]
        if isinstance(first, dict):
            return [_decode_field(v) for v in val]
        return val
    if isinstance(val, dict) and "class" not in val:
        # product (Tuple/case class): decode any embedded plan lists
        return {k: _decode_field(v) for k, v in val.items()}
    return val


def parse_statement(spark: SparkSession, sql: str) -> Node:
    """Parse ONE SQL statement into a decoded plan tree.

    Raises the underlying Catalyst ParseException on syntax errors
    (callers implement the reference's skip-and-log behavior,
    BatchProcessor.java:269-276).
    """
    jparser = spark._jsparkSession.sessionState().sqlParser()
    jplan = jparser.parsePlan(sql)
    flat = json.loads(jplan.toJSON())
    roots = decode_tree_list(flat)
    return roots[0]


def syntax_check(spark: SparkSession, sql: str) -> str | None:
    """Parse-only gate (reference: shared/SyntaxCheck.java:15-38).

    Returns None when the statement parses, else the error message.
    """
    try:
        parse_statement(spark, sql)
        return None
    except Exception as exc:  # Py4J wraps ParseException
        return str(exc)
