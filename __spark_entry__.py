"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (+ the pipeline operators) with DuckDB oracle twins.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from kachess_spark import registry  # noqa: E402
from kachess_spark.session import tune_for_session  # noqa: E402

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q3 shape —
    3-way join + filter + aggregate + top-k (reference test case 0002's
    multi-join shape on the driver tables)."""
    tune_for_session(spark)
    from kachess_spark.operators.joins import join_inner_q3

    return join_inner_q3(spark, "/root/testdata/sf0.001")


def _is_green(rec: dict, has_oracle_now: bool = False) -> bool:
    """A CORRECTNESS row counts as verified only if the check PASSED
    *in the mode the query runs in today*.

    Oracle-compared rows need all three matches true with no error;
    rows-only rows (err == "no_oracle") pass when the Spark side
    produced a row count — but ONLY while the name still has no oracle.
    A name that has since GAINED an oracle must not inherit credit from
    historical rows-only passes, or the rotation would keep deferring
    the very names that most need a fresh hash-certified driver row.
    Anything else (hash mismatch, traceback) must NOT count, so the
    failed query re-enters the next driver window immediately instead
    of rotating out with the passes.
    """
    err = rec.get("err")
    if err == "no_oracle":
        return (not has_oracle_now) and rec.get("spark_rows") is not None
    return (
        err is None
        and rec.get("rows_match") is True
        and rec.get("schema_match") is True
        and rec.get("hash_match") is True
    )


def _verification_counts() -> dict[str, int]:
    """How many driver CORRECTNESS rounds each query has PASSED in."""
    import glob
    import json

    counts: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                data = json.load(fh)
        except Exception:
            continue
        for name, rec in data.items():
            if isinstance(rec, dict) and _is_green(
                rec, has_oracle_now=name in registry.ORACLES
            ):
                counts[name] = counts.get(name, 0) + 1
    return counts


def _ever_failed() -> set[str]:
    """Queries with at least one non-green driver row — their fixes need
    driver re-verification before anything never-checked."""
    import glob
    import json

    failed: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                data = json.load(fh)
        except Exception:
            continue
        for name, rec in data.items():
            if isinstance(rec, dict) and not _is_green(
                rec, has_oracle_now=name in registry.ORACLES
            ):
                failed.add(name)
    return failed


def _rotated_names() -> list[str]:
    """Deterministic ordering that rotates driver verification coverage.

    The external correctness sweep checks a prefix window of ``queries()``
    in dict order, so order queries by (times already checked ascending,
    round-robin across modules).  Never-checked queries come first, one
    per operator family at a time — each round's window therefore covers
    the families least recently verified, and over rounds every query
    gets driver-checked without manual re-ordering.
    """
    counts = _verification_counts()
    failed = _ever_failed()
    by_mod: dict[str, list[str]] = {}
    for name, fn in registry.QUERIES.items():
        by_mod.setdefault(fn.__module__, []).append(name)
    rr_index: dict[str, int] = {}
    queues = [list(v) for v in by_mod.values()]
    pos = 0
    while any(queues):
        for q in queues:
            if q:
                rr_index[q.pop(0)] = pos
                pos += 1
    # Ever-failed-and-not-yet-re-greened queries jump the whole queue so a
    # fix lands a driver row the very next round.
    return sorted(
        registry.QUERIES,
        key=lambda n: (
            counts.get(n, 0),
            0 if (n in failed and counts.get(n, 0) == 0) else 1,
            rr_index[n],
        ),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + pipeline)."""
    return {name: registry.QUERIES[name] for name in _rotated_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; keys without one get the rows-only check."""
    return dict(registry.ORACLES)
