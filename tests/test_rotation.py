"""Driver-window rotation semantics (round-9 verdict #2): a historical
rows-only pass must not count as verification for a name that has
since GAINED an oracle — otherwise the names most in need of a fresh
hash-certified driver row are exactly the ones the rotation defers."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import _is_green  # noqa: E402

HASH_GREEN = {
    "err": None,
    "rows_match": True,
    "schema_match": True,
    "hash_match": True,
    "spark_rows": 5,
}
ROWS_ONLY = {"err": "no_oracle", "spark_rows": 5}
HASH_FAIL = {
    "err": None,
    "rows_match": True,
    "schema_match": True,
    "hash_match": False,
    "spark_rows": 5,
}


def test_hash_green_counts_in_both_modes():
    assert _is_green(HASH_GREEN, has_oracle_now=True)
    assert _is_green(HASH_GREEN, has_oracle_now=False)


def test_rows_only_counts_only_while_no_oracle():
    assert _is_green(ROWS_ONLY, has_oracle_now=False)
    # oracle gained since: the stale rows-only row must NOT verify it
    assert not _is_green(ROWS_ONLY, has_oracle_now=True)


def test_failures_never_count():
    assert not _is_green(HASH_FAIL, has_oracle_now=True)
    assert not _is_green(HASH_FAIL, has_oracle_now=False)
    assert not _is_green({"err": "traceback..."}, has_oracle_now=False)
    assert not _is_green({"err": "no_oracle", "spark_rows": None},
                         has_oracle_now=False)


def test_oracle_gaining_names_front_the_window():
    """End-to-end: every name whose oracle is newer than its last
    hash-green driver row must appear in the first 50 of queries()
    order (one driver window)."""
    import glob
    import json

    import __spark_entry__ as e
    from kachess_spark import registry

    registry.load_all()
    hash_green: set[str] = set()
    seen: set[str] = set()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            data = json.load(fh)
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            seen.add(name)
            if _is_green(rec, has_oracle_now=True):
                hash_green.add(name)
    needing = {
        n
        for n in registry.ORACLES
        if n in seen and n not in hash_green
    } | (set(registry.QUERIES) - seen)
    window = set(list(e.queries())[:50])
    overdue = needing - window
    assert len(needing) <= 50, (
        "more overdue names than one driver window; rotation will take "
        f"{len(needing)} slots across rounds: {sorted(needing)}"
    )
    assert not overdue, f"overdue names missing from the window: {sorted(overdue)}"
