"""The correctness gate: every registered query must match its DuckDB
oracle exactly (row count, schema names, values) at the test SF.

This replicates the driver's t2 check locally; tools/check_parity.py is
the same comparison run standalone at sf0.01.
"""

from __future__ import annotations

import pytest

from kachess_spark import registry
from tools.check_parity import compare

registry.load_all()

ORACLE_NAMES = sorted(registry.ORACLES)
ROWS_ONLY_NAMES = sorted(set(registry.QUERIES) - set(registry.ORACLES))

# Parity cases whose DuckDB oracle alone takes minutes at the test SF
# (the residual-PQ chain's unrolled CTE, the serve-maintenance replay)
# — marked slow so the default gate run finishes inside the driver's
# timeout; the full suite (-m "") still runs them (round-13 verdict #1).
_SLOW_PARITY = {"sim_ivfpq_residual_topk", "sim_graph_serve_incremental"}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_PARITY else n
        for n in ORACLE_NAMES
    ],
)
def test_oracle_parity(name, spark, duck, sf_dir):
    sdf = registry.QUERIES[name](spark, sf_dir).toPandas()
    ddf = duck.execute(registry.ORACLES[name]).arrow().to_pandas()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(name, spark, sf_dir):
    df = registry.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
