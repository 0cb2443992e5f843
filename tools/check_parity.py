"""Local replica of the driver's correctness gate.

For every ``queries()`` entry: run the Spark query and the DuckDB
oracle at the given sf dir, sort columns by name and rows by value, and
compare exactly.  Run:  python tools/check_parity.py [sf_dir] [names...]
"""

from __future__ import annotations

import math
import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    from kachess_spark.catalog import TABLES, table_path

    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.map(_norm_cell)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype(object)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64", errors="ignore")
    df = df.sort_values(by=list(df.columns), key=lambda s: s.map(str)).reset_index(
        drop=True
    )
    return df


def _norm_cell(v):
    import datetime
    import decimal

    import numpy as np

    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    if isinstance(v, np.ndarray):
        return str([_norm_cell(x) for x in v.tolist()])
    if isinstance(v, (list, tuple)):
        return str([_norm_cell(x) for x in v])
    if isinstance(v, dict):
        return str({k: _norm_cell(x) for k, x in sorted(v.items())})
    if hasattr(v, "asDict"):  # pyspark Row
        return str({k: _norm_cell(x) for k, x in sorted(v.asDict().items())})
    if isinstance(v, float):
        return v
    return v


def _driver_unsafe_cols(df: pd.DataFrame, side: str) -> list[str]:
    """Columns whose cells the external driver cannot hash-compare safely:
    Decimal (stringification differs between engines), and
    list/dict/ndarray/Row (unhashable in its pandas sort).  The local
    normalizer canonicalizes these, which would mask a driver mismatch —
    so flag them as failures instead."""
    import decimal

    import numpy as np

    bad = []
    for c in df.columns:
        s = df[c]
        if s.dtype != object:
            continue
        for v in s.head(100):
            if isinstance(v, decimal.Decimal):
                bad.append(f"{side}.{c}: Decimal cells")
                break
            if isinstance(v, (list, tuple, dict, np.ndarray)) or hasattr(
                v, "asDict"
            ):
                bad.append(f"{side}.{c}: nested/unhashable cells")
                break
    return bad


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    problems += _driver_unsafe_cols(spark_df, "spark")
    problems += _driver_unsafe_cols(duck_df, "duck")
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(
            f"schema: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
        )
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"rowcount: spark={len(spark_df)} duck={len(duck_df)}")
        return problems
    a, b = normalize(spark_df), normalize(duck_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            bad = ~(
                (av.isna() & bv.isna())
                | (av == bv)
                | ((av - bv).abs() <= 1e-12 * (1 + bv.abs()))
            )
            exact_bad = ~((av.isna() & bv.isna()) | (av == bv))
            if bad.any():
                i = bad.idxmax()
                problems.append(f"col {c}: value diff at row {i}: {av[i]!r} vs {bv[i]!r}")
            elif exact_bad.any():
                i = exact_bad.idxmax()
                problems.append(
                    f"col {c}: INEXACT float (within 1e-12 but driver may hash-mismatch)"
                    f" at row {i}: {av[i]!r} vs {bv[i]!r}"
                )
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                i = (~eq).idxmax()
                problems.append(f"col {c}: value diff at row {i}: {av[i]!r} vs {bv[i]!r}")
    return problems


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as e
    from kachess_spark.session import get_spark

    spark = get_spark("parity-check")
    con = duck_connect(sf_dir)
    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    failures = []
    records: dict[str, dict] = {}
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            n_fail += 1
            failures.append(name)
            records[name] = {"status": "fail", "err": "spark error"}
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(sdf)} rows (no oracle)")
            n_rows_only += 1
            records[name] = {"status": "rows_only", "rows": len(sdf)}
            continue
        try:
            ddf = con.execute(oracles[name]).arrow().to_pandas(types_mapper=None)
        except Exception:
            print(f"FAIL {name}: duckdb error\n{traceback.format_exc()}")
            n_fail += 1
            failures.append(name)
            records[name] = {"status": "fail", "err": "duckdb error"}
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            print(f"FAIL {name} ({len(sdf)} spark rows / {len(ddf)} duck rows):")
            for p in problems[:6]:
                print(f"   - {p}")
            n_fail += 1
            failures.append(name)
            records[name] = {"status": "fail", "problems": problems[:6]}
        else:
            print(f"PASS {name}: {len(sdf)} rows")
            n_pass += 1
            records[name] = {"status": "pass", "rows": len(sdf)}
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "summary": {
                        "pass": n_pass,
                        "fail": n_fail,
                        "rows_only": n_rows_only,
                    },
                    "queries": records,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
    if failures:
        print("failures:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
