"""Time a subset of registered queries with bench.py's methodology
(warm the shape at the small SF, time ``fn(spark, sf_dir).count()``,
clear caches between runs) — the cheap A/B harness for optimization
rounds.  Repeats each query ``--n`` times and reports every wall plus
min/median, with the per-run stage-byte/task deltas that adjudicate
wall swings (same bytes + same tasks + slower wall = host noise).

Usage: python tools/bench_some.py [--n 3] [--sf DIR] [--cpus N]
                                  [--prep] name [name...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    n_runs, sf_dir, prep = 3, "/root/testdata/sf0.1", False
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--n":
            n_runs = int(args[i + 1]); i += 2
        elif a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--cpus":
            os.environ["SPARK_GRAFT_CPUS"] = args[i + 1]; i += 2
        elif a == "--prep":
            prep = True; i += 1
        else:
            names.append(a); i += 1

    from kachess_spark import registry
    from kachess_spark.session import get_spark

    registry.load_all()
    spark = get_spark("kachess-bench-some")
    spark.sparkContext.setLogLevel("ERROR")
    warm_dir = "/root/testdata/sf0.001"

    if prep:
        from kachess_spark.pipeline.similarity import (
            build_graph_serve_state,
            build_ivf_index,
            build_ivfpq_index,
            build_knn_state,
            build_pq_index,
        )

        for d in [warm_dir, sf_dir]:
            build_ivf_index(spark, d)
            build_pq_index(spark, d)
            build_ivfpq_index(spark, d)
            build_knn_state(spark, d)
            build_graph_serve_state(spark, d)

    import gc

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from profile_stages import _stages  # noqa: E402

    out: dict[str, dict] = {}
    for name in names:
        fn = registry.QUERIES[name]
        walls, profs = [], []
        for _ in range(n_runs):
            try:
                fn(spark, warm_dir).count()
            except Exception:
                pass
            spark.catalog.clearCache()
            gc.collect()
            before = _stages(spark)
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            walls.append(round(time.perf_counter() - t0, 3))
            after = _stages(spark)
            new = {k: v for k, v in after.items() if k not in before}
            mb = 1024 * 1024
            profs.append(
                {
                    "sw_mb": round(sum(v[5] for v in new.values()) / mb, 1),
                    "tasks": sum(v[7] for v in new.values()),
                    "stages": sum(
                        1 for v in new.values() if v[7] or v[1]
                    ),
                    "cpu_s": round(
                        sum(v[2] for v in new.values()) / 1e9, 1
                    ),
                }
            )
            spark.catalog.clearCache()
        out[name] = {
            "walls": walls,
            "min": min(walls),
            "median": round(statistics.median(walls), 3),
            "prof": profs[-1],
        }
        print(f"{name}: {out[name]}", flush=True)
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
