"""All-nodes k-NN graph recall: every node is a query, so this is the
POPULATION recall of the graph builders by construction (no probe
sampling, no probe bias — cf. tools/population_recall.py for the
query-serving rankers).

For each graph path, reports recall@KNN_K vs numpy brute force over
the normalized corpus, plus the wall of the Spark job.

Usage: python tools/graph_recall.py [sf_dir] [path ...]
       paths: lsh ivf prescreened descent (default: lsh ivf)
Extra keyword args can be set via env:
       ivf/prescreened: GRAPH_NPROBE=<int>  GRAPH_REFINE=<int>
       prescreened:     GRAPH_PRESCREEN_C=<int>
       descent:         GRAPH_ROUNDS=<int>  GRAPH_KWORK=<int>

Prints one JSON line per path; paste-ready for RECALL.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import numpy as np

    from kachess_spark.catalog import Tables
    from kachess_spark.pipeline import similarity as sim
    from kachess_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    paths = sys.argv[2:] or ["lsh", "ivf"]

    spark = get_spark("graph-recall")
    rows = (
        Tables(spark, sf_dir).embeddings.select("vec_id", "embedding").collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    k = sim.KNN_K

    # brute-force truth: top-k cosine neighbors per node (ties to low id)
    truth: dict[int, set[int]] = {}
    for i, vid in enumerate(ids):
        s = mn @ mn[i]
        s[i] = -np.inf
        order = np.lexsort((ids, -s))[:k]
        truth[int(vid)] = {int(ids[j]) for j in order}

    def run(name: str, fn, **kw) -> None:
        t0 = time.time()
        got = fn(spark, sf_dir, **kw).collect()
        wall = time.time() - t0
        by: dict[int, set[int]] = {}
        for r in got:
            by.setdefault(r["src"], set()).add(r["dst"])
        hits = sum(len(by.get(int(v), set()) & truth[int(v)]) for v in ids)
        print(
            json.dumps(
                {
                    "sf": os.path.basename(sf_dir),
                    "path": name,
                    "n": len(ids),
                    "recall_at_k": round(hits / (len(ids) * k), 4),
                    "wall_s": round(wall, 2),
                    **{f"kw_{a}": b for a, b in kw.items()},
                }
            ),
            flush=True,
        )

    if "lsh" in paths:
        run("sim_knn_graph", sim.sim_knn_graph)
    ivf_kw = {}
    if os.environ.get("GRAPH_NPROBE"):
        ivf_kw["n_probe"] = int(os.environ["GRAPH_NPROBE"])
    if os.environ.get("GRAPH_REFINE"):
        ivf_kw["refine"] = int(os.environ["GRAPH_REFINE"])
    if "ivf" in paths:
        run("sim_knn_graph_ivf", sim.sim_knn_graph_ivf, **ivf_kw)
    if "prescreened" in paths:
        kw = dict(ivf_kw)
        if os.environ.get("GRAPH_PRESCREEN_C"):
            kw["prescreen_c"] = int(os.environ["GRAPH_PRESCREEN_C"])
        run("sim_knn_graph_prescreened", sim.sim_knn_graph_prescreened, **kw)
    if "descent" in paths:
        kw = {}
        if os.environ.get("GRAPH_ROUNDS"):
            kw["rounds"] = int(os.environ["GRAPH_ROUNDS"])
        if os.environ.get("GRAPH_KWORK"):
            kw["k_work"] = int(os.environ["GRAPH_KWORK"])
        run("sim_knn_graph_descent", sim.sim_knn_graph_descent, **kw)


if __name__ == "__main__":
    main()
