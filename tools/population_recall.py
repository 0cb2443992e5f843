"""Population (unbiased) ANN recall: md5-random probe sample vs numpy
brute force.

The legacy recall_report.py tables probe QUERY_IDS / ids 1-20 — ids
that COINCIDE with the first-k-by-id seed centroids, which inflates
recall for seeded (iters=0) IVF indexes to ~0.99 while the population
recall is ~0.35 (RECALL.md "Round-10 probe-bias correction").  This
tool measures what a production query mix would see: a deterministic
md5-ordered sample of N probe ids drawn from the WHOLE corpus.

Usage: python tools/population_recall.py [sf_dir] [n_probes]
       (defaults: /root/testdata/sf0.1, 150)

Prints one JSON line per method; paste-ready for RECALL.md.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import numpy as np

    from kachess_spark.catalog import Tables
    from kachess_spark.pipeline.similarity import (
        TOP_K,
        build_ivf_index,
        sim_ivf_stored_topk,
        sim_pq_stored_topk,
    )
    from kachess_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_probes = int(sys.argv[2]) if len(sys.argv) > 2 else 150

    spark = get_spark("population-recall")
    rows = (
        Tables(spark, sf_dir).embeddings.select("vec_id", "embedding").collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    id2i = {int(v): i for i, v in enumerate(ids)}
    sample = sorted(
        (int(v) for v in ids),
        key=lambda v: hashlib.md5(str(v).encode()).hexdigest(),
    )[:n_probes]

    def cos_truth(vid: int) -> set[int]:
        i = id2i[vid]
        s = mn @ mn[i]
        s[i] = -np.inf
        order = np.lexsort((ids, -s))[:TOP_K]
        return {int(ids[j]) for j in order}

    def l2_truth(vid: int) -> set[int]:
        i = id2i[vid]
        d = ((m - m[i]) ** 2).sum(axis=1)
        d[i] = np.inf
        order = np.lexsort((ids, d))[:TOP_K]
        return {int(ids[j]) for j in order}

    def recall(fn, truth) -> float:
        got = fn(
            spark, sf_dir, certify=False, probe_ids=tuple(sample)
        ).collect()
        by: dict[int, set[int]] = {}
        for r in got:
            by.setdefault(r["qid"], set()).add(r["vid"])
        hits = sum(len(by.get(v, set()) & truth(v)) for v in sample)
        return hits / (len(sample) * TOP_K)

    build_ivf_index(spark, sf_dir)  # train-once, untimed
    for name, fn, truth in (
        ("sim_ivf_stored_topk", sim_ivf_stored_topk, cos_truth),
        ("sim_pq_stored_topk", sim_pq_stored_topk, l2_truth),
    ):
        print(
            json.dumps(
                {
                    "sf": os.path.basename(sf_dir),
                    "method": name,
                    "n_probes": len(sample),
                    "population_recall": round(recall(fn, truth), 4),
                }
            )
        )


if __name__ == "__main__":
    main()
