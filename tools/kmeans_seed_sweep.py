"""k-means seeding sweep on the wide-probe metric (round-7 verdict #7).

RECALL.md's 15-pair table shows the kmeans-IVF variant at the family
floor; the round-7 iteration sweep (100-pair metric) showed Lloyd
iterations genuinely hurt on this unclustered fixture.  This sweep asks
whether deterministic k-means++-style seeding (farthest-first traversal
on a bounded pseudorandom sample — `kmeans_centroids(seeding=
"sample_fft")`) raises the floor at the same (cells, probes) budget,
scored against the 20-probe / 100-pair ground truth (quantum 0.01).

Usage: python tools/kmeans_seed_sweep.py [sf_dir] [n_probes]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_probes = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from kachess_spark.catalog import Tables
    from kachess_spark.pipeline.similarity import (
        TOP_K,
        _ivf_search,
        exact_topk_fast,
        ivf_n_cells,
        ivf_n_probe,
        kmeans_centroids,
    )
    from kachess_spark.session import get_spark

    spark = get_spark("kmeans-seed-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    probes = tuple(range(1, n_probes + 1))

    emb = Tables(spark, sf_dir).embeddings.select("vec_id", "embedding")
    n = emb.count()
    cells = ivf_n_cells(n)
    n_probe = ivf_n_probe(cells)
    truth: dict[int, set[int]] = {}
    for r in exact_topk_fast(emb, TOP_K, "cosine", probes).collect():
        truth.setdefault(r["qid"], set()).add(r["vid"])
    denom = sum(len(v) for v in truth.values())

    print(f"sf={sf_dir} n={n} cells={cells} n_probe={n_probe}"
          f" probes={n_probes} pairs={denom}")
    for seeding, iters in [
        ("first", 1),
        ("first", 3),
        ("sample_fft", 0),
        ("sample_fft", 1),
        ("sample_fft", 3),
    ]:
        cent = kmeans_centroids(spark, emb, cells, iters=iters,
                                seeding=seeding)
        got = _ivf_search(spark, emb, cent, False, n_probe, probes)
        hits = 0
        for r in got.select("qid", "vid").collect():
            if r["vid"] in truth.get(r["qid"], set()):
                hits += 1
        print(f"seeding={seeding:11s} iters={iters}  recall@{TOP_K}"
              f" = {hits}/{denom} = {hits / denom:.3f}")


if __name__ == "__main__":
    main()
