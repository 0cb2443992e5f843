"""Wide-probe PQ-ADC codebook sweep.

The RECALL.md k-sweep was non-monotonic, but its ground truth was the
3-probe QUERY_IDS set (15 pairs, recall quantum 0.067) — single-pair
noise dominated every delta.  This sweep rescores the same
configurations against a 20-probe / 100-pair ground truth (quantum
0.01) to decide whether pq_codewords' adaptive sizing should be ON:
if recall is flat-or-falling in k at fine granularity too, the trainer
binds and the fixed base codebook stays the default.

Usage: python tools/pq_probe_sweep.py [sf_dir] [n_probes]
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
        exact_topk_fast,
        sim_pq_adc_topk,
    )
    from kachess_spark.session import get_spark

    spark = get_spark("pq-probe-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    probes = tuple(range(1, n_probes + 1))

    emb = Tables(spark, sf_dir).embeddings.select("vec_id", "embedding")
    truth: dict[int, set[int]] = {}
    for r in exact_topk_fast(emb, TOP_K, "l2", probes).collect():
        truth.setdefault(r["qid"], set()).add(r["vid"])
    denom = sum(len(v) for v in truth.values())

    print(f"sf={sf_dir} probes={n_probes} pairs={denom}")
    for k in (16, 32, 64, 128):
        got = sim_pq_adc_topk(
            spark, sf_dir, certify=False, codewords=k, probe_ids=probes
        )
        hits = 0
        for r in got.select("qid", "vid").collect():
            if r["vid"] in truth.get(r["qid"], set()):
                hits += 1
        print(f"codewords={k:4d}  recall@{TOP_K} = {hits}/{denom}"
              f" = {hits / denom:.3f}")


if __name__ == "__main__":
    main()
