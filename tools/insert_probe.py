"""Stored-index INSERT maintenance probe (round-8 verdict #7).

Measures ivf_index_insert / pq_index_insert wall time for a FIXED-SIZE
insert batch (a real ingestion tick) against a base index built on
sf0.1 and on the K×-replicated corpus (tools/scale_probe.py fixture).
The maintenance cost model: one batch-sized assignment against frozen
centroids/codebooks (corpus-independent) + an append + a meta recount
(a 2-column parquet count scan that grows with the corpus but stays
metadata-cheap).  Near-flat ratios are the pass signal; the recount is
the only term expected to grow.

Usage: python tools/insert_probe.py [K] [batch_rows]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_SF = "/root/testdata/sf0.1"


def time_inserts(spark, sf_dir: str, batch_rows: int, tag: str) -> dict:
    from pyspark.sql import functions as F

    from kachess_spark.catalog import Tables
    from kachess_spark.operators.sinks import _scratch
    from kachess_spark.pipeline.similarity import (
        build_ivf_index,
        build_pq_index,
        ivf_index_insert,
        pq_index_insert,
    )

    emb = Tables(spark, sf_dir).embeddings.select("vec_id", "embedding")
    # the insert batch: a fixed-size slice by id (deterministic); the
    # base index is built on everything else
    batch_ids = [r["vec_id"] for r in
                 emb.select("vec_id").orderBy("vec_id")
                 .limit(batch_rows).collect()]
    batch = emb.where(F.col("vec_id").isin(batch_ids)).localCheckpoint(
        eager=True
    )
    base = emb.where(~F.col("vec_id").isin(batch_ids))

    ivf_dir = _scratch(f"insprobe_ivf_{tag}")
    pq_dir = _scratch(f"insprobe_pq_{tag}")
    build_ivf_index(spark, sf_dir, index_dir=ivf_dir, emb=base)
    build_pq_index(spark, sf_dir, index_dir=pq_dir, emb=base)

    t0 = time.perf_counter()
    ivf_index_insert(spark, ivf_dir, batch)
    ivf_s = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    pq_index_insert(spark, pq_dir, batch)
    pq_s = round(time.perf_counter() - t0, 3)

    n = spark.read.parquet(os.path.join(ivf_dir, "assignments")).count()
    return {"corpus": n, "ivf_insert_s": ivf_s, "pq_insert_s": pq_s}


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    from kachess_spark.session import get_spark
    from tools.scale_probe import build

    spark = get_spark("kachess-insert-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # steady-state warmup at the smallest SF (JIT the insert shapes)
    time_inserts(spark, "/root/testdata/sf0.001", 50, "warm")

    base = time_inserts(spark, BASE_SF, batch_rows, "base")
    probe_dir = build(spark, k)
    big = time_inserts(spark, probe_dir, batch_rows, f"x{k}")
    out = {
        "k": k,
        "batch_rows": batch_rows,
        "base": base,
        "xk": big,
        "ratio": {
            "ivf_insert": round(big["ivf_insert_s"] / base["ivf_insert_s"], 2)
            if base["ivf_insert_s"]
            else None,
            "pq_insert": round(big["pq_insert_s"] / base["pq_insert_s"], 2)
            if base["pq_insert_s"]
            else None,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
