"""Scale probe: replicate sf0.1 fact tables Kx into /tmp and compare
headline query wall-times against sf0.1.

Near-linear scaling (ratio ≈ K on K× data) is the evidence that a plan
has no quadratic/collect-bound step; a superlinear ratio flags the
operator for replanning.  Writes nothing outside /tmp; prints one JSON
line per scale.

Usage: python tools/scale_probe.py [K] [query ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_SF = "/root/testdata/sf0.1"
PROBE_DIR = "/tmp/kachess_scale_probe"

DEFAULT_QUERIES = [
    "agg_q1_pricing_summary",
    "join_inner_q3",
    "join_q5_multiway",
    "win_rank_topk",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "stream_tumbling_counts",
]

# fact tables replicated with key offsets (keeps join keys consistent
# within each replica); dims copied as-is
FACTS = {
    "lineitem": ("l_orderkey", 10_000_000),
    "orders": ("o_orderkey", 10_000_000),
    "events": ("event_id", 10_000_000),
    "documents": ("doc_id", 10_000_000),
    "embeddings": ("vec_id", 10_000_000),
}
DIMS = ("region", "nation", "customer", "supplier", "part")


def build(spark, k: int) -> str:
    from pyspark.sql import functions as F

    from kachess_spark.catalog import load_table, table_path

    out = f"{PROBE_DIR}/x{k}"
    if os.path.exists(out):
        return out
    os.makedirs(out, exist_ok=True)
    try:
        for name in DIMS:
            shutil.copy2(table_path(BASE_SF, name), table_path(out, name))
        for name, (key, offset) in FACTS.items():
            df = load_table(spark, BASE_SF, name)
            dim = (
                len(df.select("embedding").head()["embedding"])
                if name == "embeddings"
                else 0
            )
            parts = []
            for i in range(k):
                p = df.withColumn(key, F.col(key) + F.lit(i * offset))
                if name == "embeddings" and i > 0:
                    # rotate each replica's vector so replicas are DISTINCT
                    # vectors (verbatim copies make every replica pair a
                    # true near-duplicate — the pair-output operators would
                    # then measure quadratic TRUE-DUP growth, a property of
                    # the fixture, not of the plan under test).  Rotation is
                    # mod dim (slice had negative length past k=dim);
                    # composing it with an optional sign flip and an
                    # optional reversal gives 4*dim distinct transforms —
                    # replica block 2 of the rotate+flip-only scheme
                    # reproduced block 0 verbatim at k > 2*dim (round-11
                    # ADVICE), silently reintroducing the true-dup fixture
                    # artifact at the 256x octave.
                    if k > 4 * dim:
                        raise ValueError(
                            f"embeddings replication supports at most "
                            f"k={4 * dim} distinct replicas at dim={dim} "
                            f"(rotation x sign x reversal); got k={k} — "
                            f"add another orthogonal transform before "
                            f"probing past that"
                        )
                    r = i % dim
                    if r:
                        p = p.withColumn(
                            "embedding",
                            F.expr(
                                f"concat(slice(embedding, {r + 1}, "
                                f"size(embedding) - {r}), "
                                f"slice(embedding, 1, {r}))"
                            ),
                        )
                    if (i // dim) % 2 == 1:
                        p = p.withColumn(
                            "embedding",
                            F.expr("transform(embedding, x -> -x)"),
                        )
                    if (i // (2 * dim)) % 2 == 1:
                        p = p.withColumn(
                            "embedding", F.expr("reverse(embedding)")
                        )
                if name == "documents" and i > 0:
                    # same for text: salt every word with the replica index
                    # — intra-replica near-dup structure is preserved (both
                    # sides of a dup pair get the same salt, so shingle
                    # equality within a replica is unchanged) while
                    # cross-replica shingles become distinct, so LSH/simhash
                    # pair outputs grow linearly, not as true-dup cliques.
                    # (A cyclic word rotation is NOT enough: 3-gram shingle
                    # sets are rotation-invariant.)
                    p = p.withColumn(
                        "text",
                        F.expr(
                            "concat_ws(' ', transform(split(text, ' '),"
                            f" w -> concat(w, '_{i}')))"
                        ),
                    )
                parts.append(p)
            u = parts[0]
            for p in parts[1:]:
                u = u.unionByName(p)
            if name == "events":
                # load_table expects ts as TIMESTAMP(NANOS)-read-as-long;
                # re-encode the converted timestamp back to nanos
                u = u.withColumn("ts", F.unix_micros("ts") * F.lit(1000))
            # one file per core, not a fixed 8: a single-row-group 9 MB
            # file admits exactly one scan task, so an 8-file fixture
            # caps every scan-attached stage (shingle explodes, hash
            # projections) at 8-way on a 32-core host — measured 60%
            # idle and a spuriously superlinear marginal octave at 128x.
            # A real 100 TB corpus arrives in thousands of splits; the
            # fixture should not be the parallelism bottleneck.
            u.repartition(32).write.mode("overwrite").parquet(
                table_path(out, name)
            )
    except Exception:
        shutil.rmtree(out, ignore_errors=True)
        raise
    return out


def run(spark, sf_dir: str, queries: list[str]) -> dict[str, float]:
    from kachess_spark import registry

    registry.load_all()
    per = {}
    for name in queries:
        t0 = time.perf_counter()
        registry.QUERIES[name](spark, sf_dir).count()
        per[name] = round(time.perf_counter() - t0, 3)
    return per


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    queries = sys.argv[2:] or DEFAULT_QUERIES

    from kachess_spark.session import get_spark

    spark = get_spark("kachess-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # steady-state warmup (JIT codegen per query shape) so the base
    # measurement isn't first-call-compilation-bound — a polluted base
    # under-reports the true 8x ratio
    run(spark, "/root/testdata/sf0.001", queries)
    base = run(spark, BASE_SF, queries)
    probe_dir = build(spark, k)
    big = run(spark, probe_dir, queries)
    ratios = {q: round(big[q] / base[q], 2) if base[q] else None for q in queries}
    print(json.dumps({"k": k, "base_s": base, "xk_s": big, "ratio": ratios}))


if __name__ == "__main__":
    main()
