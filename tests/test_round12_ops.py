"""Round-12 operator tests: SemDeDup auto-delegation past the k cap
(verdict #1), the pure NN-descent linear graph builder (verdict #2),
and the supporting schedule/guard fixes from ADVICE.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

BIG_N_REPLICAS = 5  # 5 x 2000 sf0.1 vectors = 10000 > SEM_EXACT_MAX_N

# env-overridable like conftest's KACHESS_TEST_SF_DIR (ADVICE r12:
# a hardcoded path failed every host without that exact fixture)
SF0_1_DIR = os.environ.get("KACHESS_TEST_SF01_DIR", "/root/testdata/sf0.1")


@pytest.fixture(scope="module")
def big_emb_dir(spark, tmp_path_factory):
    """An embeddings-only fixture PAST the SemDeDup exact-path cap
    (10000 > 8192): sf0.1's 2000 vectors replicated 5x with rotated
    components (the scale_probe convention — replicas are distinct
    vectors, not true near-duplicates) and offset ids."""
    src = os.path.join(SF0_1_DIR, "embeddings.parquet")
    if not os.path.exists(src):
        pytest.skip(f"sf0.1 embeddings fixture absent: {src}")
    out = tmp_path_factory.mktemp("sem_big")
    base = spark.read.parquet(src)
    dim = len(base.select("embedding").head()["embedding"])
    parts = []
    for i in range(BIG_N_REPLICAS):
        p = base.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        r = i % dim
        if r:
            p = p.withColumn(
                "embedding",
                F.expr(
                    f"concat(slice(embedding, {r + 1}, size(embedding) - {r}),"
                    f" slice(embedding, 1, {r}))"
                ),
            )
        parts.append(p)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.repartition(8).write.parquet(os.path.join(str(out), "embeddings.parquet"))
    return str(out)


@pytest.mark.slow  # >=20 s measured; excluded from the default gate run (pytest.ini)
def test_sem_auto_delegates_past_cap(spark, big_emb_dir):
    """Past SEM_EXACT_MAX_N the registered name must take the scaled
    two-level branch: its output is row-for-row identical to
    dedup_semantic_cluster_scaled (same machinery), and its row count
    covers every vector exactly once."""
    from kachess_spark.pipeline.dedup import (
        SEM_EXACT_MAX_N,
        dedup_semantic_cluster,
        dedup_semantic_cluster_scaled,
    )

    n = spark.read.parquet(
        os.path.join(big_emb_dir, "embeddings.parquet")
    ).count()
    assert n > SEM_EXACT_MAX_N
    auto = dedup_semantic_cluster(spark, big_emb_dir).collect()
    scaled = dedup_semantic_cluster_scaled(spark, big_emb_dir).collect()
    assert len(auto) == n
    assert auto == scaled


@pytest.mark.slow  # >=20 s measured; excluded from the default gate run (pytest.ini)
def test_sem_auto_oracle_certifies_scaled_branch(spark, big_emb_dir):
    """The registered auto-oracle's n-gated UNION must select the
    two-level chain past the cap and hash-match the Spark side — the
    branch RULE is certified, not just the fixture-scale branch (the
    exact branch is certified by test_oracle_parity at the test SF)."""
    from kachess_spark import registry
    from tools.check_parity import compare

    registry.load_all()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
        f"'{os.path.join(big_emb_dir, 'embeddings.parquet')}/*.parquet')"
    )
    sdf = registry.QUERIES["dedup_semantic_cluster"](
        spark, big_emb_dir
    ).toPandas()
    ddf = (
        con.execute(registry.ORACLES["dedup_semantic_cluster"])
        .arrow()
        .to_pandas()
    )
    con.close()
    problems = compare("dedup_semantic_cluster", sdf, ddf)
    assert not problems, problems


def test_sem_trigger_boundary():
    """The delegation trigger is exactly n > SEM_MAX_K*SEM_TARGET_CLUSTER
    — the largest n where the capped k still tracks n/target."""
    from kachess_spark.pipeline.dedup import (
        SEM_EXACT_MAX_N,
        SEM_MAX_K,
        sem_k,
        sem_k_unbounded,
    )

    assert sem_k(SEM_EXACT_MAX_N) == sem_k_unbounded(SEM_EXACT_MAX_N) == SEM_MAX_K
    assert sem_k(SEM_EXACT_MAX_N + 1) == SEM_MAX_K
    assert sem_k_unbounded(SEM_EXACT_MAX_N + 1) == SEM_MAX_K + 1


def test_knn_descent_recall_floor_and_monotone(spark, sf_dir):
    """NN-descent graph at the default dials: population recall@3 must
    clear 0.6 at the test SF (measured 0.8815 at sf0.1), recall is
    monotone in rounds (current edges re-enter the candidate set), and
    per-node ranks are dense 1..k."""
    import numpy as np

    from kachess_spark.catalog import Tables
    from kachess_spark.pipeline.similarity import (
        KNN_K,
        sim_knn_graph_descent,
    )

    rows = (
        Tables(spark, sf_dir).embeddings.select("vec_id", "embedding").collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    S = mn @ mn.T
    np.fill_diagonal(S, -np.inf)
    truth = {
        int(ids[i]): {int(ids[j]) for j in np.lexsort((ids, -S[i]))[:KNN_K]}
        for i in range(len(ids))
    }

    def recall(rounds=None):
        kw = {} if rounds is None else {"rounds": rounds}
        got = sim_knn_graph_descent(spark, sf_dir, **kw).collect()
        by: dict[int, set[int]] = {}
        rks: dict[int, list] = {}
        for r in got:
            assert r["src"] != r["dst"]
            by.setdefault(r["src"], set()).add(r["dst"])
            rks.setdefault(r["src"], []).append(r["rk"])
        assert all(
            sorted(v) == list(range(1, len(v) + 1)) for v in rks.values()
        )
        return sum(
            len(by.get(int(v), set()) & truth[int(v)]) for v in ids
        ) / (len(ids) * KNN_K)

    r2, r_default = recall(rounds=2), recall()
    assert r_default >= 0.6, r_default
    assert r_default >= r2 - 1e-9, (r2, r_default)


def test_graph_serving_beam(spark, sf_dir):
    """Graph-served ANN: the beam walk over the stored descent graph
    returns exactly TOP_K dense-ranked rows per query, recall@5 vs
    numpy truth clears 0.7 at the test SF (measured 0.867), and the
    entry schedule is the documented adaptive formula."""
    import numpy as np

    from kachess_spark.catalog import Tables
    from kachess_spark.pipeline.similarity import (
        GS_ENTRIES,
        QUERY_IDS,
        TOP_K,
        gs_entry_count,
        sim_graph_stored_topk,
    )

    assert gs_entry_count(500) == GS_ENTRIES
    assert gs_entry_count(2000) == GS_ENTRIES + 16
    assert gs_entry_count(32000) == GS_ENTRIES + 48

    rows = (
        Tables(spark, sf_dir).embeddings.select("vec_id", "embedding").collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    got = sim_graph_stored_topk(spark, sf_dir).collect()
    by: dict[int, set[int]] = {}
    rks: dict[int, list] = {}
    for r in got:
        assert r["qid"] != r["vid"]
        by.setdefault(r["qid"], set()).add(r["vid"])
        rks.setdefault(r["qid"], []).append(r["rk"])
    assert set(by) == set(QUERY_IDS)
    assert all(sorted(v) == list(range(1, TOP_K + 1)) for v in rks.values())
    hits = tot = 0
    for q in QUERY_IDS:
        i = int(np.where(ids == q)[0][0])
        s = mn @ mn[i]
        s[i] = -np.inf
        truth = {int(ids[j]) for j in np.lexsort((ids, -s))[:TOP_K]}
        hits += len(by[q] & truth)
        tot += TOP_K
    assert hits / tot >= 0.7, hits / tot
